package graft.queries

/** DuckDB-SQL generator for the `neardup_minhash_fast` value oracle —
  * xxHash64 (Spark's `xxhash64`, seed 42) UNROLLED into pure 64-bit
  * integer arithmetic DuckDB can execute: unsigned values live in the
  * HUGEINT domain `[0, 2^64)`, wrapping multiplication splits into
  * 32-bit halves (`lo·lo + ((lo·hi + hi·lo mod 2^32) << 32) mod 2^64`
  * — every intermediate < 2^98, far inside INT128), rotations are the
  * two disjoint shifted halves summed, and XOR rides DuckDB's native
  * hugeint `xor`. String hashing walks the UTF-8 bytes via
  * `hex(encode(t))` with little-endian words reassembled through
  * `CAST('0x…' AS UBIGINT)`, covering all four xxHash64 phases
  * (32-byte stripe accumulators via `list_reduce` over a struct, then
  * 8-byte words, the 4-byte chunk, trailing bytes) plus the final
  * avalanche.
  *
  * Every multi-use intermediate lands in its own MATERIALIZED CTE
  * stage: DuckDB expands column references by SUBSTITUTION, so a
  * single nested expression for one hash would grow as ~3^stages and
  * never finish binding — staging keeps each expression tree a few
  * dozen nodes, and the whole pipeline (token hash → trigram chain →
  * 16 seeded members → per-document minima → 4 band buckets) runs in
  * seconds at the gate scale.
  *
  * Validated three ways before landing: Spark's `xxhash64` against the
  * published xxHash64 spec on string/long/int vectors (exact), this
  * SQL against that reference on a constructed corpus (empty tokens,
  * multibyte UTF-8, ≥32-byte tokens, sub-3-token documents), and
  * end-to-end against the registered query's own output at sf0.01.
  */
private[queries] object XxhashOracle {

  // xxHash64 primes, rendered as unsigned decimal (P1/P4 exceed
  // Long.MaxValue as unsigned values).
  private def u(l: Long): String = java.lang.Long.toUnsignedString(l)
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private val M64 = "(1::HUGEINT << 64)"
  private val B32 = "4294967296"

  private def hlit(c: Long): String = s"${u(c)}::HUGEINT"
  private def mod(x: String): String = s"(($x) % $M64)"
  private def mul(a: String, b: String): String =
    s"(((($a) % $B32) * (($b) % $B32) + " +
      s"((((($a) % $B32) * (($b) >> 32) + (($a) >> 32) * (($b) % $B32)) % $B32) << 32)) % $M64)"
  private def mulc(a: String, c: Long): String = mul(a, hlit(c))
  private def rotl(x: String, r: Int): String =
    s"(((($x) << $r) % $M64) + (($x) >> ${64 - r}))"
  private def xr(a: String, b: String): String = s"xor(($a), ($b))"
  private def u2s(x: String): String =
    s"CAST(CASE WHEN ($x) >= 9223372036854775808::HUGEINT " +
      s"THEN ($x) - $M64 ELSE ($x) END AS BIGINT)"
  private def s2u(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64 " +
      s"ELSE CAST(($x) AS HUGEINT) END)"

  /** round(0, w) = rotl31(w·P2)·P1 — inline (w must be a cheap ref). */
  private def rnd0(w: String): String = mulc(rotl(mulc(w, P2), 31), P1)

  /** The 7 staged columns of `xxh64(long v, seed)` ending in column
    * `o` — each stage references only earlier stages' columns.
    */
  private def hlStages(v: String, seed: String,
      o: String): Seq[Map[String, String]] = Seq(
    Map(s"${o}_m1" -> mulc(v, P2)),
    Map(s"${o}_k" -> mulc(rotl(s"${o}_m1", 31), P1)),
    Map(s"${o}_x" -> xr(mod(s"($seed) + ${hlit(P5 + 8)}"), s"${o}_k")),
    Map(s"${o}_h1" -> mod(mulc(rotl(s"${o}_x", 27), P1) + s" + ${hlit(P4)}")),
    Map(s"${o}_f2" -> mulc(xr(s"${o}_h1", s"${o}_h1 >> 33"), P2)),
    Map(s"${o}_f4" -> mulc(xr(s"${o}_f2", s"${o}_f2 >> 29"), P3)),
    Map(o -> xr(s"${o}_f4", s"${o}_f4 >> 32")))

  private final class Ctes {
    var n = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def add(items: String, frm: String): String = {
      n += 1
      val name = s"xx$n"
      out += s"$name AS MATERIALIZED (SELECT $items FROM $frm)"
      name
    }
    /** For bodies that carry their own FROM/JOIN clause. */
    def addRaw(body: String): String = {
      n += 1
      val name = s"xx$n"
      out += s"$name AS MATERIALIZED (SELECT $body)"
      name
    }
  }

  /** Emit one CTE per stage, zip-merging parallel chains; each stage
    * carries `base` plus the group's columns so far, the final stage
    * keeps only `base ++ keep ++ <its own new columns>`.
    */
  private def emitChain(ctes: Ctes, frm: String, base: Seq[String],
      chains: Seq[Seq[Map[String, String]]], keep: Seq[String]): String = {
    val nstages = chains.map(_.size).max
    var introduced = Seq.empty[String]
    var cur = frm
    for (s <- 0 until nstages) {
      val neu = chains.flatMap(c => if (s < c.size) c(s).toSeq else Seq.empty)
      val cols = neu.map { case (c, e) => s"$e AS $c" }
      val items =
        if (s == nstages - 1)
          (base ++ keep.filterNot(neu.map(_._1).contains) ++ cols).mkString(", ")
        else (base ++ introduced ++ cols).mkString(", ")
      cur = ctes.add(items, cur)
      introduced = introduced ++ neu.map(_._1)
    }
    cur
  }

  /** Little-endian unsigned word from `nbytes` hex pairs of `hx` at
    * 0-based byte offset `off` (an expression).
    */
  private def leWord(hx: String, off: String, nbytes: Int): String = {
    val parts = (nbytes - 1 to 0 by -1)
      .map(j => s"substr($hx, 2*(($off) + $j) + 1, 2)").mkString(", ")
    s"CAST(CAST(concat('0x', $parts) AS UBIGINT) AS HUGEINT)"
  }

  private def accRound(vf: String, wf: String): String =
    mulc(rotl(mod(s"$vf + ${mulc(wf, P2)}"), 31), P1)

  /** CTEs from `tpos(doc_id, t, i)` ending in a table `(t, th)` with
    * `th = xxh64(utf8 bytes of t, 42)` in the unsigned domain.
    */
  private def tokenHashCtes(ctes: Ctes): String = {
    val v1 = 42L + P1 + P2; val v2 = 42L + P2; val v3 = 42L; val v4 = 42L - P1
    val stripeInit = s"{'v1': ${hlit(v1)}, 'v2': ${hlit(v2)}, " +
      s"'v3': ${hlit(v3)}, 'v4': ${hlit(v4)}}"
    val stripeElems = "list_transform(range(ns), s -> {" +
      (1 to 4).map(k => s"'v$k': ws[4*s+$k]").mkString(", ") + "})"
    val stripeFold = "(a, x) -> {" +
      (1 to 4).map(k => s"'v$k': ${accRound(s"a.v$k", s"x.v$k")}")
        .mkString(", ") + "}"
    val mergeH0 = mod(Seq((1, 1), (2, 7), (3, 12), (4, 18))
      .map { case (k, r) => rotl(s"st_acc.v$k", r) }.mkString(" + "))
    val tailFold =
      s"(h, w) -> ${mod(mulc(rotl(xr("h", rnd0("w")), 27), P1) + s" + ${hlit(P4)}")}"
    val byteFold = s"(h, b) -> ${mulc(rotl(xr("h", mulc("b", P5)), 11), P1)}"
    val w4 = leWord("hx", "nw * 8", 4)
    var cur = ctes.add("DISTINCT t", "tpos")
    cur = ctes.add("t, hex(encode(t)) AS hx, octet_length(encode(t)) AS n", cur)
    cur = ctes.add("t, hx, n, n // 8 AS nw, n // 32 AS ns, " +
      s"list_transform(range(n // 8), k -> ${leWord("hx", "8*k", 8)}) AS ws", cur)
    cur = ctes.add("t, hx, n, nw, ns, ws, CASE WHEN n >= 32 THEN " +
      s"list_reduce(list_prepend($stripeInit, $stripeElems), $stripeFold) " +
      s"ELSE $stripeInit END AS st_acc", cur)
    cur = ctes.add(s"t, hx, n, nw, ns, ws, st_acc, $mergeH0 AS mg_0", cur)
    var prev = "mg_0"
    for (k <- 1 to 4) {
      cur = ctes.add("t, hx, n, nw, ns, ws, st_acc, " +
        s"${mod(mulc(xr(prev, rnd0(s"st_acc.v$k")), P1) + s" + ${hlit(P4)}")} AS mg_$k",
        cur)
      prev = s"mg_$k"
    }
    cur = ctes.add("t, hx, n, nw, ns, ws, CASE WHEN n >= 32 THEN mg_4 " +
      s"ELSE ${mod(hlit(42L + P5))} END AS hs0", cur)
    cur = ctes.add("t, hx, n, nw, " +
      s"list_reduce(list_prepend(${mod("hs0 + n")}, list_slice(ws, 4*ns + 1, nw)), " +
      s"$tailFold) AS ht", cur)
    cur = ctes.add("t, hx, n, nw, CASE WHEN n - nw*8 >= 4 THEN " +
      s"${mod(mulc(rotl(xr("ht", mulc(w4, P1)), 23), P2) + s" + ${hlit(P3)}")} " +
      "ELSE ht END AS h4, " +
      "nw*8 + (CASE WHEN n - nw*8 >= 4 THEN 4 ELSE 0 END) AS ob", cur)
    cur = ctes.add("t, list_reduce(list_prepend(h4, list_transform(range(n - ob), " +
      "k -> CAST(CAST(concat('0x', substr(hx, 2*(ob + k) + 1, 2)) AS UBIGINT) AS HUGEINT))), " +
      s"$byteFold) AS hb", cur)
    cur = ctes.add(s"t, ${mulc(xr("hb", "hb >> 33"), P2)} AS ff2", cur)
    cur = ctes.add(s"t, ${mulc(xr("ff2", "ff2 >> 29"), P3)} AS ff4", cur)
    ctes.add(s"t, ${xr("ff4", "ff4 >> 32")} AS th", cur)
  }

  /** xxh64(int j, 42) — the member seeds, computed with Spark's own
    * implementation so query and oracle ride one hash family by
    * construction.
    */
  private val memberSeeds: Seq[Long] = (0 until 16).map(j =>
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L))

  /** The full `neardup_minhash_fast` twin: band-bucket counts over the
    * FastFamily (xxhash64) LSH pipeline, value-exact vs Spark.
    */
  lazy val minhashFastSql: String = {
    val ctes = new Ctes
    val dth = tokenHashCtes(ctes)
    val thx = ctes.addRaw("p.doc_id AS doc_id, p.i AS i, d.th AS h " +
      s"FROM tpos p JOIN $dth d ON p.t = d.t")
    val tri = ctes.addRaw("a.doc_id AS doc_id, a.h AS h1u, b.h AS h2u, c.h AS h3u " +
      s"FROM $thx a JOIN $thx b ON a.doc_id = b.doc_id AND b.i = a.i + 1 " +
      s"JOIN $thx c ON c.doc_id = a.doc_id AND c.i = a.i + 2")
    // Trigram identity: xxh(h3, xxh(xxh(h2, xxh(h1, 42)), 42)) — the
    // FastFamily zip_with chain.
    var cur = emitChain(ctes, tri, Seq("doc_id", "h2u", "h3u"),
      Seq(hlStages("h1u", "42::HUGEINT", "c1")), Seq("c1"))
    cur = emitChain(ctes, cur, Seq("doc_id", "h3u", "c1"),
      Seq(hlStages("h2u", "c1", "c2")), Seq("c2"))
    cur = emitChain(ctes, cur, Seq("doc_id", "h3u", "c2"),
      Seq(hlStages("c2", "42::HUGEINT", "c3")), Seq("c3"))
    cur = emitChain(ctes, cur, Seq("doc_id", "h3u", "c3"),
      Seq(hlStages("h3u", "c3", "h0")), Seq("h0"))
    // 16 member hashes in parallel columns; minima are over SIGNED
    // longs, matching Spark's min over the member expression.
    cur = emitChain(ctes, cur, Seq("doc_id"),
      (0 until 16).map(j => hlStages("h0", hlit(memberSeeds(j)), s"mm$j")),
      (0 until 16).map(j => s"mm$j"))
    val mins = (0 until 16)
      .map(j => s"min(${u2s(s"mm$j")}) AS h$j").mkString(", ")
    val sig = ctes.addRaw(s"doc_id, $mins FROM $cur GROUP BY doc_id")
    // Band buckets: 4 parallel chains of 4 seeded links each.
    cur = sig
    var prevOut = (0 until 4).map(_ => "42::HUGEINT")
    for (l <- 0 until 4) {
      val stages = (0 until 4).map(b =>
        hlStages(s2u(s"h${b * 4 + l}"), prevOut(b), s"bk${b}_$l"))
      val need = Seq("doc_id") ++
        (0 until 4).flatMap(b => (l + 1 until 4).map(r => s"h${b * 4 + r}")) ++
        (if (l == 0) Seq.empty else (0 until 4).map(b => s"bk${b}_${l - 1}"))
      cur = emitChain(ctes, cur, need, stages,
        (0 until 4).map(b => s"bk${b}_$l"))
      prevOut = (0 until 4).map(b => s"bk${b}_$l")
    }
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, CAST($b AS BIGINT) AS band, " +
        s"${u2s(s"bk${b}_3")} AS bucket FROM $cur")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH toksx AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |tpos AS MATERIALIZED (
       |  SELECT doc_id, unnest(tk) AS t, unnest(range(len(tk))) AS i FROM toksx),
       |${ctes.out.mkString(",\n")},
       |bandsx AS (
       |  $bands)
       |SELECT band, bucket, CAST(count(*) AS BIGINT) AS bucket_size
       |FROM bandsx GROUP BY band, bucket ORDER BY band, bucket""".stripMargin
  }
}
