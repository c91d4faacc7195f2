package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away today"
  private val nearDup = base.replace("today", "tonight") // 1-token edit
  private val unrelated =
    "completely different words about spark shuffles and parquet columnar scans"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("shingles: word trigrams, empty below 3 tokens") {
    val out = docs((1L, "a b c d"), (2L, "a b"), (3L, ""))
      .select(col("doc_id"), graft.queries.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), DedupOps.shinglesOfTokens(col("toks")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) === Seq("a b c", "b c d"))
    assert(out(2L) === Seq.empty)
    assert(out(3L) === Seq.empty)
  }

  test("longest duplicated run: exact lengths across power boundaries, cross-doc only") {
    val run10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val run35 = (1 to 35).map(i => s"s$i").mkString(" ")
    val out = DedupOps.longestSpanOf(docs(
        (1L, run10),                  // the full 10-token run
        (2L, s"x $run10 y"),          // shares it mid-document
        (3L, "p q p q p q"),          // repeats WITHIN itself only
        (4L, "t3 t4"),                // a 2-token slice of the run
        (5L, s"$run35 z5"),           // 35 = 32+2+1 spans three powers
        (6L, s"q6 $run35"),
        (7L, "u1 u2 e1 e2"),          // END-aligned shared suffix: the
        (8L, "v1 e1 e2")))            // padded-rank cap must clamp to 2
      .select("doc_id", "n_tokens", "longest_run", "dup_positions")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 10L, 10L, 10L),  // every position starts a cross-doc run
      (2L, 12L, 10L, 10L),  // x/y match nowhere
      (3L, 6L, 0L, 0L),     // same-doc repetition must NOT count
      (4L, 2L, 2L, 2L),
      (5L, 36L, 35L, 35L),
      (6L, 36L, 35L, 35L),
      (7L, 4L, 2L, 2L),
      (8L, 3L, 2L, 2L)))
  }

  test("span strip removes exactly the tokens covered by runs >= StripRunK") {
    val run10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = DedupOps.spanStripOf(docs(
        (1L, run10),                  // fully covered: pos 1's run is 10
        (2L, s"x $run10 y"),          // interior covered, x/y survive
        (3L, "p q p q p q"),          // same-doc repeats never strip
        (4L, "t3 t4")))               // a 2-run is under the K=8 bar
      .select("doc_id", "n_tokens", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 10L, 10L, ""),
      (2L, 12L, 10L, "x y"),
      (3L, 6L, 0L, "p q p q p q"),
      (4L, 2L, 0L, "t3 t4")))
  }

  test("minhash LSH candidates find planted near-dups, not unrelated docs") {
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
    for (fam <- Seq(DedupOps.PortableFamily, DedupOps.FastFamily)) {
      val pairs = DedupOps.minhashCandidates(d, fam = fam)
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 4L)), "exact dup must collide in every band")
      assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
        "near-dup should collide in at least one band")
      assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
        "unrelated doc must not be a candidate")
    }
  }

  test("signature-equality estimator: 1.0 for exact dups, high for near-dups") {
    val d = docs((1L, base), (2L, nearDup), (4L, base))
    val sig = DedupOps.minhashSignatures(d, 16)
    val matches = (0 until 16)
      .map(j => when(col(s"sa.h$j") === col(s"sb.h$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = DedupOps.minhashCandidates(d)
      .join(sig.as("sa"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        floor(matches * 1000000L / 16L).cast("long").as("est"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(est((1L, 4L)) === 1000000L, "identical docs share every component")
    est.get((1L, 2L)).foreach(e => assert(e >= 500000L,
      s"near-dup estimate should be high, got $e"))
  }

  test("index probe surfaces a batch near-dup of an indexed doc, not noise") {
    val index = DedupOps.minhashBands(docs((1L, base), (2L, unrelated)), 4, 4)
    val batch = DedupOps.minhashBands(
      docs((10L, nearDup), (11L, "fresh tokens that match nothing in history at all")), 4, 4)
    val pairs = DedupOps.probeIndex(index, batch)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 1L)), "near-dup must hit the persisted index")
    assert(!pairs.exists { case (n, o) => n == 11L || o == 2L },
      "unrelated docs on either side must not pair")
  }

  test("portable64 is the first 15 hex chars of md5 as an integer") {
    // md5('abc') = 900150983cd24fb0d6963f7d28e17f72 (RFC 1321 test
    // vector), so portable64 must equal 0x900150983cd24fb — the same
    // value DuckDB's CAST('0x'||substr(md5(x),1,15) AS BIGINT) yields.
    val got = Seq("abc").toDF("s")
      .select(DedupOps.portable64(col("s"))).as[Long].head()
    assert(got === java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated))
    val sig = DedupOps.simhash(d).as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) <= 12,
      s"near-dup hamming was ${hamming(sig(1L), sig(2L))}")
    assert(hamming(sig(1L), sig(3L)) > 12,
      s"unrelated hamming was ${hamming(sig(1L), sig(3L))}")
  }

  test("simhash banding finds exact dups at hamming 0, skips unrelated docs") {
    val pairs = DedupOps.simhashPairsOf(
        docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base)))
      .as[(Long, Long, Long)].collect()
    // Exact dups share every chunk — pigeonhole makes missing them
    // impossible — and their Hamming distance is exactly 0.
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0L),
      s"exact dup pair must surface at hamming 0, got ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= DedupOps.SimhashMaxHamming))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc must not survive the hamming cut")
  }

  test("simhash probe finds a near-dup of an indexed doc, skips unrelated") {
    val hist = DedupOps.simhash(docs((1L, base), (3L, unrelated)))
    val batch = DedupOps.simhash(docs((10L, nearDup), (11L, base)))
    val got = DedupOps.simhashProbe(hist, batch)
      .as[(Long, Long, Long)].collect()
    assert(got.exists(r => r._1 == 10L && r._2 == 1L),
      s"near-dup of indexed doc 1 must surface: ${got.toSeq}")
    assert(got.exists(r => r._1 == 11L && r._2 == 1L && r._3 == 0L),
      "exact dup of indexed doc must surface at hamming 0")
    assert(!got.exists(_._2 == 3L), "unrelated indexed doc never matches")
    assert(got.forall(_._3 <= DedupOps.SimhashMaxHamming))
  }

  test("simhash banding bucket cap drops oversized buckets, mirrored semantics") {
    // Five identical docs share every (band, chunk) bucket. With the
    // cap shrunk below the bucket size, NO pair may surface (the
    // production cap bounds any bucket's pair count at cap²/2); at the
    // default cap all 10 pairs do.
    val five = docs((1 to 5).map(i => i.toLong -> base): _*)
    val capped = DedupOps.simhashPairsOf(five, maxBucket = 3)
      .as[(Long, Long, Long)].collect()
    assert(capped.isEmpty, s"over-cap bucket must be dropped, got ${capped.toSeq}")
    val uncapped = DedupOps.simhashPairsOf(five)
      .as[(Long, Long, Long)].collect()
    assert(uncapped.length === 10)
    assert(uncapped.forall(_._3 === 0L))
  }

  test("connectedGroups propagates min labels across transitive chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = DedupOps.connectedGroups(pairs)
      .as[(Long, Long)].collect().toMap
    // one-hop election would leave 4 -> 3; the fixpoint is 4 -> 1
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedGroups converges on a long chain (pointer doubling)") {
    // A 40-vertex path needs ~40 rounds under plain neighbor
    // propagation; pointer doubling must finish well inside the cap.
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("a", "b")
    val got = DedupOps.connectedGroups(chain).as[(Long, Long)].collect()
    assert(got.length === 40 && got.forall(_._2 === 0L))
  }

  test("jaccard stoplist: a hot shingle emits no pairs, near-dups survive") {
    // 60 docs (> JaccardMaxDf) all carrying the same two shingles would
    // expand into 60*59/2 = 1770 pairs per shingle without the cap; the
    // stoplist must drop them entirely while the low-frequency near-dup
    // pair still scores high.
    val hot = (1L to 60L).map(i => (i, "aa bb cc dd"))
    val planted = Seq((100L, base), (101L, nearDup))
    val pairs = DedupOps.jaccardPairs((hot ++ planted).toDF("doc_id", "text"))
      .select("a", "b", "j_ppm").as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((100L, 101L)),
      s"expected only the planted pair, got ${pairs.length} pairs")
    assert(pairs.head._3 > 800000L)
  }

  test("neardupGroups releases its persisted frames after the eager loop") {
    spark.catalog.clearCache()
    DedupOps.neardupGroups(spark, "/root/testdata/sf0.001").collect()
    assert(org.apache.spark.sql.GraftBridge.cacheIsEmpty(spark),
      "candidates/sym must be unpersisted once the labels are checkpointed")
    // Bench-style cleanup then releases the localCheckpoint blocks too.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("containment scores full inclusion at 1.0 where jaccard dilutes it") {
    // Doc 2 wholly contains doc 1's text plus unrelated padding: every
    // shingle of 1 appears in 2, so containment = 1e6 ppm while the
    // symmetric jaccard of the same pair is well below.
    val small = "alpha beta gamma delta epsilon"
    val big = small + " zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val docs = Seq((1L, small), (2L, big), (3L, "totally different words here now")).toDF("doc_id", "text")
    val cont = DedupOps.containmentPairs(docs)
      .select("a", "b", "cont_ppm").as[(Long, Long, Long)].collect()
    assert(cont.toSeq === Seq((1L, 2L, 1000000L)))
    val jac = DedupOps.jaccardPairs(docs)
      .select("j_ppm").as[Long].collect()
    assert(jac.head < 500000L, s"jaccard should dilute inclusion, got ${jac.head}")
  }

  test("index-probed registered queries ≡ direct-from-text derivation") {
    // The registered jaccard/containment queries probe the persisted
    // shingle index; the docs-frame cores recompute from raw text. The
    // two must agree row-for-row (longs round-trip parquet exactly) —
    // the in-process pin of the index-build + probe ≡ direct contract
    // the shared DuckDB oracles gate.
    val dir = "/root/testdata/sf0.001"
    val d = graft.Tables.documents(spark, dir)
    val direct = DedupOps.jaccardPairs(d)
      .orderBy(desc("j_ppm"), col("a"), col("b")).limit(20)
      .collect().toSeq
    val probed = DedupOps.jaccard(spark, dir).collect().toSeq
    assert(probed === direct)
    val directC = DedupOps.containmentPairs(d)
      .orderBy(desc("cont_ppm"), col("a"), col("b")).limit(20)
      .collect().toSeq
    val probedC = DedupOps.containment(spark, dir).collect().toSeq
    assert(probedC === directC)
    // The index summary agrees with a direct count over the same frame.
    val stats = DedupOps.shingleIndexBuild(spark, dir).collect().head
    val directEntries = DedupOps.shingleIndex(spark, dir).count()
    assert(stats.getAs[Long]("n_entries") === directEntries)
    // Plan-level pin: the probing queries carry NO digest work — the
    // md5-per-token tree lives only in the index build. A regression
    // that re-inlined the from-text derivation would reappear here
    // before it reappeared in the bench.
    for (q <- Seq(DedupOps.jaccard(spark, dir), DedupOps.containment(spark, dir),
        DedupOps.minhashBuckets(spark, dir), DedupOps.minhashEstimate(spark, dir))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("digest_prefix64") && !plan.toLowerCase.contains("md5"),
        "probe plans must not recompute shingle identities from text")
    }
  }

  test("span hashes: width-3 form equals the trigram fold; spans catch straddling copies") {
    import org.apache.spark.sql.functions.{col, explode_outer}
    // The generalized fold at k = 3 must reproduce trigramHashesOf
    // value-for-value (same constants, same construction).
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, "a b"))
    val both = d
      .select(col("doc_id"), graft.queries.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        DedupOps.spanHashesOf(
          org.apache.spark.sql.functions.transform(col("toks"), t => DedupOps.portable64(t)), 3).as("s"),
        DedupOps.trigramHashesOf(
          org.apache.spark.sql.functions.transform(col("toks"), t => DedupOps.portable64(t))).as("t"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    both.foreach { case (id, s, t) => assert(s === t, s"doc $id") }

    // A copied passage embedded mid-document at an arbitrary alignment:
    // every 8-token window inside the passage duplicates, so both hosts
    // score dup_spans > 0, while an unrelated doc scores 0.
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    val host1 = s"unique1 opening words here $passage and a tail"
    val host2 = s"totally different preamble text goes on $passage closing run"
    val spans = Seq((1L, host1), (2L, host2), (3L, unrelated)).toDF("doc_id", "text")
    // Reuse the registered query's body shape over a planted frame.
    val inst = spans
      .select(col("doc_id"), graft.queries.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode_outer(DedupOps.spanHashesOf(
          org.apache.spark.sql.functions.transform(col("toks"), t => DedupOps.portable64(t)),
          DedupOps.SpanTokens)).as("h"))
      .filter(col("h").isNotNull)
    val c = inst.groupBy("h").count()
    val dup = inst.join(c, "h").filter(col("count") >= 2)
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(dup.contains(1L) && dup.contains(2L),
      "both hosts must report duplicated spans inside the shared passage")
    assert(!dup.contains(3L), "the unrelated doc must report none")
    assert(dup(1L) === dup(2L), "the shared passage contributes the same windows to both")
  }

  test("jaccard on the real corpus surfaces its planted near-dup pairs") {
    val top = DedupOps.jaccard(spark, "/root/testdata/sf0.001")
      .select("j_ppm").as[Long].collect()
    assert(top.nonEmpty && top.head > 900000L,
      s"expected a >0.9 Jaccard pair in the corpus, top was ${top.headOption}")
  }

  test("edit-distance near-dup finds the planted duplicates at distance 0") {
    val rows = DedupOps.editDistance(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // The corpus plants exact duplicates; the closest candidate pairs
    // must be prefix-identical, and nothing may exceed the threshold
    // (the thresholded levenshtein returns -1 past MaxEdit, which the
    // query filters).
    assert(rows.head._3 === 0L)
    rows.foreach { case (a, b, e) =>
      assert(a < b, "pairs are ordered (a < b)")
      assert(e >= 0L && e <= DedupOps.MaxEdit.toLong)
    }
    // Ordered by (edit, a, b).
    assert(rows.map(r => (r._3, r._1, r._2)) === rows.map(r => (r._3, r._1, r._2)).sorted)
  }

  /** Sequential reference of the CDC chunker: portable64 via MessageDigest
    * hashes each token ONCE, boundary tokens (hash ≡ 0 mod the boundary
    * modulus) close chunks, tail past the last boundary is final, and
    * chunk identity is the 62-bit double modular fold of the chunk's
    * token hashes (f1·2³¹ + f2, fold 1 mixing 1000003 mod 2³¹−1 and
    * fold 2 mixing 1000033 mod the DIFFERENT prime 2147483629, so a
    * single-token hash delta cannot cancel both folds — the same
    * constants the production expressions and the DuckDB oracle
    * share).
    */
  private def refCdcHashes(text: String): Seq[Long] = {
    def p64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def fold(hs: Seq[Long], mix: Long, mod: Long): Long =
      hs.foldLeft(0L)((acc, h) => (acc * mix + h) % mod)
    def chunkHash(hs: Seq[Long]): Long =
      fold(hs, 1000003L, 2147483647L) * (1L << 31) + fold(hs, 1000033L, 2147483629L)
    val tk = text.split(" ").filter(_.nonEmpty)
    if (tk.isEmpty) Seq.empty
    else {
      val th = tk.map(p64).toSeq
      val chunks = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      var cur = scala.collection.mutable.ArrayBuffer[Long]()
      th.foreach { h =>
        cur += h
        if (h % DedupOps.CdcBoundaryMod == 0) { chunks += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() }
      }
      if (cur.nonEmpty) chunks += cur.toSeq
      chunks.toSeq.map(chunkHash)
    }
  }

  test("trigram fold identities equal the sequential reference on corpus docs") {
    // Sequential reference of the shingle identity every near-dup query
    // keys on: portable64 per token, then per consecutive triple the
    // SAME 62-bit coprime double fold the CDC chunker uses (shared
    // constants — if either side drifts, this and the DuckDB oracles
    // both catch it).
    def p64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def fold(hs: Seq[Long], mix: Long, mod: Long): Long =
      hs.foldLeft(0L)((acc, h) => (acc * mix + h) % mod)
    def refTrigrams(text: String): Seq[Long] = {
      val th = text.split(" ").filter(_.nonEmpty).map(p64).toSeq
      th.sliding(3).filter(_.length == 3).map(t =>
        fold(t, 1000003L, 2147483647L) * (1L << 31) +
          fold(t, 1000033L, 2147483629L)).toSeq
    }
    val sfDir = "/root/testdata/sf0.001"
    val sample = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 15).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 15)
      .select(col("doc_id"), graft.queries.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        transform(col("toks"), t => DedupOps.portable64(t)).as("th"))
      .select(col("doc_id"), DedupOps.trigramHashesOf(col("th")).as("tg"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet === sample.keySet)
    got.foreach { case (id, tg) =>
      assert(tg === refTrigrams(sample(id)), s"doc $id") }
    // Short and empty docs produce no trigrams.
    val edge = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), graft.queries.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        transform(col("toks"), t => DedupOps.portable64(t)).as("th"))
      .select(col("doc_id"), DedupOps.trigramHashesOf(col("th")).as("tg"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(edge(1L).isEmpty && edge(2L).isEmpty)
  }

  test("cdc chunk hashes equal the sequential reference on real corpus docs") {
    val sfDir = "/root/testdata/sf0.001"
    val sample = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 25).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = DedupOps.cdcChunkHashes(
        graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 25))
      .as[(Long, Seq[Long])].collect().toMap
    val want = sample.view.mapValues(refCdcHashes).filter(_._2.nonEmpty).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, hs) => assert(hs === want(id), s"doc $id") }
  }

  test("cdc dedup marks shared-passage chunks duplicate across documents") {
    val tmp = java.nio.file.Files.createTempDirectory("cdc_docs").toString
    // Docs 1 and 2 are identical -> every chunk duplicated; doc 3 is
    // unique text with all-distinct tokens -> no duplicate chunks.
    Seq((1L, base, "en", "t", 0L), (2L, base, "en", "t", 0L),
      (3L, "alpha beta gamma delta epsilon zeta", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = DedupOps.cdcDedup(spark, tmp)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, d, p) => id -> ((n, d, p)) }.toMap
    assert(rows(1L)._3 === 1000000L, "identical doc fully duplicate")
    assert(rows(2L)._3 === 1000000L)
    assert(rows(3L)._2 === 0L && rows(3L)._3 === 0L, "unique doc clean")
    // Chunk counts partition the token stream: n_chunks >= 1 and every
    // token is in exactly one chunk (reference count agrees).
    assert(rows(1L)._1 === refCdcHashes(base).length.toLong)
  }

  test("lsh recall audit matches a direct intersection of its two inputs") {
    val sfDir = "/root/testdata/sf0.001"
    val (truthN, recalled, ppm) = DedupOps.lshRecall(spark, sfDir)
      .as[(Long, Long, Long)].collect().head
    assert(recalled >= 0L && recalled <= truthN)
    assert(ppm === recalled * 1000000L / math.max(truthN, 1L))
    val exact = DedupOps.jaccard(spark, sfDir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val cand = DedupOps.minhashEstimate(spark, sfDir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(recalled === exact.count(cand).toLong)
    assert(truthN === exact.size.toLong)
  }

  test("bloom pre-filter never misses a true duplicate and audits consistently") {
    val tmp = java.nio.file.Files.createTempDirectory("bloom_docs").toString
    // 300 docs; every 10th shares its text with its predecessor, so
    // SOME duplicate pairs straddle the hash-split boundary.
    val docs = (0 until 300).map { i =>
      val text = if (i % 10 == 9) s"doc body ${i - 1}" else s"doc body $i"
      (i.toLong, text, "en", "t", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    // Expected ground truth via the same split assignment.
    val d = SampleOps.withSplit(graft.Tables.documents(spark, tmp))
      .select(col("doc_id"), col("split"), col("text"))
      .as[(Long, String, String)].collect()
    val histTexts = d.filter(_._2 == "train").map(_._3).toSet
    val batch = d.filter(_._2 != "train")
    val wantDups = batch.count(b => histTexts.contains(b._3)).toLong
    assert(wantDups > 0L, "the planted corpus must have cross-split duplicates")

    val (batchDocs, flagged, trueDups, falsePos, fpPpm) =
      DedupOps.bloomDedup(spark, tmp)
        .as[(Long, Long, Long, Long, Long)].collect().head
    assert(batchDocs === batch.length.toLong)
    assert(trueDups === wantDups)
    // The defining property: a set bit can lie, a clear bit cannot —
    // every true duplicate is flagged.
    assert(flagged >= trueDups, "bloom must never miss a true duplicate")
    assert(falsePos === flagged - trueDups)
    assert(fpPpm === falsePos * 1000000L / math.max(batchDocs - trueDups, 1L))
  }

  test("cdc cross-document ranking surfaces the shared passage only") {
    val tmp = java.nio.file.Files.createTempDirectory("cdc_cross").toString
    // Three docs embed the SAME passage between distinct prefixes and
    // suffixes; a fourth doc is all-unique tokens. Content-defined
    // boundaries re-synchronize inside the shared region (boundary =
    // token-hash property, position-independent), so its interior
    // chunks hash identically in all three docs.
    val shared = (1 to 60).map(i => s"w${i % 13}x${i % 7}").mkString(" ")
    def doc(i: Int) = s"pre${i}a pre${i}b $shared post${i}a post${i}b"
    (Seq.tabulate(3)(i => ((i + 1).toLong, doc(i), "en", "t", 0L)) :+
      ((9L, "alpha beta gamma delta epsilon zeta", "en", "t", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = DedupOps.cdcCross(spark, tmp)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "shared interior chunks must surface")
    assert(rows.forall { case (_, d, i) => d >= 2 && i >= d },
      "every reported chunk spans >= 2 docs with insts >= n_docs")
    assert(rows.exists(_._2 === 3L), "the shared passage spans all three docs")
    assert(rows.forall(_._2 <= 3L), "the unique doc contributes no pairs")
    // Ranking is (n_docs desc, insts desc, h asc).
    val key = rows.map { case (h, d, i) => (-d, -i, h) }
    assert(key.sameElements(key.sorted), "rank order is deterministic")
  }

  test("within-doc repetition signals match hand counts on planted docs") {
    val tmp = graft.Scratch.dir("repetition_docs")
    Seq(
      (1L, "a a a a b", "en", "t", 0L),       // top 4/5; dup2 3/4; dup3 2/3
      (2L, "p q r s", "en", "t", 0L),         // all distinct
      (3L, "x y", "en", "t", 0L),             // too short for any 3-gram
      (4L, "solo", "en", "t", 0L))            // single token
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val out = DedupOps.textRepetition(spark, tmp)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === ((5L, 800000L, 750000L, 666666L)))
    assert(out(2L) === ((4L, 250000L, 0L, 0L)))
    assert(out(3L) === ((2L, 500000L, 0L, 0L)))
    assert(out(4L) === ((1L, 1000000L, 0L, 0L)))
  }

  test("index probe scores batch-history and batch-batch pairs, never history-history") {
    // History: two near-dup docs (1, 2) and an unrelated doc (3).
    // Batch: a near-dup of history doc 1 (10) plus two batch-side
    // near-dups of each other (11, 12) sharing nothing with history.
    val other =
      "orange trees grow sweet fruit in warm coastal valleys every summer season"
    val otherDup = other.replace("summer", "winter")
    val hist = DedupOps.shingleSetWithSize(
      docs((1L, base), (2L, nearDup), (3L, unrelated)))
    val batch = DedupOps.shingleSetWithSize(
      docs((10L, base), (11L, other), (12L, otherDup)))
    val out = DedupOps.shingleProbePairs(hist, batch)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(out.contains((10L, 1L)),
      "batch near-dup of an indexed doc must surface as (new, old)")
    assert(out.contains((11L, 12L)),
      "batch-batch near-dups must surface once with a < b")
    assert(!out.contains((12L, 11L)), "batch-batch pairs must not repeat")
    assert(!out.exists { case (a, _) => a < 10L },
      "history docs never appear on the batch side")
    assert(!out.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated docs pair with nothing")
  }

  test("canonical election keeps most tokens, breaks ties to lowest id") {
    import spark.implicits._
    // One 3-member component (2 and 3 tie on tokens — 2 wins by id) and
    // one 2-member component with a strict winner.
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "rep")
    val tc = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 2L), (9L, 4L))
      .toDF("doc_id", "tok_cnt")
    val out = DedupOps.canonicalOf(lab, tc)
      .select("doc_id", "canonical", "action")
      .as[(Long, Long, String)].collect().toSet
    assert(out === Set(
      (1L, 2L, "drop"), (2L, 2L, "keep"), (3L, 2L, "drop"),
      (7L, 9L, "drop"), (9L, 9L, "keep")))
  }
}
