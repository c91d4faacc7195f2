package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for an LLM-data pipeline (SURVEY.md §2.4):
  * exact (dropDuplicates / content-hash), n-gram Jaccard near-dup, and
  * the two sketch families that make near-dup tractable at 100 TB —
  * MinHash+LSH banding and SimHash.
  *
  * Scale posture: nothing here is all-pairs over the corpus. The Jaccard
  * query joins on shared shingles (pairs only materialize for documents
  * that overlap at all), and the MinHash/SimHash paths reduce each
  * document to a constant-size signature first, so candidate generation
  * is a hash-bucket group-by — the standard shape that survives a
  * 1000-executor corpus where brute force cannot.
  */
object DedupOps {

  /** Word trigrams over a token array column: zip the array with its
    * two self-shifts and concat each triple. `zip_with` evaluates each
    * child array ONCE per row and then streams — so this stays
    * O(tokens) per document even when an optimizer rule (e.g.
    * `InferFiltersFromGenerate`, which copies a generator's child into
    * an inferred filter and pushes it below the token-binding
    * projection) re-inlines the whole `split`-based token subtree.
    * The previous `transform(sequence, i -> element_at(toks, i))`
    * shape re-evaluated the inlined child per lambda call — O(tokens²)
    * interpreted, measured 9s vs 0.5s at sf0.1 for the same 5k docs.
    * `greatest(n-2, 0)` makes the slices empty below 3 tokens, so no
    * separate guard is needed.
    *
    * This STRING form defines what a shingle is (and the spec pins it);
    * every production query keys on the fold-derived trigram identity
    * instead ([[trigramHashesOf]] over [[hashedTokens]] — one digest
    * per token, integer arithmetic per trigram, 8-byte shuffle keys).
    */
  def shinglesOfTokens(toks: Column): Column = {
    val n = greatest(size(toks) - 2, lit(0))
    zip_with(slice(toks, lit(1), n), zip_with(slice(toks, lit(2), n), slice(toks, lit(3), n),
        (y, z) => concat_ws(" ", y, z)),
      (x, yz) => concat_ws(" ", x, yz))
  }

  /** Spread CPU-bound per-row work across the cluster: parquet split
    * counts track BYTES, so a small-but-text-heavy table can arrive in
    * one split and serialize the (md5-per-token) hash work on one
    * core. Repartitions only when the scan has fewer partitions than
    * the cluster's parallelism — at production scale the scan already
    * has thousands of splits and this is a no-op with no shuffle.
    */
  private def cpuSpread(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // Decide from input file BYTES, not `df.rdd.getNumPartitions` — the
    // latter plans the whole query eagerly (a second full planning pass
    // plus a visible RoundRobin exchange in explain) just to read one
    // number. Spark's scan splitter never cuts below the 4 MB open-cost
    // floor, so an input under target*4 MB cannot reach `target` scan
    // partitions and gets the explicit spread; production-scale inputs
    // blow past the threshold and this is a no-op with no shuffle.
    // `inputFiles` reads the already-built FileIndex — no job, no plan.
    val conf = sc.hadoopConfiguration
    val openCostBytes = 4L << 20
    val bytes = df.inputFiles.iterator.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    if (bytes < target * openCostBytes) df.repartition(target) else df
  }

  /** (doc_id, toks): the token array bound to an attribute, so every
    * downstream shingle HOF sees an O(1)-access array (see the
    * [[shinglesOfTokens]] perf contract); CPU-spread first (the shingle
    * hashing downstream dominates the cost of every sketch query).
    */
  def tokenized(docs: DataFrame): DataFrame =
    cpuSpread(docs).select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))

  /** Per-row distinct shingle set over a BOUND token-array attribute
    * (`array_distinct` — no shuffle).
    */
  def shingleSetOfTokens(toks: Column): Column = array_distinct(shinglesOfTokens(toks))

  /** Exact dedup via dropDuplicates on a column subset. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .dropDuplicates("lang", "source")
      .select("lang", "source")
      .orderBy("lang", "source")

  /** Exact content dedup at scale: count distinct SHA-256 of the text
    * (the content-addressed form used when the corpus is too wide to
    * compare raw payloads).
    */
  def hashCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .agg(countDistinct(sha2(col("text"), 256)).as("distinct_docs"))

  /** SOFT dedup — duplicate-aware sampling WEIGHTS instead of removal
    * (the "each copy trains with weight 1/n" regime several LLM data
    * papers prefer over hard dedup, preserving natural frequency
    * signal while bounding duplicate gradient mass): every document
    * keeps one row, weighted `1e6 div n_copies` ppm by exact content
    * hash, so the expected contribution of duplicated CONTENT equals
    * one copy. One wordcount-class hash count + one key-shared join
    * back; the summary columns (corpus size, distinct contents,
    * duplicated-copy surplus) ride a window over the already-grouped
    * count relation. The weights land next to `sample_weighted`'s
    * machinery: weighted priority sampling consumes exactly this
    * column.
    */
  def softWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val copies = docs.groupBy("h").agg(count(lit(1)).as("n_copies"))
    docs.join(copies, "h")
      .select(col("doc_id"), col("n_copies"),
        expr("1000000 div n_copies").as("weight_ppm"))
      .orderBy("doc_id")
  }

  /** Incremental ingest dedup: which documents of an incoming batch are
    * NOT already in the historical corpus, by exact content hash — the
    * op a daily crawl runs before appending. The split buckets stand in
    * for the two corpora (train = history, valid+test = today's batch);
    * production would read the historical hashes from the stored
    * content-addressed index instead of recomputing them. Shape: one
    * anti-join on the 32-byte hash — history ships as hashes only
    * (never text), and the join is the standard shuffle-on-key that
    * scales with corpus size; no all-pairs, no driver state.
    */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val d = SampleOps.withSplit(Tables.documents(spark, dir))
      .select(col("doc_id"), col("split"), sha2(col("text"), 256).as("h"))
    val history = d.filter(col("split") === "train").select("h").distinct()
    d.filter(col("split") =!= "train")
      .join(history, Seq("h"), "left_anti")
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Distinct (doc_id, shingle-identity) rows, each carrying the doc's
    * set size. Shingle identity is the 62-bit fold of per-token hashes
    * ([[trigramHashesOf]] over the [[hashedTokens]] binding — one md5
    * per token, integer arithmetic per trigram), so the downstream
    * group-by shuffles fixed 8-byte keys instead of variable-length
    * trigram strings. The set array is projected ONCE and consumed
    * twice (`size` + `explode`) in the same stage — shingle hashing is
    * the expensive part of every near-dup query, so it must run
    * exactly one time per document. Carrying `n_sh` through the
    * shuffle costs 8 bytes/row and removes both the second corpus scan
    * and the two size joins the previous shape needed.
    *
    * `explode_outer` + a post-Generate `isNotNull`, NOT plain `explode`:
    * `InferFiltersFromGenerate` only fires on non-outer generates, and
    * on the plain form its inferred `size(shset) > 0` filter gets pushed
    * through the binding projection to the scan, re-inlining (and
    * re-evaluating) the whole tokenize+hash+fold tree over raw `text` —
    * a measured ~2× on the shingle stage. The outer form emits one null
    * `sh` per shingle-less doc, which the attribute-level filter drops
    * for the identical relation at O(1) cost.
    */
  private[queries] def shingleSetWithSize(docs: DataFrame): DataFrame =
    hashedTokens(docs)
      .select(col("doc_id"), array_distinct(trigramHashesOf(col("th"))).as("shset"))
      .select(col("doc_id"), size(col("shset")).cast("long").as("n_sh"),
        explode_outer(col("shset")).as("sh"))
      .filter(col("sh").isNotNull)

  /** Doc-frequency stoplist threshold: a shingle appearing in more than
    * this many documents is dropped before pair expansion. Real corpora
    * have stop-shingles ("of the and", boilerplate headers) in millions
    * of documents; expanding one into pairs is quadratic in its doc
    * frequency and would dominate the whole job at 100 TB. Near-dup
    * pairs share MANY shingles, so losing the ubiquitous ones barely
    * moves their intersection count, while the expansion bound drops
    * from max-doc-frequency² to K² per shingle. The cap makes `inter`
    * (and hence `j_ppm`) a lower bound when it bites; the oracle SQL
    * applies the identical cap (generated from this constant), so both
    * engines agree exactly.
    */
  val JaccardMaxDf = 50

  // ---- Persisted shingle index ----------------------------------------

  /** Memoized per-(JVM, sfDir) shingle-index pointer (the
    * [[graft.SessionArtifact]] ensure/rebuild contract).
    */
  private val shingleArtifact = new graft.SessionArtifact("shingleindex")

  /** Write the `(sh, doc_id, n_sh)` artifact into `p`: one corpus scan
    * (the [[shingleSetWithSize]] projection — one digest per token,
    * fold-derived trigram identities) into a compact all-BIGINT parquet
    * table. This is the expensive part of EVERY portable-family
    * near-dup query, done once.
    */
  private def buildShingleIndex(spark: SparkSession, dir: String)(p: String): Unit =
    shingleSetWithSize(Tables.documents(spark, dir))
      .select("sh", "doc_id", "n_sh")
      .write.mode("overwrite").parquet(p)

  /** The persisted shingle index for `dir`, built at most once per JVM
    * (double-checked under a lock; losers of the race read the winner's
    * files). Longs round-trip parquet exactly, so every derivation from
    * the index is value-identical to the direct-from-text form — which
    * is precisely what the shared oracles gate: the DuckDB twins all
    * recompute from raw text, so index-build + probe ≡ direct
    * computation is pinned as an exact value match on every consumer.
    *
    * This is the production posture at 100 TB: the shingle table is a
    * STORED artifact a daily batch maintains incrementally (append the
    * batch's rows — the `neardup_minhash_incr` contract), and the
    * near-dup family PROBES it instead of re-tokenizing and re-hashing
    * the corpus once per query. The memoization is the single-session
    * stand-in for that stored table; `neardup_index` rebuilds it from
    * scratch every run so the build cost itself stays a measured,
    * first-class bench entry rather than hiding inside whichever
    * consumer happens to run first.
    */
  private[queries] def shingleIndex(spark: SparkSession, dir: String): DataFrame = {
    spark.read.parquet(shingleArtifact.ensure(dir)(buildShingleIndex(spark, dir)))
  }

  /** Registered index-build query (`neardup_index`): rebuild the
    * persisted shingle index unconditionally, publish it to the
    * consumers' pointer, and report the index's summary statistics —
    * entry count, distinct shingles, indexed docs, the hottest
    * shingle's doc frequency, and how many shingles the
    * [[JaccardMaxDf]] stoplist will drop at expansion time. The
    * summary reads back the artifact (not the in-flight frame), so a
    * corrupted write could not report clean numbers; its oracle
    * recomputes the same statistics from raw text.
    */
  def shingleIndexBuild(spark: SparkSession, dir: String): DataFrame = {
    val idx = spark.read.parquet(
      shingleArtifact.rebuild(dir)(buildShingleIndex(spark, dir)))
    val dfStats = idx.groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(sum("df").as("n_entries"),
        count(lit(1)).as("n_shingles"),
        max("df").as("max_df"),
        sum(when(col("df") > JaccardMaxDf, 1L).otherwise(0L)).as("hot_shingles"))
    val docStats = idx.agg(count_distinct(col("doc_id")).as("n_docs"))
    dfStats.crossJoin(broadcast(docStats))
      .select(col("n_entries"), col("n_shingles"), col("n_docs"),
        col("max_df"), col("hot_shingles"))
  }

  /** The shingle index maintained as a VERSIONED SnapshotTable — the
    * two session-artifact stories composed: generation 1 commits the
    * history split's `(sh, doc_id, n_sh)` rows (the initial backfill),
    * generation 2 APPENDS only the batch split's rows (history's files
    * carried verbatim by the manifest — the daily-crawl append cost is
    * the batch, never a rewrite), and the query probes the LATEST
    * snapshot with the direct Jaccard scoring. Because the splits
    * partition the corpus, generation 2's content IS the full corpus
    * index — so this registers under `neardup_jaccard`'s own oracle
    * string: versioned-index maintenance ≡ direct computation, gated
    * as an exact value match (the strongest form of the shared-oracle
    * equivalence contract, now across BOTH the index layer and the
    * snapshot layer). Time travel falls out for free: generation 1 is
    * "the index before today's crawl".
    */
  def shingleIndexIncremental(spark: SparkSession, dir: String): DataFrame = {
    val table = shingleSnapArtifact.rebuild(dir)(buildShingleSnapshot(spark, dir))
    scoreJaccard(pairCountsOf(
        graft.sources.SnapshotTable.readAs(spark, table, 2L)))
      .orderBy(desc("j_ppm"), asc("a"), asc("b"))
      .limit(20)
  }

  /** Memoized per-(JVM, sfDir) location of the versioned shingle
    * SnapshotTable — [[shingleIndexPaths]]'s discipline at the snapshot
    * layer: [[shingleIndexIncremental]] rebuilds it unconditionally
    * (the maintenance cost stays a measured bench entry) into a FRESH
    * table directory and swaps the pointer; [[shingleIndexProbe]]
    * ensure-builds and probes, exactly as a daily batch job probes the
    * stored table another job maintains.
    */
  private val shingleSnapArtifact = new graft.SessionArtifact("shingle_snap")

  /** Commit the two-generation versioned shingle table into `table`
    * (gen 1 = history backfill, gen 2 appends the batch with history's
    * files carried by the manifest). Both generations' rows come from
    * the persisted session artifact (the split is a pure function of
    * doc_id, so it applies to index rows directly) — the backfill
    * never re-tokenizes the corpus.
    */
  private def buildShingleSnapshot(spark: SparkSession, dir: String)(table: String): Unit = {
    def rows(split: org.apache.spark.sql.Column): DataFrame =
      SampleOps.withSplit(shingleIndex(spark, dir))
        .filter(split).select("sh", "doc_id", "n_sh")
    graft.sources.SnapshotTable.commit(rows(col("split") === "train"), table, 1L)
    graft.sources.SnapshotTable.commit(rows(col("split") =!= "train"),
      table, 2L, carryFrom = Some(1L))
  }

  /** The BATCH-ONLY probe of the versioned shingle index — the
    * scale-complete daily-crawl step that [[shingleIndexIncremental]]
    * deliberately over-verifies: where `neardup_index_incr` re-scores
    * the whole corpus to pin maintenance ≡ direct as one exact oracle,
    * this query scores only batch×(batch∪history) candidate pairs —
    * the [[minhashIncremental]] contract at the index layer. Same
    * snapshot flow (generation 1 = history backfill, generation 2
    * appends the batch's rows with history's files carried by the
    * manifest), then the batch's index rows join the latest snapshot
    * on shared shingles under the global [[JaccardMaxDf]] stoplist:
    * per-batch cost is batch rows × ≤ cap matches — it tracks the
    * BATCH, never corpus², at any history size. History-history pairs
    * are out of scope by construction (they were scored when THEIR
    * batch arrived); batch-batch pairs surface once (`a < b`), and
    * batch-history pairs surface as (a = new doc, b = indexed doc).
    * Exact value oracle: the same shingle + split CTEs reproduce the
    * candidates and scores in SQL.
    */
  def shingleIndexProbe(spark: SparkSession, dir: String): DataFrame = {
    val full = SampleOps.withSplit(graft.sources.SnapshotTable.readAs(
      spark, shingleSnapArtifact.ensure(dir)(buildShingleSnapshot(spark, dir)), 2L))
    shingleProbePairs(full.filter(col("split") === "train"),
      full.filter(col("split") =!= "train"))
  }

  /** [[shingleIndexProbe]]'s scoring step over arbitrary
    * history/batch `(sh, doc_id, n_sh)` index frames (exposed for
    * tests, which plant a batch near-dup of an indexed doc and a
    * batch-batch pair).
    */
  private[queries] def shingleProbePairs(history: DataFrame,
      batch: DataFrame): DataFrame = {
    val full = history.select(col("sh"), col("doc_id"), col("n_sh"), lit(true).as("hist"))
      .unionByName(batch.select(col("sh"), col("doc_id"), col("n_sh"), lit(false).as("hist")))
    // One pass, two shuffles (the pairCountsOf shape): group the LATEST
    // snapshot by shingle, expand each shingle's sorted doc list into
    // unordered (a < b) pairs IN-ARRAY with the history flags carried,
    // and drop history-history pairs inside the expansion. The
    // size-of-list filter IS the global doc-frequency stoplist — the
    // cap that bounds every shingle's fan-out (a hot shingle emits zero
    // pairs instead of df² of them). The old shape re-derived the df
    // table and joined it back: one extra corpus-keyed shuffle for the
    // same candidate set. Trade (shared with pairCountsOf, the
    // established build shape): a hot shingle's posting list DOES
    // materialize transiently in the collect buffer before the size
    // filter drops the group — O(df) per group, spill-backed; the old
    // count-then-join shape avoided that buffer at the price of the
    // extra shuffle.
    val pairs = full.groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id").as("d"),
        col("n_sh").as("n"), col("hist").as("h")))).as("ds"))
      // The exists-guard keeps the probe's cost tracking the BATCH at
      // any history size: a shingle carried only by history rows never
      // expands at all (its pairs were scored when their batches
      // arrived) — the scan-local equivalent of the old batch-first
      // join, without that join's extra corpus-keyed shuffle.
      .filter(size(col("ds")) > 1 && size(col("ds")) <= JaccardMaxDf &&
        expr("exists(ds, x -> NOT x.h)"))
      .select(explode(expr(
        """filter(flatten(transform(sequence(0, size(ds)-2),
          |  i -> transform(slice(ds, i+2, size(ds)-i-1),
          |       y -> named_struct('a', ds[i].d, 'na', ds[i].n, 'ha', ds[i].h,
          |                         'b', y.d, 'nb', y.n, 'hb', y.h)))),
          |  p -> NOT (p.ha AND p.hb))""".stripMargin)).as("p"))
    // Batch-history pairs report the BATCH side as `a` whichever sort
    // order held; batch-batch pairs keep the sorted (a < b) order.
    pairs.select(
        when(col("p.ha"), col("p.b")).otherwise(col("p.a")).as("a"),
        when(col("p.ha"), col("p.a")).otherwise(col("p.b")).as("b"),
        when(col("p.ha"), col("p.nb")).otherwise(col("p.na")).as("na"),
        when(col("p.ha"), col("p.na")).otherwise(col("p.nb")).as("nb"))
      .groupBy("a", "b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .select(col("a"), col("b"), col("inter"),
        floor(col("inter") * lit(1000000.0) / (col("na") + col("nb") - col("inter")))
          .cast("long").as("j_ppm"))
      .orderBy(desc("j_ppm"), asc("a"), asc("b"))
      .limit(20)
  }

  /** n-gram Jaccard near-dup: top-20 most similar document pairs.
    * |A∩B| comes from grouping the shingle table by shingle and expanding
    * each shingle's (small) doc list into unordered pairs in-array — one
    * corpus scan and one shuffle total. The doc list is sorted, so pairs
    * come out (a < b) with both set sizes attached; grouping keys carry
    * na/nb (functionally dependent on a/b — no extra exchange). Never
    * all-pairs over the corpus: pairs only materialize for docs that
    * share a shingle, and the per-shingle expansion is hard-bounded by
    * the [[JaccardMaxDf]] doc-frequency stoplist (a hot shingle emits
    * zero pairs instead of df² of them).
    * |A∪B| = |A|+|B|-|A∩B|; similarity surfaces as floor-scaled ppm so
    * the compare is integer-exact.
    */
  def jaccard(spark: SparkSession, dir: String): DataFrame =
    jaccardTopOf(scoreJaccard(spark.read.parquet(
      pairCountsArtifact.rebuild(dir)(buildPairCounts(spark, dir)))))

  /** The top-20 head [[jaccard]] reports, over any scored pair frame.
    * Consumers that need the truth pairs WITHOUT re-measuring the build
    * ([[lshRecall]]) apply it to the ensured [[pairCountsIndex]].
    */
  private def jaccardTopOf(scored: DataFrame): DataFrame =
    scored.orderBy(desc("j_ppm"), asc("a"), asc("b")).limit(20)

  /** Memoized per-(JVM, sfDir) persisted pair-counts pointer: the
    * stoplist-bounded shared-shingle expansion is the single most
    * expensive step of the whole portable near-dup family, and three
    * registered queries (`neardup_jaccard`, `neardup_containment`,
    * `neardup_edit`) derive from the IDENTICAL `(a, b, na, nb, inter)`
    * frame — so it gets the same session-index treatment as the
    * shingle and signature tables: built once per (JVM, dir), probed
    * by every consumer. All five columns are BIGINT (exact parquet
    * round-trip), and every consumer's oracle recomputes from raw
    * text, so persisted-expansion ≡ direct-expansion is value-gated
    * on each of the three. [[jaccard]] is the designated measured
    * build: it rebuilds unconditionally so the expansion cost stays a
    * first-class bench entry instead of hiding in whichever consumer
    * runs first.
    */
  private val pairCountsArtifact = new graft.SessionArtifact("paircounts")

  /** Write the pair-counts artifact for `dir` into `p` (the
    * [[pairCountsOf]] expansion of the persisted [[shingleIndex]]).
    */
  private def buildPairCounts(spark: SparkSession, dir: String)(p: String): Unit =
    pairCountsOf(shingleIndex(spark, dir))
      .write.mode("overwrite").parquet(p)

  /** The persisted shared-shingle pair counts for `dir`, built at most
    * once per JVM (losers of the ensure race read the winner's files).
    */
  private[queries] def pairCountsIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(pairCountsArtifact.ensure(dir)(buildPairCounts(spark, dir)))

  /** Shared-shingle pair counts (a, b, na, nb, inter) under the
    * [[JaccardMaxDf]] stoplist, over any `(sh, doc_id, n_sh)` frame —
    * the one expansion every similarity score derives from, fed either
    * by the persisted [[shingleIndex]] (registered queries) or by a
    * direct [[shingleSetWithSize]] projection (the docs-frame test
    * cores).
    */
  private def pairCountsOf(shingles: DataFrame): DataFrame =
    shingles
      .groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id").as("d"), col("n_sh").as("n")))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= JaccardMaxDf)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ds)-2),
          |  i -> transform(slice(ds, i+2, size(ds)-i-1),
          |       y -> named_struct('a', ds[i].d, 'na', ds[i].n, 'b', y.d, 'nb', y.n))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"), col("p.na").as("na"), col("p.nb").as("nb"))
      .agg(count(lit(1)).as("inter"))

  /** The [[JaccardMaxDf]]-bounded pair counts for a raw documents frame
    * (test core; registered queries probe the persisted index instead).
    */
  private def sharedShinglePairCounts(docs: DataFrame): DataFrame =
    pairCountsOf(shingleSetWithSize(docs))

  /** Jaccard scoring over a pair-counts frame (the [[jaccard]] body
    * minus the top-k).
    */
  private def scoreJaccard(pc: DataFrame): DataFrame =
    pc.select(col("a"), col("b"), col("inter"),
      floor(col("inter") * lit(1000000.0) / (col("na") + col("nb") - col("inter")))
        .cast("long").as("j_ppm"))

  /** All scored pairs for a documents frame, exposed so tests can
    * assert the stoplist's pair-count bound directly (and pin
    * direct-from-text ≡ index-probed).
    */
  def jaccardPairs(docs: DataFrame): DataFrame =
    scoreJaccard(sharedShinglePairCounts(docs))

  /** Containment near-dup: top-20 pairs by |A∩B| / min(|A|,|B|) — the
    * asymmetric score that catches INCLUSION (one document quoting or
    * wholly embedding another), which symmetric Jaccard dilutes: a 50-
    * shingle doc inside a 1000-shingle doc scores J ≈ 0.05 but
    * containment = 1.0. Probes the persisted [[pairCountsIndex]] (the
    * exact [[jaccardPairs]] expansion, same stoplist bound) with a
    * different final ratio, so its 100 TB posture is identical.
    */
  def containment(spark: SparkSession, dir: String): DataFrame =
    scoreContainment(pairCountsIndex(spark, dir))
      .orderBy(desc("cont_ppm"), asc("a"), asc("b"))
      .limit(20)

  /** Containment scoring over a pair-counts frame. */
  private def scoreContainment(pc: DataFrame): DataFrame =
    pc.select(col("a"), col("b"), col("inter"),
      floor(col("inter") * lit(1000000.0) / least(col("na"), col("nb")))
        .cast("long").as("cont_ppm"))

  /** All containment-scored pairs (exposed for tests). */
  def containmentPairs(docs: DataFrame): DataFrame =
    scoreContainment(sharedShinglePairCounts(docs))

  /** 60-bit engine-portable hash: the first 15 hex chars of md5, read as
    * an integer. DuckDB computes the identical value
    * (`CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`), so every sketch
    * built on it gets an exact value oracle instead of a rows-only
    * check. 60 bits (not 64) keeps the value positive in a signed long
    * on both engines with no byte-order or overflow questions.
    *
    * Computed by the native [[graft.functions.DigestPrefix64]]
    * expression — bit-identical to the composed built-ins
    * `conv(substring(md5(c), 1, 15), 16, 10)` (property-pinned in
    * DigestPrefix64Spec) but without the three per-call UTF8String
    * allocations (hex render, substring, base-16 parse) the composition
    * pays on every shingle.
    */
  def portable64(c: Column): Column = graft.functions.DigestPrefix64(c)

  /** Per-token portable hashes bound to an attribute: (doc_id, th) with
    * `th[i] = portable64(tk[i])`. Every near-dup query derives shingle
    * identity from THIS array — each token is md5-hashed exactly once
    * per document, and every trigram identity is then pure integer
    * arithmetic over three neighboring entries ([[trigramHashesOf]]).
    * The previous shape digested each JOINED trigram string instead:
    * ~3× the md5 calls (each token appears in 3 trigrams) over ~3× the
    * bytes per call, plus a `concat_ws` allocation per trigram — it was
    * the dominant cost of the four slowest near-dup queries. The `th`
    * binding projection survives CollapseProject because the array is
    * consumed by three slice references (non-cheap, multi-referenced),
    * the same mechanism that keeps `toks` bound in [[tokenized]].
    */
  private def hashedTokens(docs: DataFrame): DataFrame =
    tokenized(docs).select(col("doc_id"),
      transform(col("toks"), t => portable64(t)).as("th"))

  /** A seeded min-hash family: `tokenHash` hashes one raw token,
    * `shingleHashes` derives the trigram-identity array from the bound
    * token-hash array, `base` collapses a trigram identity to the
    * member base value, `member(j, base)` derives the j-th family
    * member from it (Broder-style derived permutations — deriving from
    * the short base is much cheaper than re-hashing the shingle per
    * member), and `bucket` hashes one band's signature slice to its
    * LSH bucket.
    */
  final case class HashFamily(
      tokenHash: Column => Column,
      shingleHashes: Column => Column,
      base: Column => Column,
      member: (Int, Column) => Column,
      bucket: Seq[Column] => Column)

  /** Mersenne prime 2^31 - 1: the modulus of the portable family's
    * Carter-Wegman members. Every intermediate product stays under
    * 2^62, so Spark longs and DuckDB BIGINTs compute it identically
    * with no overflow on either engine.
    */
  val P31: Long = graft.functions.SpanFold.Mod1

  private[queries] def memberA(j: Int): Long = ((2L * j + 1) * 2654435761L) % P31
  private[queries] def memberB(j: Int): Long = (j * 40503L * 65537L) % P31
  // Fold constants live in SpanFold (the native expression is their
  // single source of truth); these re-exports keep the oracle
  // generators and the sketch members reading one set of values.
  private val BucketMix = graft.functions.SpanFold.Mix1

  /** 62-bit trigram identities from a bound token-hash array: for each
    * window of three consecutive token hashes, the SAME coprime double
    * modular fold [[cdcChunkHashes]] uses for chunk identity
    * ([[BucketMix]] mod [[P31]] and [[CdcMix2]] mod [[P31B]], combined
    * as `f1·2³¹ + f2` — see [[CdcMix2]]'s doc for why one modulus is
    * not enough). Exactly reproducible in DuckDB integer arithmetic
    * ([[duckTrigram]] is generated from the same constants), so every
    * query keyed on these identities keeps an exact value oracle.
    *
    * Shape: the native [[graft.functions.SpanFold]] expression at
    * width 3 — ONE fused codegen loop over the bound array, no
    * intermediate slice/zip allocations (r10; the previous two-pass
    * `zip_with` form survives as [[trigramHashesOfHof]], the spec
    * baseline SpanFold is property-pinned bit-equal to). All
    * intermediates stay under 2⁶³ for 60-bit token hashes: partial
    * fold ≤ 2³¹·2²⁰ + 2⁶⁰ < 2⁶¹, packed identity < 2⁶² + 2³¹.
    */
  def trigramHashesOf(th: Column): Column = graft.functions.SpanFold(th, 3)

  /** The HOF reference formulation of [[trigramHashesOf]] (ZipWith is
    * CodegenFallback — correct but per-element interpreted; kept as the
    * spec baseline the native [[graft.functions.SpanFold]] must match
    * bit-for-bit, the ArrayDot/dotHof precedent).
    */
  def trigramHashesOfHof(th: Column): Column = {
    val n = greatest(size(th) - 2, lit(0))
    val partial = zip_with(slice(th, lit(1), n), slice(th, lit(2), n), (h1, h2) =>
      ((h1 % P31) * BucketMix + h2) % P31 * lit(1L << 31) +
        ((h1 % P31B) * CdcMix2 + h2) % P31B)
    zip_with(partial, slice(th, lit(3), n), (p, h3) =>
      (shiftright(p, 31) * BucketMix + h3) % P31 * lit(1L << 31) +
        (p.bitwiseAND(lit((1L << 31) - 1)) * CdcMix2 + h3) % P31B)
  }

  /** 62-bit identities for EVERY-POSITION k-token spans of a bound
    * token-hash array — [[trigramHashesOf]] generalized to arbitrary
    * width (identical construction and constants; at k = 3 the two
    * produce the same values): the seed packs each window-head's two
    * residues, then k − 1 `zip_with` passes extend both folds one
    * token at a time, so the whole derivation is O(k · tokens) array
    * arithmetic with no quadratic `element_at(transform(...))` trap
    * and no per-window string materialization. Same overflow budget as
    * the trigram fold (every intermediate < 2⁶²), exactly reproducible
    * in DuckDB via `list_reduce` over the window slice.
    *
    * Production form: the native [[graft.functions.SpanFold]] (one
    * fused codegen loop); this HOF formulation is the spec baseline it
    * is property-pinned bit-equal to.
    */
  def spanHashesOfHof(th: Column, k: Int): Column = {
    val n = greatest(size(th) - (k - 1), lit(0))
    val seed = transform(slice(th, lit(1), n), h =>
      (h % P31) * lit(1L << 31) + (h % P31B))
    (2 to k).foldLeft(seed) { (acc, j) =>
      zip_with(acc, slice(th, lit(j), n), (p, h) =>
        (shiftright(p, 31) * BucketMix + h) % P31 * lit(1L << 31) +
          (p.bitwiseAND(lit((1L << 31) - 1)) * CdcMix2 + h) % P31B)
    }
  }

  /** Every-position span identities — the native [[graft.functions.SpanFold]]. */
  def spanHashesOf(th: Column, k: Int): Column = graft.functions.SpanFold(th, k)

  /** Window width for [[spanDedup]] — the standard ~50-character match
    * length of substring-level training-data dedup, in tokens.
    */
  val SpanTokens = 8

  /** Every-position duplicated-span fraction — the EXACT-SUBSTRING
    * dedup signal ("Deduplicating Training Data Makes Language Models
    * Better"-style) that completes the sub-document family: CDC chunks
    * ([[cdcDedup]]) are content-defined and [[TextOps.boilerplateOf]]'s
    * chunks are non-overlapping, so both can miss a copied passage that
    * straddles their boundaries — an every-position [[SpanTokens]]-gram
    * window catches a shared run at ANY alignment. Per document: total
    * spans, spans whose 62-bit identity occurs ≥ 2 times anywhere in
    * the corpus, and the floor-scaled duplicated ppm — the score a
    * curation pipeline thresholds to route documents to substring-level
    * surgery.
    *
    * Scale shape: identical to the trigram family — one corpus scan
    * (one digest per token, fold-derived span identities, 8-byte
    * shuffle keys), one wordcount-class count on the span hash, and the
    * join back shares the `h` key so the exchange reuses. Span volume
    * is ≈ token volume (k-grams overlap), the same exploded cardinality
    * every shingle query already carries.
    */
  /** One (doc_id, span-identity) row per [[SpanTokens]]-wide window —
    * the instance relation both span queries derive from
    * (explode_outer + attribute-level null filter: the
    * [[shingleSetWithSize]] InferFiltersFromGenerate contract).
    */
  private def spanInstances(docs: DataFrame): DataFrame =
    hashedTokens(docs)
      .select(col("doc_id"), explode_outer(spanHashesOf(col("th"), SpanTokens)).as("h"))
      .filter(col("h").isNotNull)

  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    val inst = spanInstances(Tables.documents(spark, dir))
    val counts = inst.groupBy("h").agg(count(lit(1)).as("c"))
    inst.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        expr("(dup_spans * 1000000) div n_spans").as("dup_ppm"))
      .orderBy("doc_id")
  }

  /** Incremental span dedup against a PERSISTED history index — the
    * daily-crawl completion of [[spanDedup]] (the `minhashIncremental`
    * contract at span granularity): the history split's DISTINCT span
    * identities are written once as a compact single-column BIGINT
    * parquet artifact (8 bytes per distinct span, never text), and the
    * incoming batch hashes only ITSELF and probes the index — per-doc
    * fraction of spans already seen in history, the "how much of this
    * document is copied from the corpus" score. Batch cost tracks the
    * batch plus a hash-keyed shuffle of the index; the index append is
    * the batch's own novel spans.
    */
  def spanIncremental(spark: SparkSession, dir: String): DataFrame = {
    // ONE span-instance derivation for both sides: the per-token digest
    // and span fold run once over the corpus, the compact all-BIGINT
    // (doc_id, h, split) result materializes (localCheckpoint — the
    // connectedGroups discipline), and the index build and the probe
    // each filter it by split (the split is a pure function of doc_id,
    // so it applies to instance rows directly).
    val inst = SampleOps.withSplit(
        spanInstances(Tables.documents(spark, dir)))
      .select("doc_id", "h", "split").localCheckpoint()
    val out = graft.Scratch.dir("spanindex")
    inst.filter(col("split") === "train").select("h").distinct()
      .write.mode("overwrite").parquet(out)
    inst.filter(col("split") =!= "train")
      .join(spark.read.parquet(out).withColumn("seen", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("seen").isNotNull, 1L).otherwise(0L)).as("seen_spans"))
      .select(col("doc_id"), col("n_spans"), col("seen_spans"),
        expr("(seen_spans * 1000000) div n_spans").as("seen_ppm"))
      .orderBy("doc_id")
  }

  /** [[longestSpan]] geometry: the LCP descent probes the six
    * sub-cap power widths 32 … 1, so the longest reportable run is
    * their sum — [[LcpCap]] = 63 tokens (production raises the cap:
    * one more span width and descent round per doubling). The suffix
    * ORDER compares width-64 windows — strictly beyond the cap, so its
    * tie-breaking can never hide a reportable match. [[LcpBlock]] is
    * the run-boundary block-scan size (per-block window + tiny carry
    * frame, the agg_spearman shape).
    */
  val LcpCap = 63
  val LcpBlock = 4096

  /** GLOBAL order- and equality-preserving rank over `keys` without a
    * one-task window: dense_rank inside ORDER-PRESERVING VALUE BUCKETS
    * of the leading key (parallel windows — `bucket` must be a
    * monotone function of the first key alone, so its ties never
    * straddle buckets), PACKED as `bucket · pack + in-bucket rank`.
    * Not globally dense — suffix doubling needs only order and
    * equality, and packing spares a per-level offsets join. `pack`
    * must exceed any bucket's distinct count (positions + 1 here) and
    * `bucket · pack` must stay under 2⁶³.
    */
  private def bucketRank(df: DataFrame, keys: Seq[Column], bucket: Column,
      pack: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("bk", bucket)
      .withColumn("r", col("bk") * pack + dense_rank()
        .over(Window.partitionBy("bk").orderBy(keys: _*)).cast("long"))
  }

  /** LONGEST cross-document duplicated token run per document — the
    * suffix-array signal curation teams act on (route a document to
    * substring surgery when a long verbatim copy exists, vs the
    * fraction-based [[spanDedup]] which cannot tell one 60-token copy
    * from sixty scattered 8-token matches). Exact up to the
    * [[LcpCap]]-token cap, via distributed suffix ordering + binary
    * LCP lifting:
    *
    *  1. ONE tokenize+digest pass emits every power-width span
    *     identity (widths 1 … 32, the tagged-struct single-Generate
    *     shape) — the descent's equality probes, exact by the
    *     family's 62-bit identity convention;
    *  2. the suffix ORDER comes from a Manber-Myers rank chain
    *     QUADRUPLED per level (widths 1 → 4 → 16 → 64, end padding as
    *     rank 0): three joins + one bucketed window per level
    *     ([[bucketRank]] — packed order/equality-preserving ranks,
    *     which is all doubling needs), three materializations instead
    *     of six;
    *  3. each position's best cross-doc partner is its NEAREST
    *     different-doc neighbor on each side of the suffix order (LCP
    *     is monotone in suffix order, so the nearest maximizes it) —
    *     run boundaries from a per-block lag window plus a tiny
    *     per-block carry frame, never a global-order window;
    *  4. per (position, partner) pair, binary LCP descent over the
    *     span widths 32 … 1: add w when both sides' width-w span
    *     identities at the current offset exist and agree — windows
    *     only exist fully in-range, so a shared run that ends at a
    *     document boundary stops exactly there (no pad, no cap
    *     fix-up). All six rounds chain as computed-key equi-joins in
    *     ONE plan ending in the per-doc aggregate.
    *
    * Same-doc repeats deliberately do NOT count (cross-doc means a
    * different document; within-doc repetition is
    * `text_repetition_ngram`'s signal). Scale: O(positions) rows per
    * step, every shuffle on 8-byte keys, log-many rounds, driver sees
    * one bounded count; the one tiny one-task window runs over the
    * #blocks carry frame. The oracle replays the identical
    * construction as MATERIALIZED CTEs (dense_rank windows, the same
    * shared duckSpanList identities, same pad and tie rules), so the
    * whole pipeline is value-gated end to end.
    */
  /** Memoized per-(JVM, sfDir) PERSISTED per-position run table —
    * `(doc_id, pos, run)`, the suffix pipeline's full output.
    * `dedup_longest_span` is the designated measured rebuild;
    * `dedup_span_strip` probes it, so the expensive suffix ordering
    * runs once per session (the neardup_index pattern).
    */
  private val lcpRunsArtifact = new graft.SessionArtifact("lcp_runs")

  private def lcpRunsTable(spark: SparkSession, dir: String,
      rebuild: Boolean): String = {
    // ~9 eager materializations of a compact all-integer frame: the
    // pipeline is latency-bound at any fixture scale, so it runs in a
    // cloned session (the StreamDrill.session move — private SQLConf,
    // no race with Verify's concurrent runner) with few shuffle
    // partitions, AQE off (per-exchange query-stage jobs tripled the
    // job count in an A/B), and whole-stage codegen off (every round
    // is a distinct plan whose janino compile exceeds its interpreted
    // cost). At corpus scale all three toggles flip back.
    def build(path: String): Unit = {
      val s = spark.newSession()
      // 8, not 4: the r21 sweep (3× runs at 4/8/12/16 partitions,
      // codegen off) measured medians 6.6/5.9/5.7/6.1 s — the
      // latency-bound materializations want a few more parallel
      // tasks than the original A/B picked, and 8 sits on the flat
      // part of the curve without tripling the per-round task count.
      s.conf.set("spark.sql.shuffle.partitions", "8")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      val runs = lcpRunsOf(Tables.documents(s, dir))
      // The DESCENT is one plan compiled once and it is pure
      // joins/union/aggregate over checkpointed inputs (every window
      // lives behind a checkpoint above) — the one statement in this
      // pipeline where a single janino compile amortizes over 6 rounds
      // of probe evaluation. The per-round rank plans above stay
      // interpreted (each is a distinct plan; compile > eval there).
      s.conf.set("spark.sql.codegen.wholeStage", "true")
      s.sparkContext.setJobDescription("lcp: descent+write")
      try runs.write.mode("overwrite").parquet(path)
      finally {
        s.sparkContext.setJobDescription(null)
        s.conf.set("spark.sql.codegen.wholeStage", "false")
      }
    }
    if (rebuild) lcpRunsArtifact.rebuild(dir)(build)
    else lcpRunsArtifact.ensure(dir)(build)
  }

  /** Per-doc aggregate of a per-position run frame — shared by the
    * registered query (over the persisted artifact, so the gate also
    * proves the parquet round-trip) and the spec's direct form.
    */
  private def longestSpanAgg(runs: DataFrame): DataFrame =
    runs
      .select(col("doc_id"), col("run"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        max("run").cast("long").as("longest_run"),
        sum(when(col("run") > 0L, 1L).otherwise(0L)).as("dup_positions"))
      .orderBy("doc_id")

  def longestSpan(spark: SparkSession, dir: String): DataFrame =
    longestSpanAgg(
      spark.read.parquet(lcpRunsTable(spark, dir, rebuild = true)))

  /** The per-doc aggregate over an arbitrary `(doc_id, text)` frame
    * (exposed for the spec, which plants shared runs straddling power
    * boundaries and end-aligned shared suffixes).
    */
  private[queries] def longestSpanOf(docs: DataFrame): DataFrame =
    longestSpanAgg(lcpRunsOf(docs))

  /** [[spanStrip]] removes duplicated runs of at least this many
    * tokens — mirrored in the oracle; the standard ~50-character
    * substring-surgery threshold, same as [[SpanTokens]].
    */
  val StripRunK = 8

  /** SUBSTRING SURGERY — acting on the [[longestSpan]] signal instead
    * of only reporting it: every token covered by some cross-document
    * duplicated run of ≥ [[StripRunK]] tokens is REMOVED and the
    * surviving tokens rejoin in order (canonical single-space form,
    * the text_boilerplate_strip convention) — the "deduplicating
    * training data" transform at exact substring granularity, where
    * chunk-level stripping misses copies straddling chunk boundaries.
    * Coverage is one per-doc running max: token t is covered iff some
    * earlier-or-equal position p has run(p) ≥ K and p + run(p) > t —
    * interval union without an interval join. The cleaned text is
    * value-gated BYTE-FOR-BYTE (the oracle replays the whole suffix
    * pipeline from raw text plus the same coverage window), and the
    * per-position runs come from the PERSISTED [[lcpRunsArtifact]] —
    * probe cost is one artifact scan + one per-doc window, while the
    * suffix ordering itself stays `dedup_longest_span`'s measured
    * build.
    */
  def spanStrip(spark: SparkSession, dir: String): DataFrame =
    stripWithRuns(Tables.documents(spark, dir),
      spark.read.parquet(lcpRunsTable(spark, dir, rebuild = false)))

  /** The surgery over an arbitrary `(doc_id, text)` frame, deriving
    * runs directly (exposed for the spec's hand corpus).
    */
  private[queries] def spanStripOf(docs: DataFrame): DataFrame =
    stripWithRuns(docs, lcpRunsOf(docs))

  private def stripWithRuns(docs: DataFrame, runs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokenized(docs)
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("i", "tok")))
      .select(col("doc_id"), (col("i") + 1).as("pos"), col("tok"))
    val covered = toks.join(runs, Seq("doc_id", "pos"))
      .withColumn("cov", max(when(col("run") >= StripRunK,
          col("pos") + col("run"))).over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("keep", col("cov").isNull || col("cov") <= col("pos"))
    covered.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(transform(filter(
            sort_array(collect_list(struct(col("pos"), col("keep"), col("tok")))),
            x => x.getField("keep")),
          x => x.getField("tok")), " ").as("cleaned"))
      .orderBy("doc_id")
  }

  /** The suffix pipeline itself: per-position longest cross-doc run,
    * `(doc_id, pos, run)`.
    */
  private def lcpRunsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Guide §1.5 job labels: the pipeline is ~9 eager materializations
    // and unlabeled job rows are unattributable in any profile/UI.
    val sc = docs.sparkSession.sparkContext
    def ph[T](label: String)(f: => T): T = {
      sc.setJobDescription(s"lcp: $label")
      try f finally sc.setJobDescription(null)
    }
    val spanWidths = (0 until 6).map(1 << _) // 1, 2, 4, 8, 16, 32
    // 1. Every power-width span identity out of one digest pass.
    val sIds = ph("span-ids") { hashedTokens(docs)
      .select(col("doc_id"), explode(concat(spanWidths.map { w =>
        transform(spanHashesOf(col("th"), w),
          (x, i) => struct(lit(w).as("w"), (i + 1).as("pos"), x.as("id")))
      }: _*)).as("g"))
      .select(col("doc_id"), col("g.w").as("w"), col("g.pos").as("pos"),
        col("g.id").as("id"))
      .localCheckpoint()
    }
    // Per-width probe frames, split ONCE: the descent consumes each
    // width twice (x-side and y-side), and probing the 6-width union
    // with a filter would scan all 6n rows per probe — 12 full scans.
    // Splitting pays 6 scans at split time and each probe then reads
    // only its own width's rows (§2.3 project/filter before the
    // exchange).
    val byW = spanWidths.map(w => w -> ph(s"split-w$w") {
      sIds.filter(col("w") === w).select("doc_id", "pos", "id")
        .localCheckpoint()
    }).toMap
    val base = byW(1)
    // One bounded scalar on the driver: sizes the rank packing.
    val pack = ph("size-pack")(math.max(base.count(), 1L) + 1L)
    // 2. Quadrupled rank chain for the suffix order. Level 0 buckets
    // the uniform 62-bit identity by its top 8 bits; packed ranks
    // embed their bucket (r div pack recovers it), so later levels
    // re-bucket by the same stable assignment — one exchange each.
    val r1 = ph("rank-w1") {
      bucketRank(base, Seq(col("id")), shiftright(col("id"), 54), pack)
        .select("doc_id", "pos", "r").localCheckpoint()
    }
    def quad(prev: DataFrame, o: Int): DataFrame = {
      // Positions are DENSE 1..n per document (width-1 spans), and every
      // level keeps all of them — so the rank at pos + j·o is exactly
      // lead(r, j·o) over the per-doc position order: one window (one
      // doc-keyed exchange, skew-bounded by the longest document)
      // replaces the previous THREE self-joins per level (guide §2.4 —
      // each join re-shuffled the whole rank frame on (doc_id, pos)).
      // lead() past the end is null → 0, byte-identical to the old
      // left-join + coalesce end padding.
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val keyed = prev.select(col("doc_id"), col("pos"), col("r").as("k0"),
        coalesce(lead("r", o).over(w), lit(0L)).as("k1"),
        coalesce(lead("r", 2 * o).over(w), lit(0L)).as("k2"),
        coalesce(lead("r", 3 * o).over(w), lit(0L)).as("k3"))
      ph(s"rank-quad-x$o") {
        bucketRank(keyed, Seq(col("k0"), col("k1"), col("k2"), col("k3")),
            expr(s"k0 div $pack"), pack)
          .select("doc_id", "pos", "r").localCheckpoint()
      }
    }
    val r64 = quad(quad(quad(r1, 1), 4), 16)
    // Globally DENSE row numbers over (r, doc_id, pos) — rn - 1 must
    // address the order neighbor, so this one step pays the tiny
    // per-bucket-counts offset join.
    val withRowNum = r64.withColumn("bk", expr(s"r div $pack"))
      .withColumn("wrn", row_number()
        .over(Window.partitionBy("bk").orderBy("r", "doc_id", "pos"))
        .cast("long"))
    val rnOffs = withRowNum.groupBy("bk").agg(count(lit(1)).as("cnt"))
      .select(col("bk"), coalesce(sum("cnt").over(Window.orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    val ord = ph("global-rownum") {
      withRowNum.join(broadcast(rnOffs), "bk")
        .select(col("doc_id"), col("pos"), (col("off") + col("wrn")).as("rn"))
        .localCheckpoint()
    }
    // 3. Run-head detection in rn-blocks: lag within the block, block
    // boundaries patched from the tiny per-block last-doc frame —
    // never a global-order window, never an O(n) self-join. Both scans
    // are RUNNING frames (Spark evaluates an (x, unboundedFollowing)
    // frame by rescanning the partition tail per row — O(block²);
    // min-over-following is the same running scan on DESCENDING rn).
    val blk = expr(s"(rn - 1) div $LcpBlock")
    val blkLast = ord.groupBy(blk.as("blk"))
      .agg(max_by(col("doc_id"), col("rn")).as("last_doc"))
      .select((col("blk") + 1).as("blk"), col("last_doc"))
    val marked = ph("mark-heads") { ord.withColumn("blk", blk)
      .join(broadcast(blkLast), Seq("blk"), "left")
      .withColumn("prev_doc", coalesce(
        lag("doc_id", 1).over(Window.partitionBy("blk").orderBy("rn")),
        col("last_doc")))
      .withColumn("head_mark",
        when(col("prev_doc").isNull || col("prev_doc") =!= col("doc_id"),
          col("rn")))
      .select("doc_id", "pos", "rn", "blk", "head_mark")
      .localCheckpoint()
    }
    val inBlk = marked
      .withColumn("in_head", max("head_mark").over(
        Window.partitionBy("blk").orderBy("rn")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("in_next", min("head_mark").over(
        Window.partitionBy("blk").orderBy(col("rn").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    // Tiny carry frame: one row per block; the cross-block cumulative
    // head/next run on it alone (the finish-on-the-tiny-frame shape).
    val carry = marked.groupBy("blk").agg(max("head_mark").as("bh"))
      .select(col("blk"),
        max("bh").over(Window.orderBy("blk")
          .rowsBetween(Window.unboundedPreceding, -1)).as("carry_head"),
        min("bh").over(Window.orderBy(col("blk").desc)
          .rowsBetween(Window.unboundedPreceding, -1)).as("carry_next"))
    // Materialized: pairs0 below consumes hd TWICE (head-side and
    // next-side projections of the same frame) — without the checkpoint
    // the in-block window sorts and the carry join execute twice inside
    // the one descent plan (§2.4 duplicated subtree).
    val hd = ph("run-heads") { inBlk.join(broadcast(carry), Seq("blk"))
      .select(col("doc_id"), col("pos"), col("rn"),
        coalesce(col("in_head"), col("carry_head")).as("head_rn"),
        coalesce(col("in_next"), col("carry_next")).as("next_rn"))
      .localCheckpoint()
    }
    // 4. LCP descent per (position, nearest-diff-doc partner) pair —
    // all six rounds plus the final aggregate in ONE plan (computed-
    // key equi-joins; nothing here needs a barrier).
    val partner = ord.select(col("rn").as("yrn"), col("doc_id").as("ydoc"),
      col("pos").as("ypos"))
    val pairs0 = hd
      .select(col("doc_id").as("xdoc"), col("pos").as("xpos"),
        (col("head_rn") - 1).as("yrn"))
      .filter(col("yrn") >= 1L)
      .unionByName(hd.select(col("doc_id").as("xdoc"), col("pos").as("xpos"),
        col("next_rn").as("yrn")).filter(col("yrn").isNotNull))
      .join(partner, "yrn")
      .select(col("xdoc"), col("xpos"), col("ydoc"), col("ypos"),
        lit(0L).as("l"))
    val descended = spanWidths.reverse.foldLeft(pairs0) { (p, w) =>
      val a = byW(w).select(col("doc_id").as("adoc"),
        col("pos").as("ap"), col("id").as("ia"))
      val b = byW(w).select(col("doc_id").as("bdoc"),
        col("pos").as("bp"), col("id").as("ib"))
      p.join(a, p("xdoc") === a("adoc") &&
          a("ap") === p("xpos") + p("l"), "left")
        .join(b, p("ydoc") === b("bdoc") &&
          b("bp") === p("ypos") + p("l"), "left")
        .select(col("xdoc"), col("xpos"), col("ydoc"), col("ypos"),
          when(col("ia").isNotNull && col("ia") === col("ib"),
            p("l") + w).otherwise(p("l")).as("l"))
    }
    val best = descended
      .groupBy(col("xdoc").as("doc_id"), col("xpos").as("pos"))
      .agg(max("l").as("l"))
    base.select("doc_id", "pos")
      .join(best, Seq("doc_id", "pos"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("l"), lit(0L)).as("run"))
  }

  /** Within-document repetition signals — the Gopher-class quality
    * gate that complements the CROSS-corpus span family: machine-
    * generated and boilerplate-stuffed documents repeat themselves, so
    * a curation pipeline thresholds (a) the share of token instances
    * belonging to the document's single most frequent token and (b)
    * the share of 2-gram / 3-gram instances whose n-gram occurs ≥ 2
    * times IN THE SAME DOCUMENT. Registered under the text-analysis
    * family; it lives here because every identity rides the span
    * machinery ([[portable64]] token hashes, [[spanHashesOf]] windows —
    * SpanFoldSpec pins widths 2 and 3 against the HOF reference).
    *
    * Scale shape: wordcount-class — ONE corpus scan (all three widths'
    * identities explode from the same bound token-hash array in a
    * single Generate), one (doc_id, width, identity)-keyed hash count
    * (map-side combinable, tiny shuffle keys), one doc-keyed conditional
    * aggregation. Nothing sorts a whole document on one task and
    * nothing is quadratic in document length.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    // ONE tokenize+hash scan for all three widths: the per-width
    // identity arrays derive from the same bound `th` and explode as
    // tagged (k, h) instances in a single Generate — three separate
    // gramStats pipelines would re-run the per-token md5 scan 3×.
    def tag(k: Int, ids: Column): Column =
      transform(ids, h => struct(lit(k).as("k"), h.as("h")))
    val inst = hashedTokens(Tables.documents(spark, dir))
      .select(col("doc_id"), explode_outer(concat(
        tag(1, col("th")),
        tag(2, spanHashesOf(col("th"), 2)),
        tag(3, spanHashesOf(col("th"), 3)))).as("g"))
      .filter(col("g").isNotNull)
      .select(col("doc_id"), col("g.k").as("k"), col("g.h").as("h"))
    def forK(k: Int, v: Column): Column = sum(when(col("k") === k, v))
    def ppm(num: String, den: String): Column =
      when(coalesce(col(den), lit(0L)) > 0L,
        expr(s"($num * 1000000) div $den")).otherwise(0L)
    inst.groupBy("doc_id", "k", "h").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(forK(1, col("c")).as("n1"),
        max(when(col("k") === 1, col("c"))).as("top1"),
        forK(2, col("c")).as("n2"),
        forK(2, when(col("c") >= 2L, col("c")).otherwise(0L)).as("dup2"),
        forK(3, col("c")).as("n3"),
        forK(3, when(col("c") >= 2L, col("c")).otherwise(0L)).as("dup3"))
      .select(col("doc_id"), col("n1").as("n_tokens"),
        expr("(top1 * 1000000) div n1").as("top_token_ppm"),
        ppm("dup2", "n2").as("dup_2gram_ppm"),
        ppm("dup3", "n3").as("dup_3gram_ppm"))
      .orderBy("doc_id")
  }

  /** Portable family — bit-reproducible in DuckDB SQL, so the
    * registered sketch queries carry exact value oracles. One md5 per
    * TOKEN ([[portable64]]) feeds the fold-derived trigram identities
    * ([[trigramHashesOf]]); the seeded members are then pure integer
    * arithmetic (`(a_j*x + b_j) mod p`, the textbook universal
    * family), NOT one md5 per member — so a document's whole signature
    * costs one digest per token, full stop.
    */
  val PortableFamily: HashFamily = HashFamily(
    tokenHash = portable64,
    shingleHashes = trigramHashesOf,
    base = c => c % lit(P31),
    member = (j, b) => (b * lit(memberA(j)) + lit(memberB(j))) % lit(P31),
    bucket = cols => cols.reduce((acc, c) => (acc * lit(BucketMix) + c) % lit(P31)))

  /** xxhash64-derived family — the production scale path (~an order of
    * magnitude cheaper per byte than md5, same plan shape, no DuckDB
    * twin). Trigram identity is the pairwise xxhash64 chain over the
    * three token hashes (well-mixed 64-bit at every step, no modulus
    * needed since nothing downstream assumes non-negative). Swapping
    * families is this one argument; LSH recall of both is pinned by
    * DedupOpsSpec.
    */
  val FastFamily: HashFamily = HashFamily(
    tokenHash = xxhash64(_),
    shingleHashes = th => {
      val n = greatest(size(th) - 2, lit(0))
      zip_with(zip_with(slice(th, lit(1), n), slice(th, lit(2), n), (a, b) => xxhash64(a, b)),
        slice(th, lit(3), n), (p, c) => xxhash64(p, c))
    },
    base = identity,
    member = (j, b) => xxhash64(lit(j), b),
    bucket = cols => xxhash64(cols: _*))

  /** MinHash signature: `nHashes` per-document minima of a seeded hash
    * family over the shingle set.
    */
  def minhashSignatures(docs: DataFrame, nHashes: Int,
      fam: HashFamily = PortableFamily): DataFrame = {
    // No distinct: min() is idempotent over duplicate shingles, so the
    // dedup shuffle would only add a stage. Token hashes are bound to
    // an attribute first (hashedTokens contract). explode_OUTER + an
    // attribute-level null filter, not plain explode: the generator
    // child now contains the per-token digest transform, and
    // InferFiltersFromGenerate (non-outer generates only) would push
    // its inferred size() filter below the binding projection and
    // re-evaluate the whole digest tree per row (see
    // shingleSetWithSize's doc for the measured cost of that trap).
    val sh = tokenized(docs)
      .select(col("doc_id"), transform(col("toks"), fam.tokenHash).as("th"))
      .select(col("doc_id"), explode_outer(fam.shingleHashes(col("th"))).as("t"))
      .filter(col("t").isNotNull)
      .select(col("doc_id"), fam.base(col("t")).as("h0"))
    val mins = (0 until nHashes).map(j => min(fam.member(j, col("h0"))).as(s"h$j"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash signatures (portable family) derived from a persisted
    * `(sh, doc_id, ...)` shingle frame instead of raw text: the index
    * stores exactly the [[trigramHashesOf]] identities the portable
    * family's `base` reduces, and `min` is idempotent over the
    * multiset-vs-set distinction, so this is value-identical to
    * [[minhashSignatures]] on [[PortableFamily]] — with the md5 work
    * already paid by the index build.
    */
  private def minhashSignaturesOfShingles(shingles: DataFrame, nHashes: Int): DataFrame = {
    val sh = shingles.select(col("doc_id"), PortableFamily.base(col("sh")).as("h0"))
    val mins = (0 until nHashes).map(j => min(PortableFamily.member(j, col("h0"))).as(s"h$j"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Memoized per-(JVM, sfDir) location of the persisted 16-member
    * MinHash signature table (doc_id, h0..h15) — the second layer of
    * the session's index stack: derived from [[shingleIndex]] (one
    * group-by, 16 modular-arithmetic minima), written once, and probed
    * by every portable-family MinHash consumer. At 100 TB this is the
    * stored signature table the incremental queries
    * (`neardup_minhash_incr`) already maintain per batch; longs
    * round-trip parquet exactly, so every derivation stays
    * value-identical to the from-text form the oracles recompute.
    */
  private val sigArtifact = new graft.SessionArtifact("sigindex")

  private[queries] def sigIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(sigArtifact.ensure(dir) { p =>
      minhashSignaturesOfShingles(shingleIndex(spark, dir), 16)
        .write.mode("overwrite").parquet(p)
    })

  /** LSH banding over an explicit signature frame: `nBands` bands of
    * `rowsPerBand` signature rows, each band hashed to one bucket value.
    * Documents sharing any (band, bucket) are near-dup candidates.
    */
  private def bandsOfSig(sig: DataFrame, nBands: Int, rowsPerBand: Int,
      fam: HashFamily): DataFrame = {
    val bandCols = (0 until nBands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b.toLong).as("band"), fam.bucket(rows).as("bucket"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH banding from raw documents (test/streaming core). */
  def minhashBands(docs: DataFrame, nBands: Int, rowsPerBand: Int,
      fam: HashFamily = PortableFamily): DataFrame =
    bandsOfSig(minhashSignatures(docs, nBands * rowsPerBand, fam),
      nBands, rowsPerBand, fam)

  /** Candidate near-dup pairs from LSH banding (used by tests and by a
    * downstream verify-with-exact-Jaccard stage at scale). Pairs come
    * from grouping by (band, bucket) and expanding each bucket's sorted
    * doc list in-array — one pass over the signatures, where the
    * equivalent self-join planned the whole signature subtree twice.
    */
  def minhashCandidates(docs: DataFrame, nBands: Int = 4, rowsPerBand: Int = 4,
      fam: HashFamily = PortableFamily): DataFrame =
    candidatesOfBands(minhashBands(docs, nBands, rowsPerBand, fam))

  /** Distinct candidate pairs from an explicit band-bucket frame. */
  private def candidatesOfBands(bands: DataFrame): DataFrame =
    bands
      .groupBy("band", "bucket")
      .agg(sort_array(collect_list("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ds)-2),
          |  i -> transform(slice(ds, i+2, size(ds)-i-1),
          |       y -> named_struct('a', ds[i], 'b', y))))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()

  /** Registered MinHash query: the LSH bucket structure itself (bucket
    * occupancy per band), on the portable family → exact value oracle;
    * the pair-finding path is additionally unit-tested with planted
    * near-duplicates in both families. Signatures derive from the
    * persisted [[shingleIndex]] (value-identical — see
    * [[minhashSignaturesOfShingles]]); the oracle recomputes from raw
    * text, gating the equivalence.
    */
  def minhashBuckets(spark: SparkSession, dir: String): DataFrame =
    bandsOfSig(sigIndex(spark, dir), nBands = 4, rowsPerBand = 4, PortableFamily)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("bucket_size"))
      .orderBy("band", "bucket")

  /** [[minhashBuckets]] on [[FastFamily]] — the production (xxhash64)
    * hash path. It exists so the bench reports the scale path's
    * throughput next to the portable path; LSH recall of both families
    * is pinned by DedupOpsSpec's planted near-dups. Value-gated like
    * everything else: [[XxhashOracle]] unrolls xxHash64 into DuckDB
    * hugeint arithmetic, so the twin recomputes the exact band-bucket
    * counts from raw text.
    */
  def minhashBucketsFast(spark: SparkSession, dir: String): DataFrame =
    minhashBands(Tables.documents(spark, dir), nBands = 4, rowsPerBand = 4,
        fam = FastFamily)
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("bucket_size"))
      .orderBy("band", "bucket")

  /** MinHash Jaccard ESTIMATION, calibrated: for every LSH candidate
    * pair, the Broder estimator — the fraction of equal signature
    * components — as floor-scaled ppm. This is the number a production
    * pipeline thresholds on INSTEAD of exact shingle-set Jaccard when
    * the corpus is too big to re-shingle candidates (signatures are 16
    * longs; shingle sets are the whole document). Deterministic given
    * the portable family, so the estimate itself carries an exact
    * oracle; its statistical quality against exact Jaccard is pinned by
    * the planted near-dups in DedupOpsSpec.
    */
  def minhashEstimate(spark: SparkSession, dir: String): DataFrame = {
    // The persisted signature table is referenced three times (candidate
    // banding + both join sides) — each reference is a re-read of the
    // tiny (16 longs/doc) parquet artifact, no re-aggregation.
    val sig = sigIndex(spark, dir)
    val matches = (0 until 16)
      .map(j => when(col(s"sa.h$j") === col(s"sb.h$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    candidatesOfBands(bandsOfSig(sig, 4, 4, PortableFamily))
      .join(sig.as("sa"), col("a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        floor(matches * lit(1000000.0) / lit(16)).cast("long").as("est_ppm"))
      .orderBy("a", "b")
  }

  /** LSH recall self-audit — the dedup twin of `simsearch_recall`: of
    * the exact top-20 Jaccard near-dup pairs, how many does the banded
    * MinHash candidate generation actually surface? This is the number
    * that decides the band/row configuration (the S-curve in practice,
    * not in theory): a recall shortfall here means real duplicates
    * sail through the sketch path. Both sides are deterministic
    * registered queries, so the audit value-oracles — and its oracle
    * embeds the two queries' own oracle strings, so audit and gates
    * cannot drift.
    *
    * Both members probe the persisted [[shingleIndex]], so the audit
    * re-reads and re-hashes the corpus ZERO times: the truth pass and
    * the candidate pass share one stored artifact (built at most once
    * per session), exactly how the recurring production audit would
    * run against the maintained shingle table.
    */
  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    // The truth pairs feed BOTH the denominator count and the semi-join
    // numerator; materialize the 20-row result once instead of running
    // the whole Jaccard pipeline per reference. PROBE the ensured
    // pair-counts index — calling jaccard() here would trigger its
    // unconditional measured REBUILD and double-pay the expansion.
    val exact = jaccardTopOf(scoreJaccard(pairCountsIndex(spark, dir)))
      .select("a", "b").localCheckpoint()
    // The candidate side is the REGISTERED estimator query's pair set —
    // the same query whose oracle the composed audit oracle embeds — so
    // the Spark side and the oracle composition consume one definition
    // by construction (not two relations that happen to coincide).
    val cand = minhashEstimate(spark, dir).select("a", "b")
    val truthN = exact.agg(count(lit(1)).as("truth_pairs"))
    val rec = exact.join(cand, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("recalled"))
    truthN.crossJoin(broadcast(rec))
      .select(col("truth_pairs"), col("recalled"),
        expr("(recalled * 1000000) div greatest(truth_pairs, 1L)").as("recall_ppm"))
  }

  /** Incremental LSH index maintenance — the daily-crawl shape: today's
    * batch probes a PERSISTED signature index instead of re-hashing the
    * historical corpus. The history split's band buckets are written
    * once as a compact parquet artifact (16 bands × 8 bytes per doc —
    * signatures, never text), and each incoming batch computes only its
    * own signatures and joins on (band, bucket): cost per batch scales
    * with the batch plus a bucket-keyed shuffle of the index, not with
    * history size, and the index append is the batch's own bucket rows.
    * Output: candidate (new_doc, old_doc) pairs a verify stage (the
    * [[verifiedPairs]] machinery) would confirm.
    */
  def minhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = SampleOps.withSplit(Tables.documents(spark, dir))
    val out = graft.Scratch.dir("lshindex")
    minhashBands(d.filter(col("split") === "train"), nBands = 4, rowsPerBand = 4)
      .write.mode("overwrite").parquet(out)
    probeIndex(spark.read.parquet(out),
      minhashBands(d.filter(col("split") =!= "train"), nBands = 4, rowsPerBand = 4))
  }

  /** Candidate pairs from probing a persisted band-bucket index with a
    * batch's band buckets (both shaped (doc_id, band, bucket); exposed
    * for tests, which plant a near-dup of an indexed doc).
    */
  def probeIndex(index: DataFrame, batch: DataFrame): DataFrame =
    batch.select(col("doc_id").as("new_doc"), col("band"), col("bucket"))
      .join(index.select(col("doc_id").as("old_doc"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("new_doc", "old_doc").distinct()
      .orderBy("new_doc", "old_doc")

  /** SimHash: 60-bit signature from per-bit majority votes of token
    * hashes (portable family → exact value oracle; production swaps in
    * xxhash64/64-bit, same shape). Near-dups differ in few bits
    * (Hamming distance ≤ k).
    */
  val SimhashBits = 60

  def simhash(docs: DataFrame): DataFrame = {
    // Hash each DISTINCT (doc, token) once and weight the bit votes by
    // the token's occurrence count — numerically identical to hashing
    // every occurrence, but real text repeats tokens heavily, so the
    // digest count drops by the repeat factor. The extra groupBy is a
    // map-side-combinable shuffle of (doc_id, token) pairs, and the md5
    // work moves AFTER the combine — it runs once per distinct pair, on
    // whichever executor owns the group.
    val tok = cpuSpread(docs)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .select(col("doc_id"), portable64(col("t")).as("h"), col("c"))
    val votes = (0 until SimhashBits).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1) === 1, col("c")).otherwise(-col("c"))).as(s"b$bit")
    }
    val sig = (0 until SimhashBits).map { bit =>
      when(col(s"b$bit") > 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    tok.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  // ---- Persisted SimHash signature index -------------------------------

  /** Memoized per-(JVM, sfDir) location of the persisted SimHash
    * signature table — the [[shingleIndexPaths]] discipline applied to
    * the Hamming-signature family: the registered build query swaps in
    * a FRESH directory and updates the pointer, so concurrent readers
    * (Verify dumps queries through a thread pool) keep reading a
    * complete artifact.
    */
  private val simhashArtifact = new graft.SessionArtifact("simhashindex")

  /** Write the `(doc_id, simhash)` artifact into `p`: the per-token
    * digest + 60-vote aggregate — the expensive part of EVERY SimHash
    * query — runs once, into a 16-bytes-per-doc parquet table. Longs
    * round-trip parquet exactly, so every derivation from the artifact
    * is value-identical to the direct-from-text form, which is what
    * the shared oracles gate (the DuckDB twins all recompute
    * signatures from raw text).
    */
  private def buildSimhashIndex(spark: SparkSession, dir: String)(p: String): Unit =
    simhash(Tables.documents(spark, dir)).write.mode("overwrite").parquet(p)

  /** The persisted SimHash signature table for `dir`, built at most once
    * per JVM. Production posture at 100 TB: signatures are a STORED
    * artifact a daily batch appends to (the [[simhashIncremental]]
    * contract); consumers probe it instead of re-hashing the corpus
    * once per query. `neardup_simhash` rebuilds it unconditionally so
    * the build cost stays a measured, first-class bench entry.
    */
  private[queries] def simhashSignatures(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(simhashArtifact.ensure(dir)(buildSimhashIndex(spark, dir)))

  /** Registered SimHash query (exact oracle: portable hash family) —
    * doubles as the signature index's measured build: rebuild the
    * artifact unconditionally, publish it to the consumers' pointer,
    * and return the read-back rows, so the exact value oracle gates the
    * PERSISTED artifact's content (a corrupted write could not report
    * clean signatures) and `neardup_simhash_pairs`/`_incr` probe it
    * instead of recomputing the 60-vote aggregate from raw text.
    */
  def simhashQuery(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(simhashArtifact.rebuild(dir)(buildSimhashIndex(spark, dir)))
      .orderBy("doc_id")

  /** SimHash banding: 4 chunks of 15 bits. By pigeonhole, any pair
    * within Hamming distance 3 of the 60-bit signature shares at least
    * one exact chunk — the banded-LSH recall guarantee; the Hamming cut
    * below then filters candidates exactly.
    */
  val SimhashBands = 4
  val SimhashChunkBits: Int = SimhashBits / SimhashBands
  val SimhashMaxHamming = 8

  /** Bucket-size cap for the SimHash banded expansion — the
    * [[JaccardMaxDf]] move at the signature level, shared in spirit
    * with [[MultimodalOps.PhashMaxBucket]]: a (band, chunk) bucket with
    * more members is dropped before pair generation, so the worst
    * bucket contributes at most cap²/2 pairs regardless of corpus size
    * or signature skew. Mirrored in the DuckDB oracle (recall/cost
    * knob, not a correctness risk).
    */
  val SimhashMaxBucket = 100

  /** Candidate near-dup pairs from SimHash banding, verified by exact
    * Hamming distance — the operator that makes the signature usable,
    * mirroring the MinHash path's band→bucket→pair shape: explode each
    * signature to its 4 (band, chunk) keys, keep buckets with
    * 2..[[SimhashMaxBucket]] members, self-join members on the bucket
    * key (`a < b`) so candidates distribute across tasks, then one
    * codegen'd `bit_count(xor)` per candidate. Never all-pairs: only
    * chunk-sharing docs meet, the cap bounds every bucket's pair count,
    * and no per-bucket array is ever materialized — there is no
    * single-row blow-up mode even on an adversarial corpus.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.BandedPairs.pairs(simhashSignatures(spark, dir),
      "doc_id", "simhash", SimhashBands, SimhashChunkBits,
      SimhashMaxBucket, SimhashMaxHamming)

  /** [[simhashPairs]] over an arbitrary documents frame (tests plant
    * exact/near/unrelated docs and assert the recall guarantee;
    * `maxBucket` is overridable only so tests can exercise the cap
    * with small planted corpora).
    */
  def simhashPairsOf(docs: DataFrame, maxBucket: Int = SimhashMaxBucket): DataFrame =
    graft.operators.BandedPairs.pairs(simhash(docs), "doc_id", "simhash",
      SimhashBands, SimhashChunkBits, maxBucket, SimhashMaxHamming)

  /** Incremental SimHash near-dup maintenance — [[minhashIncremental]]'s
    * contract for the Hamming-signature family, completing the
    * incremental matrix (MinHash band buckets, CDC chunks, and now
    * SimHash signatures all probe persisted history): the train split's
    * signatures persist as the index artifact — (doc_id, simhash) rows,
    * 16 bytes per historical doc, never text — and the incoming batch
    * band-hashes only itself, probes the index through the shared
    * [[graft.operators.BandedPairs.probe]] (history-side bucket cap,
    * exact Hamming verify), and would append its own signatures for the
    * next batch exactly as [[graft.streaming.DocStream]] does at the
    * band-bucket and chunk levels. Exact value oracle: the portable
    * hash family reproduces signatures, banding, cap, and cut in SQL.
    */
  def simhashIncremental(spark: SparkSession, dir: String): DataFrame = {
    // The split is a pure function of doc_id, so it applies to the
    // persisted signature rows directly — neither side re-hashes text.
    val sigs = SampleOps.withSplit(simhashSignatures(spark, dir))
    val out = graft.Scratch.dir("simhashhist")
    sigs.filter(col("split") === "train").select("doc_id", "simhash")
      .write.mode("overwrite").parquet(out)
    simhashProbe(spark.read.parquet(out),
      sigs.filter(col("split") =!= "train").select("doc_id", "simhash"))
  }

  /** [[simhashIncremental]]'s probe step over arbitrary history/batch
    * signature frames (exposed for tests, which plant a near-dup of an
    * indexed doc).
    */
  def simhashProbe(history: DataFrame, batch: DataFrame): DataFrame =
    graft.operators.BandedPairs.probe(history, batch, "doc_id", "simhash",
      SimhashBands, SimhashChunkBits, SimhashMaxBucket, SimhashMaxHamming)
      .select(col("a").as("new_doc"), col("b").as("old_doc"), col("hamming"))

  /** The production two-phase near-dup pipeline composed end-to-end:
    * (1) LSH banding proposes candidate pairs (constant-size signatures,
    * hash-bucket join — the only phase that touches the whole corpus);
    * (2) exact Jaccard over the candidates' real shingle sets confirms
    * or rejects each pair (array_intersect on a few thousand pairs, not
    * the corpus); (3) each confirmed near-dup group elects min(doc_id)
    * as its representative (one-hop min — the cheap stand-in for full
    * connected components, which a production run would iterate).
    * Exact value oracle: the portable hash family makes the whole
    * chain — signatures, banding, candidates, verify, election —
    * reproducible in DuckDB SQL.
    */
  /** Phases 1+2 of the near-dup pipeline: LSH candidates, exact-Jaccard
    * verified pairs `(a, b)` with a < b. Shared by the one-hop election
    * ([[neardupPipeline]]) and the connected-components grouping
    * ([[neardupGroups]]).
    */
  def verifiedPairs(spark: SparkSession, dir: String): DataFrame =
    verifiedPairsWithHandle(spark, dir)._1

  /** [[verifiedPairs]] plus the persisted candidate frame, so an eager
    * caller ([[neardupGroups]]) can unpersist it once its own output no
    * longer depends on it. Lazy callers ([[neardupPipeline]]) must keep
    * the persist alive until the query executes; the bench/verify
    * harness releases it between queries.
    */
  private[queries] def verifiedPairsWithHandle(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Both phases probe the persisted shingle index: candidates from
    // index-derived signatures (value-identical to the raw-text path —
    // see minhashSignaturesOfShingles), verify sets by re-grouping the
    // index's distinct (doc, sh) rows. The md5-heavy shingle projection
    // runs zero times here.
    val idx = shingleIndex(spark, dir)
    // The candidate pairs are referenced three times below (verify join
    // + both sides of the semi-join filter). Without materialization the
    // planner would inline the signature subtree once per reference
    // (3x the sketch work; exchange reuse under AQE is
    // timing-dependent, not guaranteed). Candidates are the SMALL
    // output of phase 1 — a pair list, not corpus data — so persisting
    // them is the standard two-phase-pipeline shape at any scale (a
    // 100 TB run would checkpoint them to storage between phases).
    val candidates =
      candidatesOfBands(bandsOfSig(sigIndex(spark, dir), 4, 4, PortableFamily))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Re-assemble shingle sets ONLY for docs that appear in some
    // candidate pair: a left-semi filter ahead of the group-by. The
    // index rows are distinct (doc_id, sh), so collect_list rebuilds
    // the distinct set (order is irrelevant to array_intersect/size).
    val candDocs = candidates.select(explode(array(col("a"), col("b"))).as("doc_id"))
    val sets = idx.join(candDocs, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(collect_list("sh").as("shset"))
    val pairs = candidates
      .join(sets.toDF("a2", "sha"), col("a") === col("a2"))
      .join(sets.toDF("b2", "shb"), col("b") === col("b2"))
      .select(col("a"), col("b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(col("sha")).cast("long").as("na"),
        size(col("shb")).cast("long").as("nb"))
      .withColumn("j_ppm",
        floor(col("inter") * lit(1000000.0) / (col("na") + col("nb") - col("inter"))).cast("long"))
      .filter(col("j_ppm") >= 800000L)
      .select(col("a"), col("b"))
    (pairs, candidates)
  }

  def neardupPipeline(spark: SparkSession, dir: String): DataFrame =
    verifiedPairs(spark, dir)
      .select(col("b").as("doc_id"), col("a").as("rep"))
      .groupBy("doc_id").agg(min("rep").as("keep_as"))
      .orderBy("doc_id")

  /** Connected components over the verified near-dup graph by iterative
    * min-label propagation with pointer doubling: each round a vertex
    * takes the least of its own label, its neighbors' labels, and its
    * label's label (`rep(rep(v))` — path halving), so a chain of length
    * n converges in O(log n) distributed rounds rather than O(n). Every
    * round is one join+agg over the (small) edge set; only a scalar
    * convergence count ever reaches the driver. The fixpoint (min
    * reachable label per vertex) is unique, so the result is
    * deterministic regardless of iteration schedule — which is what
    * lets it carry an exact recursive-CTE oracle; DedupProps pins it
    * against a sequential union-find on random graphs.
    */
  def connectedGroups(pairs: DataFrame): DataFrame = {
    // Persist the DIRECTED pair list, not the symmetrized view: sym is a
    // union of two projections of it, so a persist on sym would run the
    // (expensive) verify join once per union branch before caching.
    // Everything after this line touches edges only through the cache.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sym = p.select(col("a").as("src"), col("b").as("dst"))
      .union(p.select(col("b").as("src"), col("a").as("dst")))
    // Every round references the previous labels THREE times, so the
    // logical plan would grow 3^k deep across iterations — analysis and
    // plan rendering blow up long before the data does. localCheckpoint
    // materializes each round's labels and TRUNCATES the lineage, the
    // canonical iterative-algorithm shape on Spark.
    var labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("rep"))
      .localCheckpoint()
    // One propagation step: each vertex takes min(own, neighbors' min,
    // label's label). Output carries ("v", "rep", "old" = input rep).
    def step(cur: DataFrame): DataFrame = {
      val nbrMin = sym.join(cur, col("dst") === col("v"))
        .groupBy(col("src")).agg(min("rep").as("nmin"))
      cur.toDF("v", "old")
        .join(nbrMin, col("v") === col("src"), "left")
        .join(cur.toDF("r", "rr"), col("old") === col("r"), "left")
        .select(col("v"),
          least(col("old"), coalesce(col("nmin"), col("old")),
            coalesce(col("rr"), col("old"))).as("rep"),
          col("old"))
    }
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 30) {
      // TWO steps per materialization (checkpoint cadence 2): the
      // per-iteration driver round-trips — the lazy checkpoint's
      // materializing count() job — halve. Convergence detection stays
      // sound on the SECOND step's delta alone: a full step that
      // changes nothing proves its input is the propagation fixpoint,
      // regardless of what the first step did. BOTH steps checkpoint
      // LAZILY: the outer step references the inner result three times
      // (neighbor join + main branch + the rr self-join), so an
      // un-materialized inner frame would re-plan its 3-join subtree
      // per reference (exchange reuse is timing-dependent, not
      // guaranteed — the verifiedPairs discipline); the lazy inner
      // checkpoint is one shared RDD computed once when the count
      // materializes the chain, so each iteration still costs a single
      // Spark job.
      val mid = step(labels).select("v", "rep").localCheckpoint(eager = false)
      val next = step(mid).localCheckpoint(eager = false)
      changed = next.filter(col("rep") < col("old")).count()
      labels = next.select("v", "rep")
      iter += 1
    }
    // The loop is eager (one count() job per round) and the final labels
    // are localCheckpoint'd — nothing downstream re-reads the edge set,
    // so its cached blocks are released here rather than leaking across
    // the session's later queries.
    p.unpersist(blocking = false)
    labels
  }

  /** Registered connected-components query: every doc in a verified
    * near-dup component → the component's min doc_id.
    */
  /** Memoized per-(JVM, sfDir) component-label table — the persisted
    * `(doc_id, rep)` outcome of the verified-pair connected-components
    * run, in the [[graft.SessionArtifact]] discipline:
    * [[neardupGroups]] is the MEASURED query that rebuilds it
    * unconditionally (the CC iteration stays a first-class bench
    * entry); downstream curation ([[canonicalSelect]]) ensure-probes
    * it, exactly as a daily curation job reads the clustering job's
    * stored output. Both queries' oracles recompute components from
    * raw text, so every green row keeps gating store + probe ≡ direct.
    */
  private val groupLabelArtifact = new graft.SessionArtifact("neardup_labels")

  private def buildGroupLabels(spark: SparkSession, dir: String)(p: String): Unit = {
    val (pairs, candidates) = verifiedPairsWithHandle(spark, dir)
    // connectedGroups materializes eagerly (localCheckpoint per round),
    // so by the time it returns nothing depends on the candidate cache.
    val labels = connectedGroups(pairs)
    candidates.unpersist(blocking = false)
    labels.toDF("doc_id", "rep").write.mode("overwrite").parquet(p)
  }

  def neardupGroups(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(
      groupLabelArtifact.rebuild(dir)(buildGroupLabels(spark, dir)))
      .orderBy("doc_id")

  /** CANONICAL-DOC selection — the curation step that FOLLOWS
    * clustering in a real dedup pipeline: within every verified
    * near-dup component, keep exactly one document (most tokens, ties
    * to the lowest doc_id — "keep the longest version" is the standard
    * near-dup retention policy) and mark the rest dropped. One
    * keep/drop decision row per component member, with the component
    * representative and the chosen canonical alongside, is precisely
    * the sidecar a corpus-curation job joins back onto the corpus.
    *
    * Scale shape: the component labels come from the PERSISTED
    * clustering artifact ([[groupLabelArtifact]] — `neardup_groups` is
    * the measured rebuild; curation probes the stored table, as in
    * production) and are a tiny frame (only docs in verified duplicate
    * pairs) that BROADCASTS onto the documents scan — token counts are
    * computed for component members only, never the corpus — and the
    * canonical election is a window over components, whose size the
    * candidate stoplist already bounds. Exact value oracle: the
    * verified-pairs + recursive-components CTEs composed with the
    * text_quality token-count expression, the same
    * rank-1-elects-canonical window in SQL — so the green row gates
    * stored-labels + probe ≡ direct recomputation.
    */
  /** Ensure-probe of the persisted component-label artifact for OTHER
    * families composing on the clustering outcome (SampleOps' grouped
    * splits) — same discipline as [[canonicalSelect]]: the measured
    * rebuild stays `neardup_groups`, consumers read the stored table.
    */
  private[queries] def groupLabels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(
      groupLabelArtifact.ensure(dir)(buildGroupLabels(spark, dir)))

  def canonicalSelect(spark: SparkSession, dir: String): DataFrame = {
    val labels = groupLabels(spark, dir)
    val tc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("tok_cnt"))
    canonicalOf(labels, tc)
  }

  /** [[canonicalSelect]]'s election over arbitrary `(doc_id, rep)`
    * labels and `(doc_id, tok_cnt)` counts (exposed for tests, which
    * plant a component with a token-count tie).
    */
  private[queries] def canonicalOf(lab: DataFrame, tc: DataFrame): DataFrame = {
    val members = tc.join(broadcast(lab), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("rep").orderBy(desc("tok_cnt"), asc("doc_id"))
    members
      .withColumn("canonical", first("doc_id").over(w))
      .select(col("doc_id"), col("rep"), col("canonical"), col("tok_cnt"),
        when(col("doc_id") === col("canonical"), lit("keep"))
          .otherwise(lit("drop")).as("action"))
      .orderBy("rep", "doc_id")
  }

  /** Prefix length compared by [[editDistance]]. */
  val EditPrefixLen = 80

  /** Maximum edit distance for a pair to count as a fuzzy duplicate. */
  val MaxEdit = 24

  /** Minimum shared shingles for a pair to reach the Levenshtein
    * verify. Like [[JaccardMaxDf]] this is a recall/cost knob mirrored
    * exactly in the oracle: one shared trigram admits ~10× the
    * candidates that two do (1.13M vs 112K at sf0.1), and a pair
    * within [[MaxEdit]] edits on a prefix shares long runs of
    * identical trigrams, so the second shingle is nearly free recall-
    * wise while cutting the verify stage an order of magnitude.
    */
  val EditMinShared = 2

  /** Edit-distance fuzzy near-dup: candidate pairs from the SAME
    * stoplist-bounded shared-shingle expansion every other near-dup
    * query uses (never all-pairs), verified by Levenshtein distance on
    * a fixed [[EditPrefixLen]]-char prefix — the field-level fuzzy
    * match (titles, headers, OCR noise) that token-set similarity
    * can't see: a one-character typo changes three shingles but is
    * edit distance 1. The verify step uses Spark's thresholded
    * `levenshtein(l, r, max)` — the banded DP is O(prefix·max) per
    * pair instead of O(prefix²) and bails early past [[MaxEdit]] —
    * and joins text prefixes (bounded bytes, never full payloads)
    * back to the bounded candidate set only. The threshold form
    * returns the exact distance whenever it is ≤ max, so the plain
    * `levenshtein(...) <= max` oracle keeps an exact value compare.
    */
  def editDistance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pre = docs.select(col("doc_id"),
      substring(col("text"), 1, EditPrefixLen).as("pre"))
    // Candidates probe the persisted pair-counts index; only the
    // (cheap, pushdown-pruned) 80-char prefix projection touches raw
    // text.
    pairCountsIndex(spark, dir)
      .filter(col("inter") >= EditMinShared)
      .select("a", "b")
      .join(pre.select(col("doc_id").as("a"), col("pre").as("pa")), "a")
      .join(pre.select(col("doc_id").as("b"), col("pre").as("pb")), "b")
      .select(col("a"), col("b"),
        levenshtein(col("pa"), col("pb"), MaxEdit).cast("long").as("edit"))
      .filter(col("edit") =!= -1L)
      .orderBy(asc("edit"), asc("a"), asc("b"))
      .limit(20)
  }

  /** Expected CDC chunk length: a token is a chunk boundary when its
    * portable hash ≡ 0 (mod this), so boundaries are content-derived
    * and survive insertions/deletions elsewhere in the document — the
    * property fixed-stride windows ([[TextOps.trainingChunks]]) lack.
    */
  val CdcBoundaryMod = 8L

  /** Second mix and — crucially — second MODULUS for the CDC chunk
    * hash: chunk identity is two modular folds of the per-token hashes
    * (seeded 0; [[BucketMix]] mod [[P31]] and [[CdcMix2]] mod this
    * prime), combined as `f1·2³¹ + f2` into one 62-bit value. The
    * second fold MUST run over a different prime: with one modulus,
    * two equal-length chunks differing at a single token collide in
    * BOTH folds whenever the token hashes are congruent mod that
    * prime (the mixes cancel in the delta — 2⁻³¹ joint probability,
    * not 2⁻⁶²), and a single-token chunk's two folds are outright
    * equal. With coprime moduli, joint collision needs the hash delta
    * ≡ 0 mod P31·P31B ≈ 2⁶² — impossible for 60-bit token hashes
    * unless the hashes are equal, so one-token-apart chunks (the very
    * class CDC dedup exists to distinguish) can only collide through
    * md5 itself. All intermediates stay under 2⁶³ (acc < 2³¹,
    * mix ≈ 10⁶, token hash < 2⁶⁰), so the arithmetic is exact — and
    * identical — in both engines' 64-bit integers.
    */
  private val CdcMix2 = graft.functions.SpanFold.Mix2

  /** The second fold's prime modulus (largest prime below [[P31]]). */
  private val P31B = graft.functions.SpanFold.Mod2

  /** Per-document content-defined chunk hashes: tokens whose portable
    * hash is ≡ 0 mod [[CdcBoundaryMod]] CLOSE a chunk; the tail past
    * the last boundary is the final chunk. Every token lands in exactly
    * one chunk. The whole derivation is ONE fold over the hashed-token
    * array on the scanned row — `aggregate` carries (emitted chunk
    * hashes, both running folds, open-chunk flag) and emits a chunk at
    * each boundary token — so each token is md5-hashed exactly once and
    * touched exactly once, with no boundary-position / span arrays at
    * all. (The round-7 version materialized positions and re-digested
    * every chunk's joined text — 2× the md5 work — and a naive
    * "parallel hash array" refactor is a trap: Catalyst collapses the
    * projections and `element_at(transform(tk, portable64), i)`
    * re-evaluates the whole transform per index, going quadratic.)
    * Chunk identity is the 62-bit double modular fold of the chunk's
    * token hashes ([[BucketMix]] mod [[P31]] and [[CdcMix2]] mod the
    * coprime [[P31B]] — see [[CdcMix2]]'s doc for why one modulus is
    * not enough — combined as
    * `f1·2³¹ + f2`). Zero shuffles, no explode until the caller needs
    * instance rows. Exposed for the reference-implementation spec.
    */
  def cdcChunkHashes(docs: DataFrame): DataFrame = {
    def emit(f1: Column, f2: Column): Column = f1 * lit(1L << 31) + f2
    val zero = struct(
      expr("CAST(array() AS ARRAY<BIGINT>)").as("hs"),
      lit(0L).as("f1"), lit(0L).as("f2"), lit(false).as("open"))
    val hashes = aggregate(
      transform(col("tk"), t => portable64(t)),
      zero,
      (acc, h) => {
        val f1 = pmod(acc.getField("f1") * lit(BucketMix) + h, lit(P31))
        val f2 = pmod(acc.getField("f2") * lit(CdcMix2) + h, lit(P31B))
        when(pmod(h, lit(CdcBoundaryMod)) === 0,
          struct(concat(acc.getField("hs"), array(emit(f1, f2))).as("hs"),
            lit(0L).as("f1"), lit(0L).as("f2"), lit(false).as("open")))
          .otherwise(struct(acc.getField("hs").as("hs"),
            f1.as("f1"), f2.as("f2"), lit(true).as("open")))
      },
      acc => when(acc.getField("open"),
        concat(acc.getField("hs"),
          array(emit(acc.getField("f1"), acc.getField("f2")))))
        .otherwise(acc.getField("hs")))
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), hashes.as("hs"))
  }

  /** Memoized per-(JVM, sfDir) persisted chunk-instance pointer: the
    * content-defined chunk expansion (one md5 per token plus the double
    * modular fold) is the same deterministic (doc_id, h) frame for
    * every consumer, and three registered queries ([[cdcDedup]],
    * [[cdcCross]], [[cdcIncremental]]) derive from it — so it gets the
    * same session-index treatment as the shingle and pair-count tables
    * (see [[pairCountsArtifact]]): built once per (JVM, dir), probed by
    * every consumer. Both columns are BIGINT (exact parquet
    * round-trip), and every consumer's oracle re-chunks from raw text,
    * so persisted-expansion ≡ direct-expansion stays value-gated on
    * each query. [[cdcDedup]] is the designated measured build.
    */
  private val cdcInstArtifact = new graft.SessionArtifact("cdcinst")

  /** Write the chunk-instance artifact for `dir` into `p`: the
    * [[cdcChunkHashes]] expansion of the fixture corpus, exploded to
    * one (doc_id, h) row per chunk instance.
    */
  private def buildCdcInstances(spark: SparkSession, dir: String)(p: String): Unit =
    cdcChunkHashes(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .write.mode("overwrite").parquet(p)

  /** The persisted chunk instances for `dir`, built at most once per
    * JVM (losers of the ensure race read the winner's files).
    */
  private[queries] def cdcInstances(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(cdcInstArtifact.ensure(dir)(buildCdcInstances(spark, dir)))

  /** Sub-document dedup via content-defined chunking — the Dolma-style
    * pass that catches documents SHARING passages without being
    * near-identical overall (quote farms, templated wrappers around
    * common bodies), which whole-document hashing ([[hashCount]]) and
    * document-level MinHash both miss. Chunk instances explode to
    * (doc, hash) rows, a corpus-wide count per hash marks instances
    * duplicate (≥ 2 occurrences anywhere, same doc included), and each
    * document reports its chunk count and floor-scaled duplicate-chunk
    * ppm. Scale shape: the per-doc chunking is scan-local expressions;
    * the only shuffles are the chunk-hash count (wordcount class —
    * the universe is tokens/[[CdcBoundaryMod]]) and its join back,
    * which share the `h` key so the exchange reuses. Production stores
    * (chunk_hash → exemplar) once and anti-joins new batches — the
    * [[incremental]] contract one level below the document.
    *
    * This is the chunk-instance index's designated MEASURED build
    * ([[cdcInstArtifact]]): it rebuilds the persisted (doc_id, h)
    * frame unconditionally so the chunking cost stays a first-class
    * bench entry; [[cdcCross]] and [[cdcIncremental]] probe the
    * pointer instead of re-running the md5-per-token expansion.
    */
  def cdcDedup(spark: SparkSession, dir: String): DataFrame = {
    val inst = spark.read.parquet(
      cdcInstArtifact.rebuild(dir)(buildCdcInstances(spark, dir)))
    val counts = inst.groupBy("h").agg(count(lit(1)).as("c"))
    inst.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("dup_chunks"),
        expr("(dup_chunks * 1000000) div n_chunks").as("dup_ppm"))
      .orderBy("doc_id")
  }

  /** Bloom geometry for [[bloomDedup]]: m bits, packed 32 per BIGINT —
    * 512 64-bit words (4 KB) as stored/broadcast, holding 16384 filter
    * bits; 32-bit packing because DuckDB's checked BIGINT shift
    * rejects `1 << 63`, and the oracle must evaluate the identical
    * filter) probed k ways. Deterministic (fixed salted portable64
    * positions), so unlike the engine's runtime bloom join
    * (`join_bloom`), this one is a PORTABLE artifact with an exact
    * cross-engine oracle: any system that can md5 can evaluate the same
    * filter.
    */
  val BloomBits = 16384
  val BloomProbes = 3

  /** The k salted bit positions of a 64-bit content hash. */
  private def bloomPositions(h: Column): Column =
    array((0 until BloomProbes).map { i =>
      pmod(portable64(concat(lit(s"bf$i:"), h.cast("string"))), lit(BloomBits.toLong))
    }: _*)

  /** Bloom-filter incremental dedup pre-filter — the at-scale front end
    * of [[incremental]]: instead of shipping the history's full hash
    * set to every ingest worker, history compresses into a [[BloomBits]]-
    * bit filter (512 64-bit words, 4 KB as stored — corpus-size-
    * independent) that broadcasts
    * everywhere; a batch document whose k probe bits are all set is
    * "maybe seen" and only those routed to the exact anti-join, while a
    * clear bit proves novelty with NO false negatives. The report
    * audits the trade on the harness corpus: batch size, flagged count,
    * true duplicates (ground truth via the exact join), false
    * positives, and the realized FP rate in ppm over the clean
    * population — the number that sizes m/k in production.
    *
    * Scale shape: the build is one scan + a bit-or aggregation over
    * ≤ m/64 groups; the packed filter broadcasts to the probe scan
    * (map-side membership test); the exact join runs only for the
    * audit. Everything is integer/deterministic — exact value oracle.
    */
  def bloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = SampleOps.withSplit(Tables.documents(spark, dir))
      .select(col("doc_id"), col("split"), portable64(col("text")).as("h"))
    val hist = d.filter(col("split") === "train").select("h").distinct()
    val words = hist
      .select(explode(bloomPositions(col("h"))).as("p"))
      .select(expr("p div 32").as("word"), pmod(col("p"), lit(32L)).as("bit"))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").as("bits"))
    val batch = d.filter(col("split") =!= "train").select("doc_id", "h")
    val maybe = batch
      .select(col("doc_id"), col("h"), explode(bloomPositions(col("h"))).as("p"))
      .select(col("doc_id"), col("h"),
        expr("p div 32").as("word"), pmod(col("p"), lit(32L)).as("bit"))
      .join(broadcast(words), Seq("word"), "left")
      .select(col("doc_id"), col("h"),
        when(expr("bits IS NOT NULL AND (bits & shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))) != 0"),
          1L).otherwise(0L).as("hit"))
      .groupBy("doc_id", "h")
      .agg(min(col("hit")).as("maybe"))
    val truth = maybe.join(hist.withColumn("dup", lit(1L)), Seq("h"), "left")
    truth.agg(
        count(lit(1)).as("batch_docs"),
        sum(col("maybe")).as("flagged"),
        sum(coalesce(col("dup"), lit(0L))).as("true_dups"),
        sum(when(col("maybe") === 1L && col("dup").isNull, 1L).otherwise(0L))
          .as("false_pos"))
      .select(col("batch_docs"), col("flagged"), col("true_dups"), col("false_pos"),
        expr("(false_pos * 1000000) div greatest(batch_docs - true_dups, 1L)").as("fp_ppm"))
  }

  /** Passages reported by [[cdcCross]]. */
  val CdcCrossTopK = 20

  /** Cross-document hot-passage ranking — the complement of [[cdcDedup]]
    * (which reports per-document duplication): rank the content-defined
    * chunks that appear in the MOST DISTINCT documents, i.e. surface the
    * boilerplate passages themselves (license blocks, templated headers,
    * quote-farm bodies) so a pipeline owner can decide whether to strip
    * them corpus-wide rather than document-by-document. Chunk identity
    * is the same 62-bit double fold ([[cdcChunkHashes]]), so this query,
    * the per-doc report, and the streaming chunk ingest all read one
    * index.
    *
    * Scale shape: scan-local chunking, one wordcount-class aggregation
    * on the chunk hash (count + distinct-doc count in the same pass —
    * instances of a chunk within one doc are a handful, so the
    * per-group distinct state is bounded), TakeOrderedAndProject head.
    * Nothing corpus-sized past the exchange; the hash key universe is
    * tokens/[[CdcBoundaryMod]].
    */
  def cdcCross(spark: SparkSession, dir: String): DataFrame =
    cdcInstances(spark, dir)
      .groupBy("h")
      .agg(count_distinct(col("doc_id")).as("n_docs"), count(lit(1)).as("insts"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), desc("insts"), asc("h"))
      .limit(CdcCrossTopK)

  /** Incremental sub-document dedup: the incoming batch's chunk hashes
    * probe the HISTORY chunk index ([[dedup_incremental]]'s contract one
    * level below the document) — per batch document, how many of its
    * passages are genuinely new vs already present anywhere in history.
    * The split buckets stand in for the two corpora exactly as in
    * [[incremental]]; production reads the historical hashes from the
    * persisted chunk index (hashes only, never text) and appends the
    * batch's fresh chunks to it. Shape: one anti-join-shaped left join
    * on the chunk hash (the wordcount-class key), per-doc counts on the
    * batch side only — history never re-chunks.
    */
  def cdcIncremental(spark: SparkSession, dir: String): DataFrame = {
    // split is a pure function of doc_id, so tagging the persisted
    // instance rows ≡ tagging before the explode.
    val inst = SampleOps.withSplit(cdcInstances(spark, dir))
      .select(col("doc_id"), col("split"), col("h"))
    val history = inst.filter(col("split") === "train").select("h").distinct()
    inst.filter(col("split") =!= "train")
      .join(history.withColumn("seen", lit(1)), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("fresh_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("fresh_chunks"),
        expr("(fresh_chunks * 1000000) div n_chunks").as("fresh_ppm"))
      .orderBy("doc_id")
  }

  // ---- Streaming ingest under the value gate --------------------------
  // The two DocStream production pipelines executed as REAL bounded
  // streaming runs whose output the driver hashes against DuckDB — the
  // same recipe as the stream_* event gates: documents staged as
  // snapshot generations, the DSv2 connector tails them one generation
  // per trigger, each micro-batch runs the exact production step
  // (probe the persisted index, append itself as history), and the
  // batch-partitioned sinks read back as the result. Batch identity is
  // a FUNCTION of the doc_id (md5 bucket mod StreamIngestBatches + 1),
  // so the oracle reconstructs the cross-batch history semantics
  // relationally: history of batch k = the tag-0 seed plus every batch
  // strictly below k. The WHOLE corpus participates (tag 0 seeds, tags
  // 1..3 stream): under a train/non-train layout no near-dup pair had
  // BOTH docs outside train at fixture scale, so the growing-index arm
  // of the band gate would have been vacuously green (the q22 lesson).

  /** Micro-batch count for the streaming ingest gates: documents with
    * ingest tag ≥ 1 split into this many generations; tag 0 is the
    * seed backfill (every tag populated at all fixture scales —
    * enforced loudly at staging). TWO batches is the minimum that
    * exercises the growing index (batch 0 probes the seed alone,
    * batch 1 probes seed + batch 0's streamed contributions) — a third
    * batch only repeated batch 1's coverage class at one more full
    * micro-batch round per gate × three gates (the r12 stream_dedup
    * three-bucket precedent); the cross-STREAM-batch arm stays
    * non-trivially bound (measured at sf0.01: 6 batch→batch candidate
    * hits in `stream_neardup`, 24 cross-stream-batch history chunk
    * instances in `stream_chunks`).
    */
  val StreamIngestBatches = 2

  /** The per-document ingest tag in [0, StreamIngestBatches]: 0 seeds
    * the index, tag k ≥ 1 streams as micro-batch k-1. A pure function
    * of the doc_id (the split machinery's md5 bucket), mirrored in
    * [[duckBatchTagCte]].
    */
  private def ingestTag: Column =
    pmod(SampleOps.bucketOf(col("doc_id")), lit(StreamIngestBatches + 1))

  /** Fresh scratch dirs — delegates to the drill families' shared
    * implementation.
    */
  private def freshDirs(spark: SparkSession, names: String*): Seq[String] =
    graft.streaming.StreamDrill.freshDirs(spark, names: _*)

  /** Memoized per-(JVM, sfDir) READ-ONLY document bronze: the three
    * ingest gates (near-dup, chunks, trending) tail the IDENTICAL
    * tagged generations and only ever read them — staged once per
    * session (checkpoints, indexes, and sinks stay per-query).
    */
  private val docBronzeArtifact = new graft.SessionArtifact("doc_bronze")

  private def docBronze(spark: SparkSession, dir: String): String =
    docBronzeArtifact.ensure(dir)(p => stageDocGens(spark, dir, p))

  /** Stage the tag ≥ 1 documents as [[StreamIngestBatches]] snapshot
    * generations in batch-tag order. The tag is a pure function of the
    * doc_id, so the connector's one-generation-per-trigger tail yields
    * deterministic micro-batch composition the oracle can reconstruct.
    */
  private def stageDocGens(spark: SparkSession, dir: String,
      root: String): Unit = {
    val d = Tables.documents(spark, dir)
      .withColumn("bt", (ingestTag - 1).cast("int"))
      .filter(col("bt") >= 0)
      .select("doc_id", "text", "bt")
    d.repartition(col("bt")).write.partitionBy("bt").parquet(s"$root/staging")
    (0 until StreamIngestBatches).foreach { i =>
      val part = s"$root/staging/bt=$i"
      val hp = new org.apache.hadoop.fs.Path(part)
      require(hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp),
        s"stream ingest gates need every batch tag populated; tag $i of " +
          s"$StreamIngestBatches is empty at $dir — shrink StreamIngestBatches")
      val files = graft.sources.SnapshotTable.freshFiles(spark, part)
      graft.sources.SnapshotTable.publishAppend(spark, root, (i + 1).toLong,
        files.sorted, carryFrom = if (i == 0) None else Some(i.toLong))
    }
  }

  /** The connector tail the ingest gates consume: one generation per
    * trigger, typed to [[graft.streaming.DocStream.Doc]].
    */
  private def docTail(mainSpark: SparkSession,
      root: String): org.apache.spark.sql.Dataset[graft.streaming.DocStream.Doc] = {
    val spark = graft.streaming.StreamDrill.session(mainSpark)
    import spark.implicits._
    spark.readStream
      .format(classOf[graft.streaming.SnapshotSourceProvider].getName)
      .option("path", root).option("maxGensPerBatch", "1").load()
      .select("doc_id", "text")
      .as[graft.streaming.DocStream.Doc]
  }

  /** Read a batch-partitioned stream sink back (shared impl). */
  private def readSinkOrEmpty(spark: SparkSession, sink: String,
      emptyDdl: String): DataFrame =
    graft.streaming.StreamDrill.readSinkOrEmpty(spark, sink, emptyDdl)

  /** [[graft.streaming.DocStream.neardupIngest]] EXECUTED under the
    * value gate: the band-bucket index seeds from the tag-0 quarter
    * (the deployment backfill, via the persisted signature artifact),
    * the tag ≥ 1 documents stream in as
    * [[StreamIngestBatches]] real micro-batches, and every batch runs
    * the production step verbatim — compute ONLY its own MinHash
    * bands, probe the persisted index for strictly-earlier history,
    * append itself. The returned frame is the candidate sink's
    * content; the oracle recomputes every batch's candidate set
    * relationally (bands joined on `history tag < batch tag`), so the
    * hash asserts streaming ingest ≡ batch derivation ≡ DuckDB
    * including the cross-batch index growth. Per-batch cost is the
    * batch plus a bucket-keyed join — never corpus history.
    */
  def streamNeardup(spark: SparkSession, dir: String): DataFrame = {
    val Seq(idx, cand, ckpt) = freshDirs(spark,
      "stream_neardup_idx", "stream_neardup_cand", "stream_neardup_ckpt")
    val bronze = docBronze(spark, dir)
    // Seed from the memoized signature table (value-identical to
    // hashing the tag-0 text — sigIndex's own gate pins that), not by
    // re-hashing a quarter of the corpus: the deployment's backfill
    // reads the batch job's persisted artifact too.
    graft.streaming.DocStream.seedIndexFromBands(
      bandsOfSig(
        sigIndex(spark, dir).filter(ingestTag === 0),
        graft.streaming.DocStream.NBands,
        graft.streaming.DocStream.RowsPerBand, PortableFamily), idx)
    val q = graft.streaming.DocStream
      .neardupIngest(docTail(spark, bronze), idx, cand, ckpt).start()
    try q.processAllAvailable() finally q.stop()
    readSinkOrEmpty(spark, cand,
      "new_doc BIGINT, old_doc BIGINT, batch_id BIGINT")
      .select(col("batch_id").cast("long").as("batch_id"),
        col("new_doc"), col("old_doc"))
      .orderBy("batch_id", "new_doc", "old_doc")
  }

  /** [[graft.streaming.DocStream.chunkIngest]] EXECUTED under the
    * value gate — the chunk-level sibling of [[streamNeardup]]: the
    * chunk index seeds from the tag-0 quarter (via the persisted
    * chunk-instance artifact), the tag ≥ 1 documents stream in as
    * real micro-batches, and each batch chunks
    * ONLY itself, probes strictly-earlier history, reports per-doc
    * fresh-passage ppm, and appends its chunks. The oracle derives
    * every chunk's FIRST-SEEN batch tag (min over seed = -1 and all
    * batch instances) and calls an instance fresh iff its own batch IS
    * the first sighting — exactly the stream's history semantics, so
    * the hash gates the growing-index behavior (24 cross-stream-batch
    * history chunk instances at sf0.01), not just one probe.
    */
  def streamChunks(spark: SparkSession, dir: String): DataFrame = {
    val Seq(idx, rpt, ckpt) = freshDirs(spark,
      "stream_chunks_idx", "stream_chunks_rpt", "stream_chunks_ckpt")
    val bronze = docBronze(spark, dir)
    // Seed from the memoized chunk-instance table (the dedup_cdc
    // artifact) instead of re-chunking the seed quarter — the same
    // persisted-artifact backfill as stream_neardup's seed.
    graft.streaming.DocStream.seedChunkIndexFromInstances(
      cdcInstances(spark, dir).filter(ingestTag === 0), idx)
    val q = graft.streaming.DocStream
      .chunkIngest(docTail(spark, bronze), idx, rpt, ckpt).start()
    try q.processAllAvailable() finally q.stop()
    readSinkOrEmpty(spark, rpt,
      "doc_id BIGINT, n_chunks BIGINT, fresh_chunks BIGINT, " +
        "fresh_ppm BIGINT, batch_id BIGINT")
      .select(col("batch_id").cast("long").as("batch_id"), col("doc_id"),
        col("n_chunks"), col("fresh_chunks"), col("fresh_ppm"))
      .orderBy("batch_id", "doc_id")
  }

  /** [[graft.streaming.DocStream.trendingWords]] EXECUTED under the
    * value gate — the LIVE Misra-Gries summary as real stream state:
    * the same tagged generations stream in, each micro-batch
    * exact-counts its own tokens per shard, prunes to a k-summary, and
    * merges into the shard's persisted state with the mergeable-
    * summaries merge; every trigger's Update-mode emission lands in
    * the batch-partitioned sink. The oracle UNROLLS the merge rounds
    * in SQL (the pagerank/BPE technique): per batch, combined counts
    * rank per shard, the (k+1)-th largest count subtracts, survivors
    * carry — so the hash pins the exact cross-batch state evolution of
    * the sketch, not just a final snapshot. Emission per round filters
    * to shards PRESENT in that batch (flatMapGroupsWithState only
    * invokes groups the trigger touched).
    */
  def streamTrending(spark: SparkSession, dir: String): DataFrame = {
    val Seq(ckpt, sink) = freshDirs(spark,
      "stream_trending_ckpt", "stream_trending_sink")
    val bronze = docBronze(spark, dir)
    val q = graft.streaming.DocStream.trendingWords(docTail(spark, bronze))
      .toDF().writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          graft.streaming.EventStream.writeBatch(b.toDF(), id, sink))
      .start()
    try q.processAllAvailable() finally q.stop()
    readSinkOrEmpty(spark, sink,
      "shard INT, word STRING, est BIGINT, batch_id BIGINT")
      .select(col("batch_id").cast("long").as("batch_id"),
        col("shard").cast("long").as("shard"), col("word"), col("est"))
      .orderBy("batch_id", "shard", "word")
  }

  /** The [[streamTrending]] oracle: [[graft.functions.MisraGries
    * .mergeMaps]] unrolled per micro-batch — combined counts per
    * (shard, word), the (k+1)-th largest count per shard as the cut
    * (0 when ≤ k entries), survivors strictly above it carry c − cut.
    * Generated from the SAME k/shards constants the stream uses.
    */
  private def duckTrendingSql: String = {
    val k = graft.streaming.DocStream.TrendK
    val shards = graft.streaming.DocStream.TrendShards
    def prune(src: String, out: String): String =
      s"""${out}_r AS MATERIALIZED (
         |  SELECT shard, w, c,
         |    row_number() OVER (PARTITION BY shard ORDER BY c DESC) AS rn
         |  FROM $src),
         |${out}_cut AS (
         |  SELECT shard,
         |    coalesce(max(CASE WHEN rn = ${k + 1} THEN c END), 0) AS cut
         |  FROM ${out}_r GROUP BY shard),
         |$out AS MATERIALIZED (
         |  SELECT r.shard, r.w, r.c - ct.cut AS c
         |  FROM ${out}_r r JOIN ${out}_cut ct ON r.shard = ct.shard
         |  WHERE r.c > ct.cut)""".stripMargin
    val batchCtes = (0 until StreamIngestBatches).map { i =>
      s"""bc$i AS MATERIALIZED (
         |  SELECT shard, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tok WHERE bt = $i GROUP BY shard, w)""".stripMargin
    }
    val rounds = (0 until StreamIngestBatches).flatMap { i =>
      if (i == 0) Seq(prune("bc0", "s0"))
      else Seq(prune(s"bc$i", s"bp$i"),
        s"""u$i AS (
           |  SELECT shard, w, CAST(sum(c) AS BIGINT) AS c FROM (
           |    SELECT * FROM s${i - 1} UNION ALL SELECT * FROM bp$i) z
           |  GROUP BY shard, w)""".stripMargin,
        prune(s"u$i", s"s$i"))
    }
    val emits = (0 until StreamIngestBatches).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS batch_id, CAST(shard AS BIGINT) AS shard,
         |  w AS word, CAST(c AS BIGINT) AS est
         |FROM s$i WHERE shard IN (SELECT DISTINCT shard FROM bc$i)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $duckBatchTagCte,
       |tok AS MATERIALIZED (
       |  SELECT g.bt, ${duckPortable64("w")} % $shards AS shard, w
       |  FROM (SELECT doc_id,
       |          unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |        FROM documents) d
       |  JOIN tag g ON d.doc_id = g.doc_id
       |  WHERE g.bt >= 0),
       |${(batchCtes ++ rounds).mkString(",\n")}
       |$emits
       |ORDER BY batch_id, shard, word""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_neardup" -> (streamNeardup _),
    "stream_chunks" -> (streamChunks _),
    "stream_trending" -> (streamTrending _),
    "dedup_cdc" -> (cdcDedup _),
    "dedup_spans" -> (spanDedup _),
    "dedup_spans_incr" -> (spanIncremental _),
    "dedup_longest_span" -> (longestSpan _),
    "dedup_span_strip" -> (spanStrip _),
    "dedup_cdc_incr" -> (cdcIncremental _),
    "dedup_cdc_cross" -> (cdcCross _),
    "dedup_bloom" -> (bloomDedup _),
    "neardup_pipeline" -> (neardupPipeline _),
    "neardup_edit" -> (editDistance _),
    "neardup_groups" -> (neardupGroups _),
    "dedup_canonical" -> (canonicalSelect _),
    "dedup_exact" -> (exact _),
    "dedup_hash_count" -> (hashCount _),
    "dedup_weights" -> (softWeights _),
    "dedup_incremental" -> (incremental _),
    "neardup_jaccard" -> (jaccard _),
    "neardup_containment" -> (containment _),
    "neardup_index" -> (shingleIndexBuild _),
    "neardup_index_incr" -> (shingleIndexIncremental _),
    "neardup_index_probe" -> (shingleIndexProbe _),
    "text_repetition_ngram" -> (textRepetition _),
    "neardup_minhash" -> (minhashBuckets _),
    "neardup_minhash_fast" -> (minhashBucketsFast _),
    "neardup_minhash_incr" -> (minhashIncremental _),
    "neardup_minhash_est" -> (minhashEstimate _),
    "neardup_lsh_recall" -> (lshRecall _),
    "neardup_simhash" -> (simhashQuery _),
    "neardup_simhash_pairs" -> (simhashPairs _),
    "neardup_simhash_incr" -> (simhashIncremental _),
  )

  // ---- DuckDB twins of the portable hash family ------------------------
  // portable64(x)  ==  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
  // base(x)        ==  portable64(x) % P31
  // member(j, b)   ==  (b * memberA(j) + memberB(j)) % P31
  // bucket(cols)   ==  fold(cols, (acc, c) -> (acc * BucketMix + c) % P31)
  // The SQL below is GENERATED from the same Scala constants the Spark
  // expressions use, so the two sides cannot drift.

  private[graft] def duckPortable64(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"

  private def duckBucket(cols: Seq[String]): String =
    cols.reduce((acc, c) => s"(($acc) * $BucketMix + $c) % $P31")

  // trigram identity == trigramHashesOf: the coprime double modular
  // fold of three consecutive token hashes, f1*2^31 + f2 — generated
  // from the SAME mix/modulus constants the Spark expressions use.
  private def duckTrigramFold(h1: String, h2: String, h3: String,
      mix: Long, mod: Long): String =
    s"(((($h1 % $mod) * $mix + $h2) % $mod) * $mix + $h3) % $mod"

  private def duckTrigram(h1: String, h2: String, h3: String): String =
    s"((${duckTrigramFold(h1, h2, h3, BucketMix, P31)}) * ${1L << 31} + " +
      s"(${duckTrigramFold(h1, h2, h3, CdcMix2, P31B)}))"

  /** CTE chain ending in `tho(doc_id, th)` — the per-token portable
    * hash list, mirroring [[hashedTokens]] (one md5 per token).
    */
  private val duckTokenHashCtes: String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |tho AS (
       |  SELECT doc_id, list_transform(tk, t -> ${duckPortable64("t")}) AS th
       |  FROM toks)""".stripMargin

  /** The trigram-identity list over a list column named `th`, mirroring
    * [[trigramHashesOf]] (package-visible so SampleOps' decontamination
    * oracles render the SAME shingle identity SQL).
    */
  private[queries] val duckShingleList: String =
    s"list_transform(range(0, greatest(len(th) - 2, 0)), " +
      s"i -> ${duckTrigram("th[i+1]", "th[i+2]", "th[i+3]")})"

  /** CTE chain ending in `sh(doc_id, sh)` — each document's DISTINCT
    * 62-bit trigram identities, mirroring [[shingleSetWithSize]] (the
    * persisted [[shingleIndex]]'s content). Shared by the
    * index/jaccard/containment/edit oracles so they cannot drift; every
    * twin recomputes from raw text, so each green row gates
    * index-build + probe ≡ direct computation.
    */
  private val duckDistinctShingleCtes: String =
    s"""$duckTokenHashCtes,
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest($duckShingleList) AS sh
       |  FROM tho)""".stripMargin

  /** CTE chain ending in `inst(doc_id, h)` — one row per content-defined
    * chunk instance, exactly mirroring [[cdcChunkHashes]]. Shared by the
    * `dedup_cdc` and `dedup_cdc_incr` oracles so the batch/full paths
    * cannot drift.
    */
  private def duckCdcFold(slice: String, mix: Long, mod: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $slice), " +
      s"(acc, h) -> (acc * $mix + h) % $mod)"

  /** The every-position `k`-wide span-identity list over a list column
    * named `th` — [[graft.functions.SpanFold]]'s double-modulus
    * identity in SQL, the ONE generator the span-family oracles
    * (`dedup_spans*`, `text_repetition_ngram`, `events_trajectory`)
    * share so the identity arithmetic cannot drift between them.
    */
  private[queries] def duckSpanList(k: Int): String = {
    val w = k - 1
    val slice = s"th[i:i+$w]"
    s"list_transform(range(1, greatest(len(th) - $w, 0) + 1), " +
      s"i -> ${duckCdcFold(slice, BucketMix, P31)} * ${1L << 31} " +
      s"+ ${duckCdcFold(slice, CdcMix2, P31B)})"
  }

  private val duckCdcInstCtes: String =
    s"""tk AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |th AS (
       |  SELECT doc_id, list_transform(tk, t -> ${duckPortable64("t")}) AS th
       |  FROM tk WHERE len(tk) > 0),
       |cb AS (
       |  SELECT doc_id, th,
       |    list_filter(range(1, len(th) + 1),
       |      i -> th[i] % $CdcBoundaryMod = 0) AS bpos
       |  FROM th),
       |sp AS (
       |  SELECT doc_id, th,
       |    list_prepend(1, list_transform(bpos, p -> p + 1)) AS starts,
       |    list_append(bpos, len(th)) AS ends
       |  FROM cb),
       |inst AS (
       |  SELECT doc_id, unnest(hs) AS h FROM (
       |    SELECT doc_id,
       |      list_filter(list_transform(range(1, len(starts) + 1),
       |        k -> CASE WHEN starts[k] <= ends[k]
       |          THEN ${duckCdcFold("th[starts[k]:ends[k]]", BucketMix, P31)}
       |               * ${1L << 31} + ${duckCdcFold("th[starts[k]:ends[k]]", CdcMix2, P31B)}
       |          END),
       |        h -> h IS NOT NULL) AS hs
       |    FROM sp) x)""".stripMargin

  /** Shared CTEs: distinct (doc_id, shingle) pairs and the 16-member
    * MinHash signature per document, exactly mirroring
    * [[minhashSignatures]] on [[PortableFamily]].
    */
  private val duckSignatureCtes: String = {
    val mins = (0 until 16)
      .map(j => s"  min((h0 * ${memberA(j)} + ${memberB(j)}) % $P31) AS h$j")
      .mkString(",\n")
    s"""$duckTokenHashCtes,
       |sh AS (
       |  SELECT doc_id, unnest($duckShingleList) AS sh
       |  FROM tho),
       |hs AS (SELECT doc_id, sh % $P31 AS h0 FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |${(0 until 4).map { b =>
           val cols = (0 until 4).map(r => s"h${b * 4 + r}")
           s"  SELECT doc_id, CAST($b AS BIGINT) AS band, ${duckBucket(cols)} AS bucket FROM sig"
         }.mkString("\n  UNION ALL\n")})""".stripMargin
  }

  /** DuckDB twin of [[simhash]] as a CTE chain ending in
    * `sig(doc_id, simhash)`: 60 per-bit vote sums assembled back into
    * the signature (generated, not hand-written — one term per bit).
    * Shared by the signature query and the banded-pairs query.
    */
  private val duckSimhashCtes: String = {
    val votes = (0 until SimhashBits)
      .map(b => s"  sum(CASE WHEN (h >> $b) & 1 = 1 THEN c ELSE -c END) AS b$b")
      .mkString(",\n")
    val assemble = (0 until SimhashBits)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, t, count(*) AS c FROM (
       |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
       |    FROM documents) GROUP BY doc_id, t),
       |h AS (SELECT doc_id, ${duckPortable64("t")} AS h, c FROM tok),
       |votes AS (
       |  SELECT doc_id,
       |$votes
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM votes)""".stripMargin
  }

  private val duckSimhashSql: String =
    s"""WITH $duckSimhashCtes
       |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[simhashPairs]] (bands generated from the same
    * constants; `bit_count(xor)` matches Spark's `bit_count(^)`; `okb`
    * mirrors the [[SimhashMaxBucket]] bucket cap).
    */
  private val duckSimhashPairsSql: String = {
    val mask = (1L << SimhashChunkBits) - 1
    val bandSelects = (0 until SimhashBands).map { b =>
      s"  SELECT doc_id, simhash, CAST($b AS BIGINT) AS band, " +
        s"(simhash >> ${b * SimhashChunkBits}) & $mask AS chunk FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $duckSimhashCtes,
       |bands AS (
       |$bandSelects),
       |okb AS (
       |  SELECT band, chunk FROM bands GROUP BY band, chunk
       |  HAVING count(*) > 1 AND count(*) <= $SimhashMaxBucket)
       |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM bands x
       |JOIN okb ON x.band = okb.band AND x.chunk = okb.chunk
       |JOIN bands y
       |  ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $SimhashMaxHamming
       |ORDER BY hamming, a, b""".stripMargin
  }

  /** DuckDB twin of [[simhashIncremental]]: same signature CTEs, the
    * sampling family's split CASE, bands generated per side from the
    * shared constants, history-side bucket cap, exact Hamming cut.
    */
  private val duckSimhashIncrSql: String = {
    val mask = (1L << SimhashChunkBits) - 1
    def bandSelects(from: String): String = (0 until SimhashBands).map { b =>
      s"  SELECT doc_id, simhash, CAST($b AS BIGINT) AS band, " +
        s"(simhash >> ${b * SimhashChunkBits}) & $mask AS chunk FROM $from"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $duckSimhashCtes,
       |sp AS (
       |  SELECT doc_id,
       |    ${SampleOps.duckSplitCase(SampleOps.duckBucket("doc_id"))} AS split
       |  FROM documents),
       |hist AS (SELECT sig.doc_id, simhash FROM sig JOIN sp USING (doc_id)
       |         WHERE split = 'train'),
       |bat AS (SELECT sig.doc_id, simhash FROM sig JOIN sp USING (doc_id)
       |        WHERE split <> 'train'),
       |hb AS (
       |${bandSelects("hist")}),
       |bb AS (
       |${bandSelects("bat")}),
       |okb AS (
       |  SELECT band, chunk FROM hb GROUP BY band, chunk
       |  HAVING count(*) <= $SimhashMaxBucket)
       |SELECT DISTINCT b.doc_id AS new_doc, h.doc_id AS old_doc,
       |  CAST(bit_count(xor(b.simhash, h.simhash)) AS BIGINT) AS hamming
       |FROM bb b
       |JOIN okb ON b.band = okb.band AND b.chunk = okb.chunk
       |JOIN hb h ON b.band = h.band AND b.chunk = h.chunk
       |WHERE bit_count(xor(b.simhash, h.simhash)) <= $SimhashMaxHamming
       |ORDER BY hamming, new_doc, old_doc""".stripMargin
  }

  /** CTE chain ending in `ver` = the verified near-dup pairs, exactly
    * mirroring [[verifiedPairs]].
    */
  private[queries] val duckVerifiedCtes: String =
    s"""$duckSignatureCtes,
       |sh_d AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh_d GROUP BY doc_id),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |inter AS (
       |  SELECT c.a, c.b, count(*) AS inter
       |  FROM cand c
       |  JOIN sh_d sa ON sa.doc_id = c.a
       |  JOIN sh_d sb ON sb.doc_id = c.b AND sa.sh = sb.sh
       |  GROUP BY c.a, c.b),
       |ver AS (
       |  SELECT a, b FROM inter
       |  JOIN sizes s1 ON a = s1.doc_id
       |  JOIN sizes s2 ON b = s2.doc_id
       |  WHERE floor(inter * 1000000.0 / (s1.n_sh + s2.n_sh - inter)) >= 800000)""".stripMargin

  // lazy: baseOracle is declared below (keeping the big map next to its
  // CTE helpers); the composed entry must not dereference it at
  // object-init time.
  lazy val oracle: Map[String, String] = baseOracle +
    // Versioned-index maintenance ≡ direct computation: the snapshot
    // table's latest generation holds exactly the full corpus' shingle
    // rows, so the incremental twin shares neardup_jaccard's oracle
    // string verbatim.
    ("neardup_index_incr" -> baseOracle("neardup_jaccard")) +
    // The production-hash twin: xxHash64 unrolled into DuckDB hugeint
    // arithmetic (generated — see XxhashOracle), closing the one query
    // that was rows-only-checked since r10.
    ("neardup_minhash_fast" -> XxhashOracle.minhashFastSql) +
    // The groups oracle's components joined with text_quality's
    // token-count expression; rank 1 per component elects the
    // canonical (most tokens, ties to lowest doc_id).
    ("dedup_canonical" ->
      s"""WITH RECURSIVE $duckVerifiedCtes,
         |sym AS (SELECT a AS src, b AS dst FROM ver
         |        UNION ALL SELECT b, a FROM ver),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
         |, lab AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS rep
         |  FROM reach GROUP BY src),
         |tc AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
         |      AS BIGINT) AS tok_cnt
         |  FROM documents),
         |m AS (
         |  SELECT l.doc_id, l.rep, tc.tok_cnt,
         |    row_number() OVER (PARTITION BY l.rep
         |                       ORDER BY tc.tok_cnt DESC, l.doc_id ASC) AS rn
         |  FROM lab l JOIN tc USING (doc_id)),
         |canon AS (SELECT rep, doc_id AS canonical FROM m WHERE rn = 1)
         |SELECT m.doc_id, m.rep, c.canonical, m.tok_cnt,
         |  CASE WHEN m.doc_id = c.canonical THEN 'keep' ELSE 'drop' END AS action
         |FROM m JOIN canon c USING (rep)
         |ORDER BY rep, doc_id""".stripMargin) +
    // Within-doc repetition: the same token-hash + windowed-fold
    // identities (SpanFold widths 2 and 3), counted per document.
    ("text_repetition_ngram" -> {
      def spanCte(k: Int, name: String): String =
        s"""$name AS (
           |  SELECT doc_id, unnest(${duckSpanList(k)}) AS h
           |  FROM tho)""".stripMargin
      s"""WITH $duckTokenHashCtes,
         |i1 AS (SELECT doc_id, unnest(th) AS h FROM tho),
         |${spanCte(2, "i2")},
         |${spanCte(3, "i3")},
         |c1 AS (SELECT doc_id, h, count(*) AS c FROM i1 GROUP BY 1, 2),
         |c2 AS (SELECT doc_id, h, count(*) AS c FROM i2 GROUP BY 1, 2),
         |c3 AS (SELECT doc_id, h, count(*) AS c FROM i3 GROUP BY 1, 2),
         |t1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n1,
         |              CAST(max(c) AS BIGINT) AS top1 FROM c1 GROUP BY 1),
         |t2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
         |              CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup2
         |       FROM c2 GROUP BY 1),
         |t3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3,
         |              CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup3
         |       FROM c3 GROUP BY 1)
         |SELECT t1.doc_id, t1.n1 AS n_tokens,
         |  (t1.top1 * 1000000) // t1.n1 AS top_token_ppm,
         |  CASE WHEN coalesce(t2.n2, 0) > 0
         |       THEN (t2.dup2 * 1000000) // t2.n2 ELSE 0 END AS dup_2gram_ppm,
         |  CASE WHEN coalesce(t3.n3, 0) > 0
         |       THEN (t3.dup3 * 1000000) // t3.n3 ELSE 0 END AS dup_3gram_ppm
         |FROM t1 LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) +
    // Batch-only probe of the versioned index: the same shingle CTEs
    // plus the split CASE reproduce exactly the batch×(batch∪history)
    // candidate set and the df-capped scores.
    ("neardup_index_probe" ->
      s"""WITH $duckDistinctShingleCtes,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |sp AS (SELECT doc_id,
         |         ${SampleOps.duckSplitCase(SampleOps.duckBucket("doc_id"))} AS split
         |       FROM sizes),
         |keep AS (SELECT sh FROM sh GROUP BY sh
         |         HAVING count(*) > 1 AND count(*) <= $JaccardMaxDf),
         |inter AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
         |  FROM sh x
         |  JOIN sp sx ON x.doc_id = sx.doc_id AND sx.split <> 'train'
         |  JOIN keep k ON x.sh = k.sh
         |  JOIN sh y ON x.sh = y.sh
         |  JOIN sp sy ON y.doc_id = sy.doc_id
         |  WHERE sy.split = 'train' OR x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b, inter,
         |  CAST(floor(inter * 1000000.0 / (sa.n_sh + sb.n_sh - inter)) AS BIGINT) AS j_ppm
         |FROM inter
         |JOIN sizes sa ON a = sa.doc_id
         |JOIN sizes sb ON b = sb.doc_id
         |ORDER BY j_ppm DESC, a, b LIMIT 20""".stripMargin) +
    // Composed from the two audited queries' own oracle strings (the
    // simsearch_recall technique): the exact top-20 Jaccard pairs
    // semi-joined against the banded candidate set.
    ("neardup_lsh_recall" -> {
      def pairs(name: String) = s"SELECT a, b FROM (\n${baseOracle(name)}\n) t"
      s"""WITH e AS (${pairs("neardup_jaccard")}),
         |c AS (${pairs("neardup_minhash_est")}),
         |r AS (SELECT CAST(count(*) AS BIGINT) AS recalled
         |      FROM e JOIN c USING (a, b)),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS truth_pairs FROM e)
         |SELECT n.truth_pairs, r.recalled,
         |  (r.recalled * 1000000) // greatest(n.truth_pairs, 1) AS recall_ppm
         |FROM n, r""".stripMargin
    })

  /** Batch-tag CTE for the streaming ingest oracles: the seed quarter
    * maps to -1, tag k ≥ 1 to micro-batch k-1 — generated from the
    * same md5-bucket arithmetic as [[ingestTag]], so the two sides
    * cannot drift.
    */
  private def duckBatchTagCte: String =
    s"""tag AS (
       |  SELECT doc_id,
       |    CAST((${duckPortable64("CAST(doc_id AS VARCHAR)")} % 100)
       |      % ${StreamIngestBatches + 1} - 1 AS BIGINT) AS bt
       |  FROM documents)""".stripMargin

  /** The ENTIRE suffix-pipeline oracle chain, ending in
    * `runs(doc_id, pos, run)` — shared verbatim by the
    * `dedup_longest_span` report and the `dedup_span_strip` surgery so
    * the signal and the transform acting on it cannot drift.
    */
  private lazy val duckLcpRunCtes: String = {
    val inst = (0 until 6).map(1 << _).map { w =>
      s"""s$w AS MATERIALIZED (
         |  SELECT doc_id,
         |    unnest(range(1, greatest(len(th) - ${w - 1}, 0) + 1)) AS pos,
         |    unnest(${duckSpanList(w)}) AS id
         |  FROM tho)""".stripMargin
    }.mkString(",\n")
    val quads = Seq((1, 1), (2, 4), (3, 16)).map { case (q, o) =>
      s"""q$q AS MATERIALIZED (
         |  SELECT a.doc_id, a.pos,
         |    CAST(dense_rank() OVER (ORDER BY a.r, coalesce(b1.r, 0),
         |      coalesce(b2.r, 0), coalesce(b3.r, 0)) AS BIGINT) AS r
         |  FROM q${q - 1} a
         |  LEFT JOIN q${q - 1} b1
         |    ON b1.doc_id = a.doc_id AND b1.pos = a.pos + $o
         |  LEFT JOIN q${q - 1} b2
         |    ON b2.doc_id = a.doc_id AND b2.pos = a.pos + ${2 * o}
         |  LEFT JOIN q${q - 1} b3
         |    ON b3.doc_id = a.doc_id AND b3.pos = a.pos + ${3 * o})"""
        .stripMargin
    }.mkString(",\n")
    val descent = Seq(32, 16, 8, 4, 2, 1).zipWithIndex.map {
      case (w, r0) =>
        val r = r0 + 1
        s"""p$r AS MATERIALIZED (
           |  SELECT p.xdoc, p.xpos, p.ydoc, p.ypos,
           |    CASE WHEN a.id = b.id THEN p.l + $w ELSE p.l END AS l
           |  FROM p${r - 1} p
           |  LEFT JOIN s$w a ON a.doc_id = p.xdoc AND a.pos = p.xpos + p.l
           |  LEFT JOIN s$w b ON b.doc_id = p.ydoc AND b.pos = p.ypos + p.l)"""
          .stripMargin
    }.mkString(",\n")
    s"""$duckTokenHashCtes,
       |$inst,
       |q0 AS MATERIALIZED (
       |  SELECT doc_id, pos,
       |    CAST(dense_rank() OVER (ORDER BY id) AS BIGINT) AS r
       |  FROM s1),
       |$quads,
       |ord AS MATERIALIZED (
       |  SELECT doc_id, pos,
       |    CAST(row_number() OVER (ORDER BY r, doc_id, pos) AS BIGINT) AS rn
       |  FROM q3),
       |hd AS MATERIALIZED (
       |  SELECT doc_id, pos, rn,
       |    max(hm) OVER (ORDER BY rn
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS head_rn,
       |    min(hm) OVER (ORDER BY rn
       |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_rn
       |  FROM (
       |    SELECT doc_id, pos, rn,
       |      CASE WHEN coalesce(lag(doc_id) OVER (ORDER BY rn), -1)
       |        <> doc_id THEN rn END AS hm
       |    FROM ord)),
       |p0 AS MATERIALIZED (
       |  SELECT x.doc_id AS xdoc, x.pos AS xpos,
       |    y.doc_id AS ydoc, y.pos AS ypos, CAST(0 AS BIGINT) AS l
       |  FROM hd x JOIN ord y ON y.rn = x.head_rn - 1
       |  UNION ALL
       |  SELECT x.doc_id, x.pos, y.doc_id, y.pos, CAST(0 AS BIGINT)
       |  FROM hd x JOIN ord y ON y.rn = x.next_rn),
       |$descent,
       |best AS MATERIALIZED (
       |  SELECT xdoc AS doc_id, xpos AS pos, max(l) AS l
       |  FROM p6 GROUP BY xdoc, xpos),
       |runs AS MATERIALIZED (
       |  SELECT t.doc_id, t.pos, coalesce(b.l, 0) AS run
       |  FROM s1 t
       |  LEFT JOIN best b ON b.doc_id = t.doc_id AND b.pos = t.pos)"""
      .stripMargin
  }

  private val baseOracle: Map[String, String] = Map(
    "neardup_edit" ->
      s"""WITH $duckDistinctShingleCtes,
         |keep AS (SELECT sh FROM sh GROUP BY sh
         |         HAVING count(*) > 1 AND count(*) <= $JaccardMaxDf),
         |cand AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM sh x JOIN keep k ON x.sh = k.sh
         |  JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id
         |  HAVING count(*) >= $EditMinShared),
         |pre AS (SELECT doc_id, substr(text, 1, $EditPrefixLen) AS pre FROM documents)
         |SELECT c.a, c.b, CAST(levenshtein(pa.pre, pb.pre) AS BIGINT) AS edit
         |FROM cand c
         |JOIN pre pa ON pa.doc_id = c.a
         |JOIN pre pb ON pb.doc_id = c.b
         |WHERE levenshtein(pa.pre, pb.pre) <= $MaxEdit
         |ORDER BY edit, a, b LIMIT 20""".stripMargin,
    "neardup_minhash" ->
      s"""WITH $duckSignatureCtes
         |SELECT band, bucket, CAST(count(*) AS BIGINT) AS bucket_size
         |FROM bands GROUP BY band, bucket ORDER BY band, bucket""".stripMargin,
    // The 16 equality terms are generated, mirroring the Spark side's
    // per-component comparison of the same portable-family signatures.
    "neardup_minhash_est" ->
      s"""WITH $duckSignatureCtes,
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)
         |SELECT c.a AS a, c.b AS b,
         |  CAST(floor((${(0 until 16).map(j => s"(CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END)").mkString(" + ")})
         |       * 1000000.0 / 16) AS BIGINT) AS est_ppm
         |FROM cand c
         |JOIN sig sa ON c.a = sa.doc_id
         |JOIN sig sb ON c.b = sb.doc_id
         |ORDER BY a, b""".stripMargin,
    // The persisted index is result-transparent (bucket rows round-trip
    // through parquet unchanged), so the twin recomputes both sides'
    // bands and applies the same content-keyed split as
    // dedup_incremental (generated from SampleOps' constants).
    "neardup_minhash_incr" ->
      s"""WITH $duckSignatureCtes,
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN sb < ${SampleOps.TrainPct} THEN 'train'
         |         WHEN sb < ${SampleOps.TrainPct + SampleOps.ValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS sb
         |        FROM documents) t)
         |SELECT DISTINCT n.doc_id AS new_doc, h.doc_id AS old_doc
         |FROM bands n
         |JOIN sp sn ON n.doc_id = sn.doc_id AND sn.split <> 'train'
         |JOIN bands h ON n.band = h.band AND n.bucket = h.bucket
         |JOIN sp sh ON h.doc_id = sh.doc_id AND sh.split = 'train'
         |ORDER BY new_doc, old_doc""".stripMargin,
    "neardup_simhash" -> duckSimhashSql,
    "neardup_simhash_pairs" -> duckSimhashPairsSql,
    "neardup_simhash_incr" -> duckSimhashIncrSql,
    // The streaming band-bucket ingest replayed relationally: every
    // batch's candidates are its bands joined against bands whose
    // batch tag is STRICTLY SMALLER (train seed = -1), exactly the
    // probe-then-append history semantics. bb materializes (referenced
    // as both sides of the self-join).
    "stream_neardup" ->
      s"""WITH $duckSignatureCtes,
         |$duckBatchTagCte,
         |bb AS MATERIALIZED (
         |  SELECT b.doc_id, b.band, b.bucket, g.bt
         |  FROM bands b JOIN tag g USING (doc_id))
         |SELECT DISTINCT n.bt AS batch_id, n.doc_id AS new_doc,
         |  h.doc_id AS old_doc
         |FROM bb n JOIN bb h
         |  ON n.band = h.band AND n.bucket = h.bucket AND h.bt < n.bt
         |WHERE n.bt >= 0
         |ORDER BY batch_id, new_doc, old_doc""".stripMargin,
    "stream_trending" -> duckTrendingSql,
    // The streaming chunk ingest replayed relationally: an instance is
    // FRESH iff its own batch is the chunk hash's first sighting
    // across the train seed (-1) and every stream batch — min(bt) per
    // hash reconstructs the growing index.
    "stream_chunks" ->
      s"""WITH $duckCdcInstCtes,
         |$duckBatchTagCte,
         |si AS MATERIALIZED (
         |  SELECT i.doc_id, i.h, g.bt FROM inst i JOIN tag g USING (doc_id)),
         |f AS (SELECT h, min(bt) AS t0 FROM si GROUP BY h)
         |SELECT si.bt AS batch_id, si.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN f.t0 = si.bt THEN 1 ELSE 0 END) AS BIGINT) AS fresh_chunks,
         |  (CAST(sum(CASE WHEN f.t0 = si.bt THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // CAST(count(*) AS BIGINT) AS fresh_ppm
         |FROM si JOIN f USING (h)
         |WHERE si.bt >= 0
         |GROUP BY si.bt, si.doc_id
         |ORDER BY batch_id, si.doc_id""".stripMargin,
    "neardup_pipeline" ->
      s"""WITH $duckVerifiedCtes
         |SELECT b AS doc_id, min(a) AS keep_as
         |FROM ver GROUP BY b ORDER BY doc_id""".stripMargin,
    // Min reachable label per vertex: the recursive twin of the Spark
    // side's iterative min-label propagation (same unique fixpoint).
    "neardup_groups" ->
      s"""WITH RECURSIVE $duckVerifiedCtes,
         |sym AS (SELECT a AS src, b AS dst FROM ver
         |        UNION ALL SELECT b, a FROM ver),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
         |SELECT src AS doc_id, least(src, min(dst)) AS rep
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""",
    // The whole chunk derivation replayed on DuckDB lists: range(1,n+1)
    // = sequence(1,n), th[s:e] is 1-based inclusive = slice(th,s,e-s+1),
    // boundary hashes are the md5-prefix portable64 (each token hashed
    // once), and chunk identity is the 62-bit double modular fold via
    // list_reduce. Sums CAST to BIGINT before the scaled division (SUM
    // widens to HUGEINT).
    "dedup_cdc" ->
      s"""WITH $duckCdcInstCtes,
         |c AS (SELECT h, count(*) AS c FROM inst GROUP BY h)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
         |  (CAST(sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // count(*) AS dup_ppm
         |FROM inst JOIN c USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // SAME chunk-instance CTEs + the SAME split CASE as
    // dedup_incremental (both generated from SampleOps' constants).
    "dedup_cdc_incr" ->
      s"""WITH $duckCdcInstCtes,
         |s AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < ${SampleOps.TrainPct} THEN 'train'
         |         WHEN bucket < ${SampleOps.TrainPct + SampleOps.ValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          ${duckPortable64("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |        FROM documents) t),
         |si AS (SELECT i.doc_id, i.h, s.split FROM inst i JOIN s USING (doc_id)),
         |hist AS (SELECT DISTINCT h FROM si WHERE split = 'train'),
         |batch AS (SELECT doc_id, h FROM si WHERE split <> 'train')
         |SELECT batch.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN hist.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fresh_chunks,
         |  (CAST(sum(CASE WHEN hist.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // count(*) AS fresh_ppm
         |FROM batch LEFT JOIN hist ON batch.h = hist.h
         |GROUP BY batch.doc_id ORDER BY batch.doc_id""".stripMargin,
    // SAME chunk-instance CTEs as dedup_cdc; the h tie-break is unique
    // per group so the top-k head is fully order-determined.
    "dedup_cdc_cross" ->
      s"""WITH $duckCdcInstCtes
         |SELECT h, count(DISTINCT doc_id) AS n_docs, count(*) AS insts
         |FROM inst GROUP BY h
         |HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, insts DESC, h LIMIT $CdcCrossTopK""".stripMargin,
    "dedup_hash_count" ->
      """SELECT CAST(count(DISTINCT sha256(text)) AS BIGINT) AS distinct_docs
        |FROM documents""".stripMargin,
    "dedup_weights" ->
      """WITH hh AS (SELECT doc_id, sha256(text) AS h FROM documents),
        |c AS (SELECT h, count(*) AS n_copies FROM hh GROUP BY h)
        |SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies,
        |  1000000 // CAST(n_copies AS BIGINT) AS weight_ppm
        |FROM hh JOIN c USING (h) ORDER BY doc_id""".stripMargin,
    // The bloom filter is a deterministic artifact (salted portable64
    // positions, fixed geometry), so build + probe + FP audit all carry
    // an exact value oracle; the range table stands in for the k probes.
    "dedup_bloom" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    ${SampleOps.duckSplitCase(SampleOps.duckBucket("doc_id"))} AS split,
         |    ${duckPortable64("text")} AS h
         |  FROM documents),
         |hist AS (SELECT DISTINCT h FROM d WHERE split = 'train'),
         |pos AS (
         |  SELECT h,
         |    ${duckPortable64("concat('bf', CAST(r.range AS VARCHAR), ':', CAST(h AS VARCHAR))")}
         |      % $BloomBits AS p
         |  FROM hist, range(0, $BloomProbes) r),
         |words AS (
         |  SELECT p // 32 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
         |  FROM pos GROUP BY p // 32),
         |batch AS (SELECT doc_id, h FROM d WHERE split <> 'train'),
         |bp AS (
         |  SELECT doc_id, h,
         |    ${duckPortable64("concat('bf', CAST(r.range AS VARCHAR), ':', CAST(h AS VARCHAR))")}
         |      % $BloomBits AS p
         |  FROM batch, range(0, $BloomProbes) r),
         |mb AS (
         |  SELECT bp.doc_id, bp.h,
         |    min(CASE WHEN words.bits IS NOT NULL
         |          AND (words.bits & (CAST(1 AS BIGINT) << CAST(bp.p % 32 AS INT))) != 0
         |        THEN 1 ELSE 0 END) AS maybe
         |  FROM bp LEFT JOIN words ON bp.p // 32 = words.word
         |  GROUP BY bp.doc_id, bp.h),
         |t AS (
         |  SELECT mb.maybe, CASE WHEN hist.h IS NULL THEN 0 ELSE 1 END AS dup
         |  FROM mb LEFT JOIN hist ON mb.h = hist.h)
         |SELECT CAST(count(*) AS BIGINT) AS batch_docs,
         |  CAST(sum(maybe) AS BIGINT) AS flagged,
         |  CAST(sum(dup) AS BIGINT) AS true_dups,
         |  CAST(sum(CASE WHEN maybe = 1 AND dup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
         |  (CAST(sum(CASE WHEN maybe = 1 AND dup = 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // greatest(CAST(count(*) AS BIGINT) - CAST(sum(dup) AS BIGINT), 1) AS fp_ppm
         |FROM t""".stripMargin,
    // Split CASE generated from SampleOps' constants; hashes are only
    // ever compared engine-internally (anti-join within one engine), so
    // the check is representation-independent by construction.
    "dedup_incremental" ->
      s"""WITH d AS (
         |  SELECT doc_id, sha256(text) AS h,
         |    CASE WHEN bucket < ${SampleOps.TrainPct} THEN 'train'
         |         WHEN bucket < ${SampleOps.TrainPct + SampleOps.ValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text,
         |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
         |        FROM documents) t)
         |SELECT doc_id FROM d
         |WHERE split <> 'train'
         |  AND h NOT IN (SELECT h FROM d WHERE split = 'train')
         |ORDER BY doc_id""".stripMargin,
    // Every-position span fold recomputed via list_reduce over each
    // window slice — seeded 0, so the first step reduces to h % mod,
    // matching spanHashesOf's seed exactly.
    "dedup_spans" -> {
      s"""WITH $duckTokenHashCtes,
         |sp AS (
         |  SELECT doc_id, unnest(${duckSpanList(SpanTokens)}) AS h
         |  FROM tho),
         |c AS (SELECT h, count(*) AS c FROM sp GROUP BY h)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
         |  (CAST(sum(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // CAST(count(*) AS BIGINT) AS dup_ppm
         |FROM sp JOIN c USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // Suffix-doubling twin: the SAME Manber-Myers construction with
    // dense_rank windows (identical dense values by construction: same
    // key multisets, same order, same rank-0 pad), the same
    // (r, doc_id, pos) suffix order, the same nearest-different-doc
    // neighbor rule via lag + running head markers, the same 6-round
    // LCP descent, and the same remaining-length cap. Every
    // multi-referenced CTE is MATERIALIZED.
    "dedup_longest_span" ->
      s"""WITH $duckLcpRunCtes
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(max(run) AS BIGINT) AS longest_run,
         |  CAST(sum(CASE WHEN run > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_positions
         |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The surgery twin shares the WHOLE suffix chain verbatim, adds
    // the same coverage window (running max of run ends over position
    // order, runs >= StripRunK only), and rebuilds the kept tokens in
    // order — coalesce('') because DuckDB's string_agg over zero kept
    // tokens is NULL while Spark's array_join of an empty array is ''.
    "dedup_span_strip" ->
      s"""WITH $duckLcpRunCtes,
         |tokpos AS MATERIALIZED (
         |  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
         |    unnest(tk) AS tok
         |  FROM toks),
         |cov AS MATERIALIZED (
         |  SELECT t.doc_id, t.pos, t.tok,
         |    max(CASE WHEN r.run >= $StripRunK THEN r.pos + r.run END)
         |      OVER (PARTITION BY t.doc_id ORDER BY t.pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
         |  FROM tokpos t
         |  JOIN runs r ON r.doc_id = t.doc_id AND r.pos = t.pos),
         |kept AS (
         |  SELECT doc_id, pos, tok,
         |    (cv IS NULL OR cv <= pos) AS keep
         |  FROM cov)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_removed,
         |  coalesce(string_agg(CASE WHEN keep THEN tok END, ' '
         |    ORDER BY pos), '') AS cleaned
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The persisted span index is result-transparent (distinct BIGINTs
    // round-trip parquet unchanged), so the twin recomputes both sides
    // from raw text with the same split CASE — index-persist + probe ≡
    // direct, gated exact.
    "dedup_spans_incr" -> {
      s"""WITH $duckTokenHashCtes,
         |sp AS (
         |  SELECT doc_id, unnest(${duckSpanList(SpanTokens)}) AS h
         |  FROM tho),
         |s AS (
         |  SELECT doc_id,
         |    CASE WHEN bucket < ${SampleOps.TrainPct} THEN 'train'
         |         WHEN bucket < ${SampleOps.TrainPct + SampleOps.ValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |          ${duckPortable64("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
         |        FROM documents) t),
         |si AS (SELECT sp.doc_id, sp.h, s.split FROM sp JOIN s USING (doc_id)),
         |hist AS (SELECT DISTINCT h FROM si WHERE split = 'train'),
         |batch AS (SELECT doc_id, h FROM si WHERE split <> 'train')
         |SELECT batch.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN hist.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS seen_spans,
         |  (CAST(sum(CASE WHEN hist.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // count(*) AS seen_ppm
         |FROM batch LEFT JOIN hist ON batch.h = hist.h
         |GROUP BY batch.doc_id ORDER BY batch.doc_id""".stripMargin
    },
    // The index summary recomputed from raw text: the Spark side reads
    // the freshly-written parquet artifact back, so a green row proves
    // the persisted index's content equals the direct derivation.
    "neardup_index" ->
      s"""WITH $duckDistinctShingleCtes,
        |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM sh) AS n_entries,
        |  (SELECT CAST(count(*) AS BIGINT) FROM df) AS n_shingles,
        |  (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM sh) AS n_docs,
        |  (SELECT CAST(max(df) AS BIGINT) FROM df) AS max_df,
        |  (SELECT CAST(count(*) FILTER (WHERE df > $JaccardMaxDf) AS BIGINT) FROM df)
        |    AS hot_shingles""".stripMargin,
    // `keep` mirrors the Spark side's JaccardMaxDf stoplist (generated
    // from the same constant): hot shingles contribute to n_sh but never
    // to the pair expansion, on both engines identically.
    "neardup_jaccard" ->
      s"""WITH $duckDistinctShingleCtes,
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |keep AS (SELECT sh FROM sh GROUP BY sh
        |         HAVING count(*) > 1 AND count(*) <= $JaccardMaxDf),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM sh x JOIN keep k ON x.sh = k.sh
        |  JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT a, b, inter,
        |  CAST(floor(inter * 1000000.0 / (sa.n_sh + sb.n_sh - inter)) AS BIGINT) AS j_ppm
        |FROM inter
        |JOIN sizes sa ON a = sa.doc_id
        |JOIN sizes sb ON b = sb.doc_id
        |ORDER BY j_ppm DESC, a, b LIMIT 20""".stripMargin,
    // Identical pair expansion and stoplist as neardup_jaccard; only the
    // final ratio differs (intersection over the SMALLER set).
    "neardup_containment" ->
      s"""WITH $duckDistinctShingleCtes,
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |keep AS (SELECT sh FROM sh GROUP BY sh
        |         HAVING count(*) > 1 AND count(*) <= $JaccardMaxDf),
        |inter AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
        |  FROM sh x JOIN keep k ON x.sh = k.sh
        |  JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT a, b, inter,
        |  CAST(floor(inter * 1000000.0 / least(sa.n_sh, sb.n_sh)) AS BIGINT) AS cont_ppm
        |FROM inter
        |JOIN sizes sa ON a = sa.doc_id
        |JOIN sizes sb ON b = sb.doc_id
        |ORDER BY cont_ppm DESC, a, b LIMIT 20""".stripMargin,
  )
}
