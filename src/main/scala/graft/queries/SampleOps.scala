package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling and split assignment for a training-data
  * pipeline (SURVEY.md §2.4 adjunct). Everything keys off a CONTENT-
  * DERIVED hash bucket, never `rand()`: reruns, retries, and
  * late-arriving data land in the same split/sample on any cluster
  * topology, which is the property that matters when the corpus is
  * 100 TB and the job restarts — and it is what makes these queries
  * oracle-checkable at all. Each operator is a narrow map-side
  * predicate/projection (no shuffle beyond the final count), so it
  * composes for free in front of any downstream pipeline stage.
  */
object SampleOps {

  /** Stable per-document bucket in [0, 100): the portable 60-bit md5
    * hash of the decimal doc_id, mod 100 (positive on both engines).
    * Production would hash a content fingerprint instead of the id;
    * the shape is identical.
    */
  def bucketOf(id: Column): Column =
    DedupOps.portable64(id.cast("string")) % 100

  val TrainPct = 80
  val ValidPct = 10 // test gets the remaining 10

  /** The split CASE over a bucket column — the ONE Spark-side encoding
    * of the train/valid/test thresholds (mirrored in SQL by
    * [[duckSplitCase]]); every family splitting on a different id
    * column applies this to its own [[bucketOf]] result.
    */
  def splitOf(bucket: Column): Column =
    when(bucket < TrainPct, lit("train"))
      .when(bucket < TrainPct + ValidPct, lit("valid"))
      .otherwise(lit("test"))

  /** Deterministic train/valid/test assignment from the hash bucket. */
  def withSplit(docs: DataFrame): DataFrame =
    docs.withColumn("bucket", bucketOf(col("doc_id")))
      .withColumn("split", splitOf(col("bucket")))

  /** Registered query: per-(lang, split) document and token volumes —
    * the summary a pipeline owner checks before training (split sizes
    * drift-free across reruns because the assignment is content-keyed).
    */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    withSplit(Tables.documents(spark, dir))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("docs"),
        sum(size(TextOps.tokens(col("text")))).cast("long").as("tokens"))
      .orderBy("lang", "split")

  /** LEAKAGE-SAFE splits — group holdout over verified near-dup
    * components. [[withSplit]] hashes each doc INDEPENDENTLY, so two
    * near-identical documents can land on opposite sides of the
    * train/test line and the held-out set silently overlaps the
    * training set — the classic eval-contamination failure the plain
    * split cannot see. Here the split key is the near-dup COMPONENT
    * representative (the `neardup_groups` outcome; singletons key on
    * themselves), so every verified duplicate cluster lands wholly in
    * one split by construction. `plain_split` rides along per doc to
    * expose exactly which docs the naive assignment would have leaked.
    *
    * Scale shape: the component labels come from the PERSISTED
    * clustering artifact (`neardup_groups` is the measured rebuild —
    * see [[DedupOps.groupLabels]]), a tiny frame (only docs in
    * verified pairs) that BROADCASTS onto the documents scan; the
    * split itself stays a map-side hash of the coalesced key, so at
    * 100 TB this is one scan + one broadcast join, no shuffle. Exact
    * value oracle: the recursive-components CTEs composed with the
    * same md5 bucket + split CASE, both generated from the shared
    * constants.
    */
  def groupedSplits(spark: SparkSession, dir: String): DataFrame =
    groupedSplitsOf(Tables.documents(spark, dir),
      DedupOps.groupLabels(spark, dir))

  /** [[groupedSplits]]' assignment over arbitrary docs and `(doc_id,
    * rep)` labels (exposed for tests, which plant a component whose
    * members' plain splits disagree).
    */
  private[queries] def groupedSplitsOf(docs: DataFrame, labels: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(broadcast(labels.select(col("doc_id"), col("rep"))), Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("split_key"),
        splitOf(bucketOf(coalesce(col("rep"), col("doc_id")))).as("split"),
        splitOf(bucketOf(col("doc_id"))).as("plain_split"),
        col("rep").isNotNull.as("in_component"))
      .orderBy("doc_id")

  /** Per-language keep-rate (percent) for corpus rebalancing: the
    * dominant language is downsampled hard, the rest lightly — the
    * standard mixture-shaping move before training. Literal rates here;
    * production would read them from a small broadcast config dim.
    */
  val RebalanceRates: Seq[(String, Int)] =
    Seq("en" -> 25, "de" -> 75, "es" -> 75, "fr" -> 75, "zh" -> 75)
  val DefaultRate = 100

  private def rateOf(lang: Column): Column =
    RebalanceRates.foldRight(lit(DefaultRate): Column) { case ((l, r), acc) =>
      when(lang === l, lit(r)).otherwise(acc)
    }

  /** Target TOKEN shares (ppm, sums to 1e6) per language for
    * [[mixture]] — the distribution the training run wants, vs
    * whatever the crawl produced.
    */
  val MixtureTargets: Seq[(String, Long)] =
    Seq("en" -> 400000L, "de" -> 150000L, "es" -> 150000L,
      "fr" -> 150000L, "zh" -> 150000L)

  /** The target-share CASE, one SQL text for BOTH engines (Spark
    * selectExpr and the DuckDB oracle parse it identically).
    */
  private[queries] def targetCaseSql: String =
    "CASE lang " + MixtureTargets.map { case (l, p) =>
      s"WHEN '$l' THEN CAST($p AS BIGINT)"
    }.mkString(" ") + " ELSE CAST(0 AS BIGINT) END"

  /** Domain-mixture reweighting (the DoReMi-style STATIC reweight every
    * pretraining pipeline runs before sampling): per language, the
    * corpus's actual token share vs the target share, the sampling
    * weight that closes the gap (`weight_ppm` > 1e6 = the domain must
    * be upsampled / seen for more than one epoch), and the token budget
    * the target allocates to it when resampling the corpus to its own
    * size. Tokens are counted with the exact [[TextOps.tokens]]
    * spelling the oracle mirrors; all shares are integer-ppm
    * (multiply-first `div` — exact cross-engine on non-negative
    * BIGINT; the 1e6 product bounds Σtokens at ~9e12, beyond which
    * the ppm math moves to DECIMAL). One scan, one 5-row aggregate —
    * the per-group frame is latency-, not data-scale; the weight math
    * is driver-trivial at any corpus size.
    */
  def mixture(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("t"))
      .groupBy("lang").agg(sum("t").as("tokens"))
      .filter(col("tokens") > 0)
      .localCheckpoint() // 5 rows, referenced twice (per-lang + total)
    val total = toks.agg(sum("tokens").as("total"))
    toks.crossJoin(broadcast(total))
      .selectExpr(
        "lang", "tokens",
        s"$targetCaseSql AS target_ppm",
        "tokens * 1000000 div total AS actual_ppm",
        // target/actual in ONE division: target_ppm · total / tokens —
        // no nested div, no zero-denominator risk for a present lang.
        s"($targetCaseSql) * total div tokens AS weight_ppm",
        s"total * ($targetCaseSql) div 1000000 AS alloc_tokens")
      .orderBy("lang")
  }

  /** Registered query: language-rebalanced corpus — keep a document iff
    * its bucket clears the language's rate, then count the surviving
    * mixture. One scan, one predicate, one count shuffle; the sample
    * itself (the filtered frame) is what a real pipeline would feed
    * downstream.
    */
  def rebalance(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(bucketOf(col("doc_id")) < rateOf(col("lang")))
      .groupBy("lang")
      .agg(count(lit(1)).as("kept"))
      .orderBy("lang")

  /** Doc-frequency stoplist for the decontamination join —
    * [[DedupOps.JaccardMaxDf]] applied to contamination: a trigram
    * present in more than this many documents (df measured over the
    * WHOLE corpus the decontam runs on, all splits, before any cut) is
    * boilerplate ("all rights reserved", headers), not benchmark
    * leakage, and matching on it would (a) drag a corpus-sized posting
    * list through the semi join — the one skewed key that breaks the
    * shuffle at 100 TB — and (b) flag essentially every train document
    * as contaminated. Dropping hot shingles bounds every posting list
    * at the constant and leaves the decision to the rare, discriminative
    * trigrams real decontamination keys on. The oracle SQL applies the
    * identical cap (generated from this constant), so both engines
    * agree exactly.
    */
  val DecontamMaxDf = 50

  /** Train-split doc_ids sharing any sub-stoplist shingle with the test
    * split. `base` carries (doc_id, split, shset); shared by the
    * [[decontam]] audit and the [[corpusPipeline]] drop so the two stay
    * one implementation. One aggregation on the shingle key produces
    * both halves of the probe-set decision — the corpus doc frequency
    * (`shset` is a set, so count(*) counts documents) and test-split
    * membership — then the train side semi-joins the bounded probe set.
    * explode_outer + isNotNull (not plain explode): keeps
    * InferFiltersFromGenerate from re-inlining the shingle tree into a
    * scan-level filter — see DedupOps.shingleSetWithSize.
    */
  private[queries] def testContaminatedTrainDocs(base: DataFrame): DataFrame = {
    val sh = base
      .select(col("doc_id"), col("split"), explode_outer(col("shset")).as("sh"))
      .filter(col("sh").isNotNull)
    val probe = sh.groupBy("sh")
      .agg(count(lit(1)).as("df"),
        max(when(col("split") === "test", 1).otherwise(0)).as("in_test"))
      .filter(col("df") <= DecontamMaxDf && col("in_test") === 1)
      .select("sh")
    sh.filter(col("split") === "train")
      .select("doc_id", "sh")
      .join(probe, Seq("sh"), "left_semi")
      .select("doc_id").distinct()
  }

  /** Benchmark-decontamination audit: which train-split documents share
    * any word trigram with the test split. The shape is the scale-safe
    * one — explode both sides to (doc, shingle), semi-join on the
    * shingle key, never document-pairs — so the cost is one shuffle on
    * shingles regardless of corpus size, and the [[DecontamMaxDf]]
    * doc-frequency stoplist bounds every posting list crossing the join
    * (the same key distribution and the same cap discipline the Jaccard
    * near-dup query applies). Catalyst prunes the shingle computation
    * out of the counting branch, so shingles are computed exactly once
    * per document across the uses of `base`.
    */
  def decontam(spark: SparkSession, dir: String): DataFrame = {
    // Shingle identity is the fold of per-token portable hashes (the
    // DedupOps.trigramHashesOf contract: one md5 per token, 8-byte
    // join keys), with toks and th each bound to an attribute before
    // multi-reference consumption.
    val base = withSplit(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("split"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("split"),
        transform(col("toks"), t => DedupOps.portable64(t)).as("th"))
      .select(col("doc_id"), col("lang"), col("split"),
        array_distinct(DedupOps.trigramHashesOf(col("th"))).as("shset"))
    val train = base.filter(col("split") === "train")
    val contaminated = testContaminatedTrainDocs(base)
    train.join(contaminated.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("train_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("contaminated"))
      .orderBy("lang")
  }

  /** Tokens per training shard (tiny for the harness corpus; production
    * would use ~2^20+ and the identical plan).
    */
  val ShardTokenBudget = 4000L

  /** Training-shard packing: assign train-split documents to fixed
    * token-budget shards by cumulative token count, then report each
    * shard's document and token load. The running sum is a window over
    * (lang, bucket) ordered by doc_id — partitioned that way because a
    * window partition materializes on one executor, so the partition
    * key must bound its size: (lang, hash-bucket) caps every window at
    * ~1% of a language regardless of corpus scale, where a lang-only
    * window would concentrate the dominant language on one task. A doc
    * straddling a boundary belongs to the shard its first token falls
    * in (floor((cum - toks) / budget)) — exactly how sequence packing
    * places documents into fixed-length training rows.
    */
  def packShards(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withSplit(Tables.documents(spark, dir))
      .filter(col("split") === "train")
      .select(col("doc_id"), col("lang"), col("bucket"),
        size(TextOps.tokens(col("text"))).cast("long").as("toks"))
      .withColumn("cum", sum("toks").over(w))
      .withColumn("shard", floor((col("cum") - col("toks")) / ShardTokenBudget).cast("long"))
      .groupBy("lang", "bucket", "shard")
      .agg(count(lit(1)).as("docs"), sum("toks").as("tokens"))
      .orderBy("lang", "bucket", "shard")
  }

  /** Sample size for [[reservoir]]. */
  val ReservoirK = 50

  /** Deterministic fixed-size corpus sample: the [[ReservoirK]] documents
    * with the smallest salted content hash — the distributed, rerun-
    * stable equivalent of reservoir sampling (every row competes
    * independently; the winners are a pure function of the corpus, not
    * of partitioning or arrival order). Plans as TakeOrderedAndProject:
    * each partition forwards ≤ k rows, no global sort, no RNG, no
    * coordination; appended data can only replace winners, never
    * arbitrarily reshuffle the survivors. The salt decorrelates the
    * sample from the split assignment, which hashes the same id.
    */
  def reservoir(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        DedupOps.portable64(concat(lit("rsv:"), col("doc_id").cast("string"))).as("h"))
      .orderBy("h", "doc_id")
      .limit(ReservoirK)

  /** Sample size per language for [[stratified]]. */
  val StratifiedK = 10

  /** Stratified exact-k sampling: the [[StratifiedK]] lowest-hash
    * documents of EVERY language — [[reservoir]]'s determinism contract
    * (content-keyed hash order, rerun-stable) applied per stratum, built
    * the scale-correct way: the bounded
    * [[graft.functions.TopKAgg]] forwards ≤ k rows per language per
    * partition, so the shuffle carries O(langs × k × partitions) rows
    * where a per-language window would sort corpus-sized partitions
    * (the dominant language IS most of the corpus). Hashes fold to 2^50
    * so the aggregator's double scores stay integer-exact; the sign
    * flip turns its (score desc, key asc) order into (hash asc, doc_id
    * asc), which is exactly the oracle's row_number order.
    */
  def stratified(spark: SparkSession, dir: String): DataFrame = {
    val topk = graft.functions.TopKAgg.asUdaf(StratifiedK)
    val agg = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        pmod(DedupOps.portable64(concat(lit("strat:"), col("doc_id").cast("string"))),
          lit(1L << 50)).as("h"))
      .groupBy("lang")
      .agg(topk((-col("h")).cast("double"), col("doc_id")).as("top"))
    graft.functions.TopKAgg.exploded(agg, "top", Seq("lang"))
      .select(col("lang"), col("rank"), col("key").as("doc_id"),
        (-col("score")).cast("long").as("h"))
      .orderBy("lang", "rank")
  }

  /** Sample size for [[weighted]]. */
  val WeightedK = 30

  /** Deterministic weighted priority sample: each document's priority
    * is its salted content hash divided by its weight (n_chars), and
    * the [[WeightedK]] smallest priorities win — integer-exact priority
    * sampling where a document's chance of winning scales with its
    * weight (the hash is uniform, so hash/w clears any fixed threshold
    * w times as often), but the decision stays a pure function of the
    * corpus like [[reservoir]]: no RNG, rerun-stable, appendable.
    * Same TakeOrderedAndProject posture — each partition forwards ≤ k
    * rows, no global sort. The weight guard `greatest(w, 1)` keeps
    * zero-length documents sampleable rather than dividing by zero.
    */
  def weighted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        DedupOps.portable64(concat(lit("wt:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("pri", expr("h div greatest(n_chars, 1L)"))
      .select("doc_id", "lang", "n_chars", "pri")
      .orderBy("pri", "doc_id")
      .limit(WeightedK)

  /** Temperature exponent numerator for [[temperature]]: expected kept
    * docs per language ≈ TempK·√count, i.e. the α = 0.5 point of the
    * `p_s ∝ count^α` mixture-smoothing family multilingual LM training
    * uses (α = 1 keeps the raw skew, α = 0 is uniform). α is pinned to
    * 0.5 deliberately: `sqrt` is correctly rounded under IEEE-754 on
    * every engine, so the Spark and DuckDB rate computations are
    * bit-identical, where a general `pow(c, α)` carries no such
    * guarantee and could flip the floor on a boundary value.
    */
  val TempK = 8

  /** Registered query: temperature-based language mixing with
    * DATA-DERIVED rates — unlike [[rebalance]]'s fixed literal rates,
    * each language's keep-rate is computed from its observed document
    * count (rate_ppm = 10⁶·[[TempK]]/√count, capped at 10⁶), so the
    * dominant language is downsampled hard and rare languages pass
    * through, flattening the mixture toward `count^0.5` without any
    * hand-tuned table. The keep decision is the same content-keyed hash
    * predicate every sampler here uses (rerun-stable, no RNG).
    *
    * Scale shape: the rate dim is one row per language (a constant-size
    * aggregate) broadcast back to the scan — the corpus-side work is a
    * map-side predicate plus one count shuffle, identical at 100 TB.
    */
  def temperature(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        pmod(DedupOps.portable64(concat(lit("temp:"), col("doc_id").cast("string"))),
          lit(1000000L)).as("hp"))
    val rates = d.groupBy("lang").agg(count(lit(1)).as("docs"))
      .withColumn("rate_ppm",
        least(lit(1000000L),
          floor(lit(1000000.0) * TempK / sqrt(col("docs").cast("double")))))
    d.join(broadcast(rates), "lang")
      .groupBy("lang", "docs", "rate_ppm")
      .agg(sum(when(col("hp") < col("rate_ppm"), 1L).otherwise(0L)).as("kept"))
      .orderBy("lang")
  }

  /** The END-TO-END training-corpus materialization — the four stages a
    * real pipeline chains, composed into ONE Spark DAG so Catalyst
    * plans them together: (1) exact content dedup keeping the min-id
    * representative per sha256 (hash group-by + semi join); (2) the
    * [[TextOps.corpusFilter]] quality gate (scan-local predicates,
    * shared constants); (3) content-hash split assignment
    * ([[withSplit]]); (4) train←test trigram decontamination — the
    * DROP action whose audit form is [[decontam]] — via the same
    * shingle-key semi join. Output is the per-(lang, split) doc/token
    * summary of the surviving corpus. Every stage is a shuffle-on-key
    * or scan-local shape (no all-pairs anywhere), and every constant
    * (hash, stopwords, split percentages, shingle width) is the SAME
    * Scala value its standalone query uses, so the composed oracle
    * cannot drift from the per-stage ones.
    */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rep = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val dd = docs.join(rep.select("doc_id"), Seq("doc_id"), "left_semi")
    val q = TextOps.withGateCounts(dd).filter(TextOps.gateKeep)
    // Bind toks, then the per-token hash array, each to an attribute
    // BEFORE the trigram HOF consumes it via three slice refs — the
    // same move DedupOps.hashedTokens makes, measured ~2× on the
    // shingle stage.
    val base = withSplit(q)
      .select(col("doc_id"), col("lang"), col("split"), col("tok_cnt"),
        TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang"), col("split"), col("tok_cnt"),
        transform(col("toks"), t => DedupOps.portable64(t)).as("th"))
      .select(col("doc_id"), col("lang"), col("split"), col("tok_cnt"),
        array_distinct(DedupOps.trigramHashesOf(col("th"))).as("shset"))
    base.join(testContaminatedTrainDocs(base), Seq("doc_id"), "left_anti")
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("docs"), sum("tok_cnt").as("tokens"))
      .orderBy("lang", "split")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_reservoir" -> (reservoir _),
    "sample_stratified" -> (stratified _),
    "sample_weighted" -> (weighted _),
    "sample_splits" -> (splitCounts _),
    "sample_splits_grouped" -> (groupedSplits _),
    "sample_rebalance" -> (rebalance _),
    "sample_mixture" -> (mixture _),
    "sample_temperature" -> (temperature _),
    "sample_decontam" -> (decontam _),
    "sample_shards" -> (packShards _),
    "pipeline_corpus" -> (corpusPipeline _),
  )

  // DuckDB twins, generated from the same constants (portable64 is the
  // shared md5 bridge — see DedupOps). duckBucket/duckSplitCase are
  // package-visible so other families splitting on a different id
  // column (VectorQueries' embedding decontam) render the SAME SQL.
  private[queries] def duckBucket(id: String): String =
    s"CAST(concat('0x', substr(md5(CAST($id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  /** The split CASE over a bucket expression, generated from the same
    * [[TrainPct]]/[[ValidPct]] the Spark side uses.
    */
  private[queries] def duckSplitCase(bucket: String): String =
    s"CASE WHEN $bucket < $TrainPct THEN 'train' " +
      s"WHEN $bucket < ${TrainPct + ValidPct} THEN 'valid' ELSE 'test' END"

  private val duckRate: String =
    RebalanceRates.foldRight(DefaultRate.toString) { case ((l, r), acc) =>
      s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }

  // lazy: the grouped-splits entry references DedupOps.duckVerifiedCtes
  // while DedupOps' own init references SampleOps' split constants — an
  // eager val here would splice a null mid-initialization-cycle.
  lazy val oracle: Map[String, String] = Map(
    // Same salted portable hash; the doc_id tie-break keeps the top-k
    // fully order-determined on both engines.
    "sample_stratified" ->
      s"""WITH h AS (
         |  SELECT lang, doc_id,
         |    CAST(concat('0x', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |      % ${1L << 50} AS h
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, h,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
         |  FROM h)
         |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, h
         |FROM r WHERE rank <= $StratifiedK ORDER BY lang, rank""".stripMargin,
    // The composed pipeline: each CTE is the standalone stage's oracle
    // with the same shared constants (sha256 dedup, quality thresholds,
    // split CASE, trigram shingles).
    "pipeline_corpus" ->
      s"""WITH rep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
         |dd AS (SELECT d.* FROM documents d JOIN rep USING (doc_id)),
         |q AS (
         |  SELECT doc_id, lang, text, tok_cnt FROM (
         |    SELECT doc_id, lang, text, n_chars,
         |      ${TextOps.duckGateCounts}
         |    FROM dd) x
         |  WHERE ${TextOps.duckGateKeep}),
         |s AS (
         |  SELECT doc_id, lang, text, tok_cnt,
         |    CASE WHEN bucket < $TrainPct THEN 'train'
         |         WHEN bucket < ${TrainPct + ValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT q.*, ${duckBucket("doc_id")} AS bucket FROM q) b),
         |toksv AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |  FROM s),
         |thov AS (
         |  SELECT doc_id, list_transform(tk, t -> ${DedupOps.duckPortable64("t")}) AS th
         |  FROM toksv),
         |sh AS (
         |  SELECT DISTINCT doc_id, unnest(${DedupOps.duckShingleList}) AS sh
         |  FROM thov),
         |probe AS (
         |  SELECT x.sh FROM sh x JOIN s USING (doc_id)
         |  GROUP BY x.sh
         |  HAVING count(*) <= $DecontamMaxDf
         |     AND max(CASE WHEN s.split = 'test' THEN 1 ELSE 0 END) = 1),
         |cont AS (
         |  SELECT DISTINCT x.doc_id FROM sh x
         |  JOIN s USING (doc_id)
         |  JOIN probe t ON x.sh = t.sh
         |  WHERE s.split = 'train')
         |SELECT lang, split, count(*) AS docs, CAST(sum(tok_cnt) AS BIGINT) AS tokens
         |FROM s
         |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars,
         |  CAST(concat('0x', substr(md5('wt:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |    // greatest(n_chars, 1) AS pri
         |FROM documents
         |ORDER BY pri, doc_id LIMIT $WeightedK""".stripMargin,
    "sample_reservoir" ->
      s"""SELECT doc_id, lang,
         |  CAST(concat('0x', substr(md5('rsv:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
         |FROM documents
         |ORDER BY h, doc_id LIMIT $ReservoirK""".stripMargin,
    "sample_splits" ->
      s"""WITH b AS (
         |  SELECT lang, text, ${duckBucket("doc_id")} AS bucket FROM documents)
         |SELECT lang,
         |  CASE WHEN bucket < $TrainPct THEN 'train'
         |       WHEN bucket < ${TrainPct + ValidPct} THEN 'valid'
         |       ELSE 'test' END AS split,
         |  count(*) AS docs,
         |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS tokens
         |FROM b GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    // The neardup_groups recursive-components CTEs (DedupOps, shared
    // text) composed with the SAME bucket/split CASE as sample_splits —
    // the oracle recomputes components from raw text, so the green row
    // gates stored-labels + broadcast probe ≡ direct recomputation.
    "sample_splits_grouped" ->
      s"""WITH RECURSIVE ${DedupOps.duckVerifiedCtes},
         |sym AS (SELECT a AS src, b AS dst FROM ver
         |        UNION ALL SELECT b, a FROM ver),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
         |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS rep
         |        FROM reach GROUP BY src)
         |SELECT d.doc_id,
         |  coalesce(l.rep, d.doc_id) AS split_key,
         |  ${duckSplitCase(duckBucket("coalesce(l.rep, d.doc_id)"))} AS split,
         |  ${duckSplitCase(duckBucket("d.doc_id"))} AS plain_split,
         |  (l.rep IS NOT NULL) AS in_component
         |FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "sample_rebalance" ->
      s"""SELECT lang, count(*) AS kept FROM documents
         |WHERE ${duckBucket("doc_id")} < ($duckRate)
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // The SAME CASE text Spark's selectExpr parses; integer ppm
    // multiply-first div is exact cross-engine on non-negative BIGINT.
    "sample_mixture" ->
      s"""WITH t AS MATERIALIZED (
         |  SELECT lang,
         |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
         |      AS tokens
         |  FROM documents GROUP BY lang HAVING sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) > 0),
         |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM t)
         |SELECT lang, tokens,
         |  $targetCaseSql AS target_ppm,
         |  CAST(tokens * 1000000 // total AS BIGINT) AS actual_ppm,
         |  CAST(($targetCaseSql) * total // tokens AS BIGINT) AS weight_ppm,
         |  CAST(total * ($targetCaseSql) // 1000000 AS BIGINT) AS alloc_tokens
         |FROM t, tot ORDER BY lang""".stripMargin,
    // sqrt is IEEE-exact on both engines (see TempK), so the floor'd
    // ppm rate and therefore the integer kept counts match bit-for-bit.
    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS docs FROM documents GROUP BY lang),
         |r AS (
         |  SELECT lang, docs,
         |    least(1000000, CAST(floor(1000000.0 * $TempK / sqrt(CAST(docs AS DOUBLE))) AS BIGINT))
         |      AS rate_ppm
         |  FROM c)
         |SELECT r.lang, r.docs, r.rate_ppm,
         |  CAST(sum(CASE WHEN CAST(concat('0x', substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |                     % 1000000 < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT) AS kept
         |FROM documents d JOIN r ON d.lang = r.lang
         |GROUP BY r.lang, r.docs, r.rate_ppm
         |ORDER BY r.lang""".stripMargin,
    // Same trigram CTEs as the Jaccard oracle, same split CASE as
    // sample_splits — both generated from the shared constants.
    "sample_decontam" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, text,
         |    CASE WHEN bucket < $TrainPct THEN 'train'
         |         WHEN bucket < ${TrainPct + ValidPct} THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM (SELECT doc_id, lang, text, ${duckBucket("doc_id")} AS bucket
         |        FROM documents) t),
         |toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
         |  FROM b),
         |tho AS (
         |  SELECT doc_id, list_transform(tk, t -> ${DedupOps.duckPortable64("t")}) AS th
         |  FROM toks),
         |sh AS (
         |  SELECT DISTINCT doc_id, unnest(${DedupOps.duckShingleList}) AS sh
         |  FROM tho),
         |probe AS (
         |  SELECT s.sh FROM sh s JOIN b USING (doc_id)
         |  GROUP BY s.sh
         |  HAVING count(*) <= $DecontamMaxDf
         |     AND max(CASE WHEN b.split = 'test' THEN 1 ELSE 0 END) = 1),
         |cont AS (
         |  SELECT DISTINCT s.doc_id FROM sh s
         |  JOIN b USING (doc_id)
         |  JOIN probe t ON s.sh = t.sh
         |  WHERE b.split = 'train')
         |SELECT b.lang, count(*) AS train_docs,
         |  CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS contaminated
         |FROM b LEFT JOIN cont c USING (doc_id)
         |WHERE b.split = 'train'
         |GROUP BY b.lang ORDER BY b.lang""".stripMargin,
    "sample_shards" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, ${duckBucket("doc_id")} AS bucket,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS toks
         |  FROM documents
         |  WHERE ${duckBucket("doc_id")} < $TrainPct),
         |c AS (
         |  SELECT lang, bucket, toks,
         |    sum(toks) OVER (PARTITION BY lang, bucket ORDER BY doc_id
         |                    ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM b)
         |SELECT lang, bucket,
         |  CAST(floor((cum - toks) / $ShardTokenBudget.0) AS BIGINT) AS shard,
         |  count(*) AS docs, CAST(sum(toks) AS BIGINT) AS tokens
         |FROM c GROUP BY lang, bucket, shard ORDER BY lang, bucket, shard""".stripMargin,
  )
}
