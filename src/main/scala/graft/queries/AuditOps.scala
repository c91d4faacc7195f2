package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-governance audits (SURVEY.md §2.4 adjunct): the constraint and
  * privacy checks a pipeline owner runs before a corpus or a star
  * schema is allowed downstream. Both queries reduce the full input to
  * a constant-size report, so their 100 TB posture is the best
  * possible: scans with partial aggregation and nothing corpus-sized
  * past the exchange.
  */
object AuditOps {

  /** Declarative data-quality audit (the Deequ/`ANALYZE CONSTRAINTS`
    * shape): one row per constraint with its violation count, checked
    * population, and pass flag. Constraint families share scans —
    * the two row-local orders checks (value range, enum domain) fold
    * into ONE conditional aggregate over one scan, uniqueness is one
    * aggregate over customer, and referential integrity is a left-anti
    * join (shuffle on the key, the standard orphan scan). The three
    * single-row results cross-join broadcast into the tall report via
    * `stack` — no driver-side assembly.
    */
  def qualityChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val oAgg = o.agg(
      count(lit(1)).as("total"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("badstatus"))
    val cAgg = c.agg(
      count(lit(1)).as("ctotal"),
      count_distinct(col("c_custkey")).as("cndv"))
    val orphans = o.join(c.select(col("c_custkey")),
        o("o_custkey") === c("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    oAgg.crossJoin(broadcast(cAgg)).crossJoin(broadcast(orphans))
      .selectExpr(
        """stack(4,
          |  'customer_custkey_unique', ctotal - cndv, ctotal,
          |  'orders_custkey_fk', orphans, total,
          |  'orders_status_domain', badstatus, total,
          |  'orders_totalprice_positive', nonpos, total
          |) AS (check_name, violations, checked)""".stripMargin)
      .withColumn("pass", (col("violations") === 0L).cast("long"))
      .orderBy("check_name")
  }

  /** Anonymity threshold for [[kAnonymity]]. */
  val KAnon = 5

  /** k-anonymity risk profile over the quasi-identifier pair
    * (nation, market segment): how many equivalence classes exist, how
    * many fall below k, the smallest class, and the number of rows
    * re-identifiable through a small class — the report that gates
    * releasing a training table containing demographic columns. Two
    * aggregations (rows → classes → profile), both map-side combined;
    * the second input is one row per class, already tiny.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("sz"))
      .agg(
        count(lit(1)).as("classes"),
        sum(when(col("sz") < KAnon, 1L).otherwise(0L)).as("small_classes"),
        min(col("sz")).as("min_class"),
        sum(when(col("sz") < KAnon, col("sz")).otherwise(0L)).as("rows_at_risk"))

  /** Keys reported by [[joinKeySkew]]. */
  val SkewTopK = 10

  /** Join-key skew audit — the measurement that decides between a
    * plain shuffle join, AQE's skew split, and the explicit salting
    * `operators/Salt.scala` implements: per-key row counts for the
    * lineitem⋈orders key, the [[SkewTopK]] heaviest keys with their
    * share of the table (ppm, integer-exact), and each key's ratio to
    * the mean key load (×100, `div`-truncated). Two aggregations (rows
    * → keys → profile constants) both map-side combined, the totals
    * broadcast back onto the tiny top-k head — nothing corpus-sized
    * past the first exchange at any scale.
    */
  def joinKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
    val totals = keys.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"))
    keys.crossJoin(broadcast(totals))
      .select(col("l_orderkey"), col("cnt"),
        expr("(cnt * 1000000) div n_rows").as("share_ppm"),
        expr("(cnt * 100 * n_keys) div n_rows").as("x100_of_mean"))
      .orderBy(desc("cnt"), asc("l_orderkey"))
      .limit(SkewTopK)
  }

  /** Embedding-table governance — the checks an ANN index build gates
    * on, one constant-size report row: id duplication, dimensional
    * consistency (min/max length), zero-norm vectors (cosine-undefined,
    * the degenerate rows every scorer special-cases), exact duplicate
    * payloads (grouping by the vector value itself — the embedding twin
    * of `dedup_exact`), and two-way coverage against the documents
    * table (docs without a vector starve retrieval; vectors without a
    * doc are orphaned index weight). Three scans and two anti-joins;
    * the norm check rides the native [[graft.functions.ArrayDot]]
    * inside whole-stage codegen. The two exact DISTINCTs (ids, vector
    * payloads) dedup map-side but can carry distinct values through
    * their exchange — at 100 TB both swap for `approx_count_distinct`
    * exactly like `meta_stats`' documented NDV trade (the registry's
    * `approx_distinct` is the sketch path).
    */
  def embeddingAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"))
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val eAgg = e.agg(
      count(lit(1)).as("n_vecs"),
      count_distinct(col("vec_id")).as("n_ids"),
      min(size(col("v"))).cast("long").as("min_dim"),
      max(size(col("v"))).cast("long").as("max_dim"),
      sum(when(coalesce(graft.functions.ArrayDot(col("v"), col("v")), lit(-1.0)) === 0.0,
        1L).otherwise(0L)).as("zero_norm"),
      count_distinct(col("v")).as("n_distinct"))
    val missing = d.join(e.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("docs_missing_vec"))
    val orphan = e.select(col("vec_id").as("doc_id")).join(d, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("vecs_missing_doc"))
    eAgg.crossJoin(broadcast(missing)).crossJoin(broadcast(orphan))
      .select(col("n_vecs"), (col("n_vecs") - col("n_ids")).as("dup_ids"),
        col("min_dim"), col("max_dim"), col("zero_norm"),
        (col("n_vecs") - col("n_distinct")).as("dup_vectors"),
        col("docs_missing_vec"), col("vecs_missing_doc"))
  }

  /** Histogram geometry for [[splitDrift]]: length deciles of width 64
    * chars, capped at bucket [[DriftBucketMax]] (the harness corpus tops
    * out under 640 chars; production would widen the buckets, same
    * plan).
    */
  val DriftBucketWidth = 64
  val DriftBucketMax = 9

  /** Split-drift audit — the check that catches a broken split
    * assignment or a shifted ingest distribution before training: the
    * document-length histogram of the train split vs the held-out
    * splits, side-by-side as integer ppm shares with their absolute
    * difference per bucket (the summands of an L1/total-variation
    * distance, kept per-bucket so the report shows WHERE the
    * distributions diverge, not just that they do). All-integer
    * arithmetic — bucket ppm = docs·10⁶ div side-total — so the report
    * is exactly reproducible on any engine; PSI's log term is
    * deliberately omitted (no correctly-rounded ln guarantee across
    * engines, and the L1 profile carries the same decision signal).
    *
    * Scale shape: one scan with a conditional per-bucket aggregate
    * (both splits counted in the same pass — no second scan, no join
    * between sides), a constant-size totals aggregate broadcast back
    * onto the ≤ [[DriftBucketMax]]+1-row histogram. Nothing
    * corpus-sized past the first exchange.
    */
  def splitDrift(spark: SparkSession, dir: String): DataFrame = {
    val perB = SampleOps.withSplit(Tables.documents(spark, dir))
      .select(expr(s"least($DriftBucketMax, n_chars div $DriftBucketWidth)").as("bucket"),
        col("split"))
      .groupBy("bucket")
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("train_docs"),
        sum(when(col("split") =!= "train", 1L).otherwise(0L)).as("eval_docs"))
    val tot = perB.agg(sum("train_docs").as("tt"), sum("eval_docs").as("te"))
    perB.crossJoin(broadcast(tot))
      .select(col("bucket"), col("train_docs"), col("eval_docs"),
        expr("(train_docs * 1000000) div greatest(tt, 1L)").as("train_ppm"),
        expr("(eval_docs * 1000000) div greatest(te, 1L)").as("eval_ppm"))
      .withColumn("drift_ppm", abs(col("train_ppm") - col("eval_ppm")))
      .orderBy("bucket")
  }

  /** Source-concentration audit — the diversity check a data-mixing
    * owner runs before trusting a language's slice: per language, how
    * many sources feed it, the largest source's share, and the
    * Herfindahl–Hirschman concentration index (Σ share² — 1 000 000 ppm
    * when one source IS the slice, → 1e6/k for k equal sources). A
    * slice that looks large but is one crawl in a trenchcoat gets
    * flagged here, not after a training run. All-integer ppm
    * arithmetic — counts, squares (decimal-summed so the squares stay
    * exact at any slice size), one floor division — so the report is
    * bit-exact cross-engine. Two wordcount-class aggregations, nothing
    * corpus-sized past the first exchange.
    */
  def sourceConcentration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum("c").as("n_docs"),
        count(lit(1)).as("n_sources"),
        max("c").as("topc"),
        sum(col("c").cast(dec) * col("c").cast(dec)).as("s2"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        expr("(topc * 1000000) div n_docs").as("top_source_ppm"),
        expr("CAST((s2 * 1000000) div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)")
          .as("hhi_ppm"))
      .orderBy("lang")
  }

  /** Benford first-digit expectations, floor(log10(1 + 1/d) · 1e6) for
    * d = 1..9 — fixed public constants, so both engines consume the
    * SAME table and no libm log enters the compare (the Dice/PMI
    * argument). Shared generator for the Spark literal map and the
    * oracle VALUES list.
    */
  val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /** Benford's-law conformance audit over order totals — the classic
    * fraud / synthetic-data / unit-mixup screen: naturally-occurring
    * multi-scale amounts follow log-uniform first-digit frequencies,
    * and a slice that was generated, truncated, or re-priced in one
    * band sticks out immediately. First digits extract via
    * floor→BIGINT→string — integer-to-string casts are portable where
    * double formatting and libm log10 are not — and each digit row
    * reports observed vs expected ppm with an |Δ| deviation; the total
    * L1 deviation rides every row via a window over the 9-row result
    * (integer sum, order-free). ONE scan, 9 groups, constant-size
    * output at any table size.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val expected = map(BenfordPpm.flatMap { case (d, p) =>
      Seq(lit(d), lit(p)) }: _*)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.orders(spark, dir)
      // Benford applies to positive multi-scale amounts: sub-1 and
      // negative totals are out of domain, and filtering them HERE
      // (mirrored in the oracle) keeps the '-'→int cast and the
      // digit-0 map probe from ever executing under the ANSI session.
      .filter(col("o_totalprice") >= 1.0)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum("cnt").over(all))
      .select(col("digit"), col("cnt"),
        expr("(cnt * 1000000) div total").as("obs_ppm"),
        // try_element_at + the isNotNull filter below mirror the
        // oracle's inner join (house rule: literal-map lookups under
        // ANSI must not throw on an unexpected key).
        try_element_at(expected, col("digit")).as("benford_ppm"))
      .filter(col("benford_ppm").isNotNull)
      .withColumn("dev_ppm",
        abs(col("obs_ppm") - col("benford_ppm")))
      .withColumn("total_dev_ppm", sum("dev_ppm").over(all))
      .orderBy("digit")
  }

  /** Erasure-request residue and derived-table bucket count, mirrored
    * in the oracle. 16 buckets against the 17-residue request list
    * keeps both gate arms non-vacuous at sf0.01 (9 of 16 buckets
    * affected — selective refresh genuinely skips 7) and every
    * affected bucket keeps surviving users (≈9 users per bucket, at
    * most one erased).
    */
  val EraseMod = 17L
  val EraseResidue = 3L
  val EraseBuckets = 16

  /** RIGHT-TO-BE-FORGOTTEN propagation into a DERIVED table with
    * SELECTIVE partition refresh — the governance pattern GDPR/CCPA
    * pipelines run at scale: a per-user profile table lives
    * partitioned by a user-hash bucket; an erasure-request list
    * arrives; only the buckets CONTAINING erased users recompute (from
    * surviving rows) and swap in via dynamic partition overwrite — the
    * untouched buckets' files are never rewritten, so erasure cost
    * tracks the REQUEST LIST's bucket fan-out, not the table size.
    * The value gate pins all three facts at once: no erased user
    * survives anywhere, every surviving user's stats equal the full
    * recompute (refreshed and untouched buckets alike — the oracle is
    * one relational derivation over the surviving events), and the
    * per-bucket `refreshed` flag marks exactly the buckets with an
    * erased member. A bucket whose EVERY user is erased would need an
    * explicit partition delete (dynamic overwrite writes nothing for
    * an empty group and the stale partition would survive) — the drill
    * guards that loudly rather than silently serving stale rows;
    * production formats express it as a partition-level tombstone.
    */
  def erasurePropagation(spark: SparkSession, dir: String): DataFrame =
    erasureOn(spark,
      Tables.events(spark, dir).select(col("user_id"), col("value")),
      graft.streaming.StreamDrill.freshDirs(spark, "erasure_profiles").head)

  /** [[erasurePropagation]] over an arbitrary (user_id, value) frame
    * (exposed for the spec, which plants a fully-erased bucket to pin
    * the stale-partition guard).
    */
  private[queries] def erasureOn(spark: SparkSession, rows: DataFrame,
      derived: String): DataFrame = {
    // `%` (not pmod) so the bucket arithmetic matches both the DuckDB
    // oracle and the erased-residue predicate below; fixture ids are
    // nonnegative so the two agree today, but mixing mod semantics in
    // one query invites a sign bug the day ids go negative. Negative
    // ids DO work end-to-end (truncated % on both engines, literal
    // `bucket=-N` partition dirs) — ErasureSpec pins the round-trip;
    // they can never be erased nor co-bucketed with an erased user,
    // so negative buckets are always untouched partitions.
    val ev = rows
      .select(col("user_id"), col("value"),
        (col("user_id") % EraseBuckets).as("bucket"))
    def profiles(rows: DataFrame): DataFrame =
      rows.groupBy("bucket", "user_id")
        .agg(count(lit(1)).as("n_events"),
          graft.operators.Parity.dsum(col("value")).as("value_sum"))
    // v1: the standing profile table, bucket-partitioned.
    profiles(ev).write.partitionBy("bucket").mode("overwrite").parquet(derived)
    // The erasure request arrives: affected buckets are a pure
    // function of the erased ids (tiny frame), and the refresh
    // recomputes ONLY those buckets from surviving users' events.
    val erased = col("user_id") % EraseMod === EraseResidue
    // Both tiny frames are referenced 2-3× below (guard count, write,
    // final join) — localCheckpoint so the surviving-profiles
    // aggregation lineage runs ONCE, not once per reference; the whole
    // point of the drill is that the refresh cost is the touched
    // buckets, so paying it twice would falsify the measurement.
    val affected = ev.filter(erased).select("bucket").distinct()
      .localCheckpoint(true)
    val refresh = profiles(
      ev.filter(!erased).join(broadcast(affected), "bucket"))
      .localCheckpoint(true)
    val refreshedBuckets = affected.count()
    require(refresh.select("bucket").distinct().count() == refreshedBuckets,
      "erasure refresh would EMPTY a bucket — dynamic overwrite cannot " +
        "express a partition delete; this fixture/residue combination " +
        "needs an explicit partition tombstone")
    refresh.write.partitionBy("bucket").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(derived)
    spark.read.parquet(derived)
      .join(broadcast(affected.withColumn("refreshed", lit(1L))),
        Seq("bucket"), "left")
      .select(col("bucket").cast("long").as("bucket"), col("user_id"),
        col("n_events"), col("value_sum"),
        coalesce(col("refreshed"), lit(0L)).as("refreshed"))
      .orderBy("user_id")
  }

  /** SPLIT-LEAKAGE audit — the eval-integrity metric a training
    * pipeline monitors: of the verified near-dup PAIRS (the direct
    * duplicate relations the `neardup_*` family certifies), how many
    * straddle the train/valid/test line under each split policy? The
    * plain per-doc hash split leaks (cross_pairs > 0 on this corpus —
    * near-identical docs land on opposite sides, contaminating the
    * held-out set); the grouped policy (`sample_splits_grouped`'s
    * component-representative key) yields cross_pairs = 0 BY
    * CONSTRUCTION — and this query puts that guarantee under the value
    * gate as a measured number instead of prose. One report row per
    * policy.
    *
    * Scale shape: the pair list probes the persisted shingle index
    * (never re-shingles), the component labels broadcast onto it, and
    * the report is two conditional aggregates over the pair list — a
    * tiny frame at any corpus size (only certified duplicate pairs).
    * Exact oracle: the verified-pairs + recursive-components CTEs
    * composed with the shared bucket/split CASE, both split policies
    * re-derived from raw text.
    */
  def leakageAudit(spark: SparkSession, dir: String): DataFrame = {
    val (pairs0, candidates) = DedupOps.verifiedPairsWithHandle(spark, dir)
    // The pair list is the small two-phase output; checkpointing it
    // releases the candidate cache before the report aggregates run.
    val pairs = pairs0.select(col("a"), col("b")).localCheckpoint()
    candidates.unpersist(blocking = false)
    val labels = DedupOps.groupLabels(spark, dir)
    val withReps = pairs
      .join(broadcast(labels.toDF("a", "rep_a")), Seq("a"), "left")
      .join(broadcast(labels.toDF("b", "rep_b")), Seq("b"), "left")
    def splitCol(id: org.apache.spark.sql.Column) =
      SampleOps.splitOf(SampleOps.bucketOf(id))
    def crossCount(sa: org.apache.spark.sql.Column,
        sb: org.apache.spark.sql.Column) =
      sum(when(sa =!= sb, 1L).otherwise(0L))
    // ONE aggregation pass emits both policies' counts (two report
    // sub-frames would re-run the broadcast joins per policy); the
    // two-row reshape is a constant-size stack.
    withReps.agg(
        crossCount(splitCol(coalesce(col("rep_a"), col("a"))),
          splitCol(coalesce(col("rep_b"), col("b")))).as("grouped_cross"),
        crossCount(splitCol(col("a")), splitCol(col("b"))).as("plain_cross"),
        count(lit(1)).as("total_pairs"))
      .selectExpr(
        "stack(2, 'grouped', grouped_cross, 'plain', plain_cross) " +
          "AS (policy, cross_pairs)",
        "total_pairs")
      .orderBy("policy")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audit_leakage" -> (leakageAudit _),
    "governance_erasure" -> (erasurePropagation _),
    "audit_benford" -> (benford _),
    "audit_concentration" -> (sourceConcentration _),
    "audit_drift" -> (splitDrift _),
    "audit_quality" -> (qualityChecks _),
    "audit_kanon" -> (kAnonymity _),
    "audit_skew" -> (joinKeySkew _),
    "audit_embeddings" -> (embeddingAudit _),
  )

  // lazy: audit_leakage composes DedupOps.duckVerifiedCtes and the
  // SampleOps split CASE — the same cross-object-init posture as
  // SampleOps.oracle (an eager val could splice a null mid-cycle).
  lazy val oracle: Map[String, String] = Map(
    // Verified pairs + recursive components, both split policies
    // re-derived from raw text via the shared bucket/split CASE. The
    // grouped policy's cross count must be zero — the by-construction
    // guarantee as a gated value.
    "audit_leakage" -> {
      def sc(id: String): String =
        SampleOps.duckSplitCase(SampleOps.duckBucket(id))
      s"""WITH RECURSIVE ${DedupOps.duckVerifiedCtes},
         |sym AS (SELECT a AS src, b AS dst FROM ver
         |        UNION ALL SELECT b, a FROM ver),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM sym
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
         |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS rep
         |        FROM reach GROUP BY src),
         |j AS (
         |  SELECT ver.a, ver.b, la.rep AS rep_a, lb.rep AS rep_b
         |  FROM ver
         |  LEFT JOIN lab la ON ver.a = la.doc_id
         |  LEFT JOIN lab lb ON ver.b = lb.doc_id)
         |SELECT 'grouped' AS policy,
         |  CAST(sum(CASE WHEN ${sc("coalesce(rep_a, a)")} <> ${sc("coalesce(rep_b, b)")}
         |       THEN 1 ELSE 0 END) AS BIGINT) AS cross_pairs,
         |  CAST(count(*) AS BIGINT) AS total_pairs
         |FROM j
         |UNION ALL
         |SELECT 'plain',
         |  CAST(sum(CASE WHEN ${sc("a")} <> ${sc("b")} THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(*) AS BIGINT)
         |FROM j
         |ORDER BY policy""".stripMargin
    },
    // Selective refresh ≡ full recompute over surviving rows: untouched
    // buckets hold no erased user, so their v1 rows already equal the
    // surviving derivation — ONE relational pass serves every bucket.
    "governance_erasure" ->
      s"""WITH surv AS (
         |  SELECT user_id % $EraseBuckets AS bucket, user_id,
         |    count(*) AS n_events,
         |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
         |  FROM events WHERE user_id % $EraseMod <> $EraseResidue
         |  GROUP BY user_id),
         |aff AS (
         |  SELECT DISTINCT user_id % $EraseBuckets AS bucket
         |  FROM events WHERE user_id % $EraseMod = $EraseResidue)
         |SELECT s.bucket, s.user_id, s.n_events, s.value_sum,
         |  CAST(CASE WHEN a.bucket IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS refreshed
         |FROM surv s LEFT JOIN aff a USING (bucket)
         |ORDER BY user_id""".stripMargin,
    // Digits from integer->string casts (portable); the expected table
    // is the same BenfordPpm constant rendered as VALUES.
    "audit_benford" ->
      s"""WITH exp_t(digit, benford_ppm) AS (VALUES
         |  ${BenfordPpm.map { case (d, p) => s"($d, CAST($p AS BIGINT))" }
               .mkString(", ")}),
         |obs AS (
         |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         |    count(*) AS cnt
         |  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
         |j AS (
         |  SELECT obs.digit, CAST(cnt AS BIGINT) AS cnt,
         |    (CAST(cnt AS BIGINT) * 1000000) // CAST(sum(cnt) OVER () AS BIGINT) AS obs_ppm,
         |    benford_ppm
         |  FROM obs JOIN exp_t ON obs.digit = exp_t.digit),
         |d AS (
         |  SELECT digit, cnt, obs_ppm, benford_ppm,
         |    abs(obs_ppm - benford_ppm) AS dev_ppm
         |  FROM j)
         |SELECT digit, cnt, obs_ppm, benford_ppm, dev_ppm,
         |  CAST(sum(dev_ppm) OVER () AS BIGINT) AS total_dev_ppm
         |FROM d ORDER BY digit""".stripMargin,
    // HHI twin: DuckDB's sum(c*c) widens to HUGEINT natively, matching
    // the Spark side's decimal-summed squares; positive-operand floor
    // division agrees across engines.
    "audit_concentration" ->
      """WITH cs AS (
        |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2)
        |SELECT lang, CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_sources,
        |  (CAST(max(c) AS BIGINT) * 1000000) // CAST(sum(c) AS BIGINT)
        |    AS top_source_ppm,
        |  CAST((sum(c * c) * 1000000) // (sum(c) * sum(c)) AS BIGINT) AS hhi_ppm
        |FROM cs GROUP BY lang ORDER BY lang""".stripMargin,
    // Same split CASE as the sampling family (generated from the shared
    // constants); all-integer ppm arithmetic so the drift profile is
    // bit-exact.
    "audit_drift" ->
      s"""WITH b AS (
         |  SELECT least($DriftBucketMax, n_chars // $DriftBucketWidth) AS bucket,
         |    ${SampleOps.duckSplitCase(SampleOps.duckBucket("doc_id"))} AS split
         |  FROM documents),
         |perb AS (
         |  SELECT bucket,
         |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS train_docs,
         |    CAST(sum(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS BIGINT) AS eval_docs
         |  FROM b GROUP BY bucket),
         |t AS (
         |  SELECT CAST(sum(train_docs) AS BIGINT) AS tt,
         |    CAST(sum(eval_docs) AS BIGINT) AS te FROM perb)
         |SELECT bucket, train_docs, eval_docs,
         |  (train_docs * 1000000) // greatest(tt, 1) AS train_ppm,
         |  (eval_docs * 1000000) // greatest(te, 1) AS eval_ppm,
         |  abs((train_docs * 1000000) // greatest(tt, 1)
         |    - (eval_docs * 1000000) // greatest(te, 1)) AS drift_ppm
         |FROM perb, t ORDER BY bucket""".stripMargin,
    "audit_quality" ->
      """WITH o AS (
        |  SELECT count(*) AS total,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS badstatus
        |  FROM orders),
        |c AS (
        |  SELECT count(*) AS ctotal, count(DISTINCT c_custkey) AS cndv FROM customer),
        |f AS (
        |  -- NOT EXISTS, not NOT IN: a NULL o_custkey must count as an
        |  -- orphan (Spark's left_anti keeps rows whose key matches
        |  -- nothing, NULL included), and a NULL c_custkey must not
        |  -- NULL-out the whole predicate.
        |  SELECT count(*) AS orphans FROM orders o
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |SELECT check_name, violations, checked,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM (
        |  SELECT 'customer_custkey_unique' AS check_name, ctotal - cndv AS violations, ctotal AS checked FROM c
        |  UNION ALL SELECT 'orders_custkey_fk', f.orphans, o.total FROM f, o
        |  UNION ALL SELECT 'orders_status_domain', badstatus, total FROM o
        |  UNION ALL SELECT 'orders_totalprice_positive', nonpos, total FROM o)
        |ORDER BY check_name""".stripMargin,
    "audit_skew" ->
      s"""WITH k AS (
         |  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey),
         |t AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows FROM k)
         |SELECT l_orderkey, cnt,
         |  (cnt * 1000000) // n_rows AS share_ppm,
         |  (cnt * 100 * n_keys) // n_rows AS x100_of_mean
         |FROM k, t
         |ORDER BY cnt DESC, l_orderkey LIMIT $SkewTopK""".stripMargin,
    // The norm check replays ArrayDot's fold as the same dotSql tree
    // the cosine oracles use; float→double casting is injective, so
    // DISTINCT over the cast lists matches Spark's distinct vectors.
    "audit_embeddings" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |agg AS (
         |  SELECT count(*) AS n_vecs,
         |    count(DISTINCT vec_id) AS n_ids,
         |    CAST(min(len(v)) AS BIGINT) AS min_dim,
         |    CAST(max(len(v)) AS BIGINT) AS max_dim,
         |    CAST(sum(CASE WHEN coalesce(${graft.functions.VectorOps.dotSql("v", "v")}, -1.0) = 0.0
         |             THEN 1 ELSE 0 END) AS BIGINT) AS zero_norm,
         |    count(DISTINCT v) AS n_distinct
         |  FROM e),
         |m AS (
         |  SELECT count(*) AS docs_missing_vec FROM documents d
         |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.vec_id = d.doc_id)),
         |o AS (
         |  SELECT count(*) AS vecs_missing_doc FROM e
         |  WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
         |SELECT n_vecs, n_vecs - n_ids AS dup_ids, min_dim, max_dim,
         |  zero_norm, n_vecs - n_distinct AS dup_vectors,
         |  docs_missing_vec, vecs_missing_doc
         |FROM agg, m, o""".stripMargin,
    "audit_kanon" ->
      s"""WITH cls AS (
         |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
         |  FROM customer GROUP BY c_nationkey, c_mktsegment)
         |SELECT count(*) AS classes,
         |  CAST(sum(CASE WHEN sz < $KAnon THEN 1 ELSE 0 END) AS BIGINT) AS small_classes,
         |  min(sz) AS min_class,
         |  CAST(sum(CASE WHEN sz < $KAnon THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk
         |FROM cls""".stripMargin,
  )
}
