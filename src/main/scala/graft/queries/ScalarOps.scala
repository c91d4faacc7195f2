package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function and remaining-category coverage (SURVEY.md §2.3):
  * date/string/math/array functions, a range join, cube grouping sets,
  * EXCEPT, approximate distinct, and the `spark.sql` entry path.
  */
object ScalarOps {

  /** Date, string and math scalars in one deterministic projection.
    * `floor` rather than `round` on money values: ties at the rounding
    * digit are engine-dependent, floors are not.
    */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 100)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        upper(substring(col("o_orderpriority"), 1, 4)).as("prio4"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        (col("o_orderkey") % 7).as("key_mod"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        greatest(col("o_custkey"), col("o_orderkey")).as("max_key"))
      .orderBy("o_orderkey")

  /** Calendar arithmetic in one projection: quarter, ISO weekday,
    * month truncation, day offsets, and month end — every derived value
    * surfaces as an epoch-day/number BIGINT so the compare never touches
    * either engine's date rendering or week-start convention (Spark's
    * `weekday` is Monday=0; DuckDB's `isodow` is Monday=1 — the +1
    * aligns them; both `datediff` calls count whole days from epoch).
    */
  def datetimeFuncs(spark: SparkSession, dir: String): DataFrame = {
    val d = to_date(col("o_orderdate"))
    val epoch = to_date(lit("1970-01-01"))
    def days(c: org.apache.spark.sql.Column) = datediff(c, epoch).cast("long")
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 200)
      .select(
        col("o_orderkey"),
        quarter(d).cast("long").as("o_quarter"),
        (weekday(d) + 1).cast("long").as("o_isodow"),
        days(trunc(d, "month")).as("month_start_day"),
        days(date_add(d, 30)).as("plus30_day"),
        days(last_day(d)).as("month_end_day"))
      .orderBy("o_orderkey")
  }

  /** Array-function surface in one projection over real token arrays:
    * sort/distinct/slice/join/contains/reverse plus an `aggregate` HOF
    * fold — the building blocks every shingle/sketch query composes,
    * registered once in isolation so the category has a direct oracle.
    * Booleans and sums surface as BIGINTs for dtype-stable compares.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        size(array_distinct(col("tk"))).cast("long").as("uniq_cnt"),
        array_join(slice(array_sort(col("tk")), 1, 3), " ").as("first3_sorted"),
        array_contains(col("tk"), "the").cast("long").as("has_the"),
        // try_element_at, not element_at: under ANSI mode an empty token
        // array must yield NULL (as the oracle's list_reverse(tk)[1]
        // does), not throw.
        try_element_at(reverse(col("tk")), lit(1)).as("last_tok"),
        aggregate(col("tk"), lit(0L), (acc, t) => acc + length(t))
          .as("char_sum"))
      .orderBy("doc_id")

  /** Map-typed columns end-to-end: per-user event-type counts packed
    * into a `map<string,long>` (`map_from_entries` over an aggregated
    * struct list) and exploded back to rows. The map round-trip is the
    * Spark-side capability under test; the oracle verifies its
    * semantics relationally (pack ∘ explode ≡ identity on unique keys).
    */
  def scalarMap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
      .orderBy("user_id", "event_type")

  /** Range join: lineitems shipped within 30 days of their order's date —
    * equi key plus a range predicate, the planner keeps the equi join and
    * applies the band as a post-filter (no pair blowup; at scale the equi
    * key carries the shuffle).
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  /** Band half-width (days) and covering-bucket width for [[bandJoin]].
    * BucketDays = 2 × BandDays, so a probe's band [d-1, d+1] spans at
    * most two buckets — the expansion factor is ≤ 2 regardless of data.
    */
  private val BandDays = 1
  private val BucketDays = 2

  /** PURE band join (no equi key): orders sampled for audit, matched to
    * every lineitem shipped within ±1 day of the order date. Without an
    * equi key Spark can only plan theta predicates as a nested loop —
    * |A|×|B| comparisons, a scale-killer. Bucketization restores an equi
    * key: the probe side explodes into the ≤ 2 day-buckets covering its
    * band, the build side hashes into its single bucket, the join runs
    * as a plain shuffle join on `bucket`, and the exact band predicate
    * filters inside the join. Pair expansion is bounded by rows-per-day
    * (data density), never by corpus × corpus; the spec asserts the plan
    * contains no nested loop.
    */
  def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 97 === 0) // the audited sample
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), epoch).as("od"))
      .withColumn("bucket", explode(sequence(
        floor((col("od") - BandDays) / BucketDays).cast("long"),
        floor((col("od") + BandDays) / BucketDays).cast("long"))))
    val l = Tables.lineitem(spark, dir)
      .select(datediff(to_date(col("l_shipdate")), epoch).as("ld"))
      .withColumn("bucket", floor(col("ld") / BucketDays).cast("long"))
    o.join(l, "bucket")
      .filter(abs(col("ld") - col("od")) <= BandDays)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  /** The same band join written NAIVELY — a bare `abs(a-b) <= 1` theta
    * predicate — with [[graft.plans.BandJoinRewrite]] installed in the
    * session. The optimizer rule performs the covering-bucket rewrite
    * [[bandJoin]] hand-writes, so the query author keeps the declarative
    * form and still never pays for a nested loop. Same oracle as
    * `band_join`; the spec additionally asserts the rewritten plan shape.
    */
  def bandJoinAuto(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.BandJoinRewrite.install(spark)
    val epoch = to_date(lit("1970-01-01"))
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), epoch).as("od"))
      .join(Tables.lineitem(spark, dir)
          .select(datediff(to_date(col("l_shipdate")), epoch).as("ld")),
        abs(col("ld") - col("od")) <= lit(BandDays))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  /** Cube: all four grouping sets over (flag, status). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Set difference: nations with customers but no suppliers. */
  /** [[setExcept]]'s right-side bound: suppliers span every customer
    * nation in the fixture, so a bare nation EXCEPT returns the empty
    * frame on both engines — vacuous. The threshold restricts the
    * right side to rich suppliers' nations so the difference binds
    * real rows (13 at sf0.01).
    */
  val ExceptMinAcctbal = 8000.0

  def setExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .except(Tables.supplier(spark, dir)
        .filter(col("s_acctbal") > ExceptMinAcctbal)
        .select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  /** HyperLogLog++ approximate distinct — sketch implementations differ
    * between engines, so this takes the rows-only check; the exact twin
    * is `agg_stats.distinct_parts`.
    */
  /** HLL++ distinct estimate VALUE-GATED like [[approxPercentile]]:
    * the exact per-group distinct count rides along (the oracle
    * recomputes it), and the estimate binds as a boolean inside the
    * 4-sigma band of the default 5% relative standard deviation — the
    * same deterministic pin SketchAccuracySpec asserts JVM-side
    * (approx_count_distinct is hash-based, so the estimate is a fixed
    * function of the data, never flaky).
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct("l_partkey").as("ap"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("ap") - col("exact_parts"))
          <= col("exact_parts") * lit(0.2)).as("within_4sigma"))
      .orderBy("l_returnflag")

  /** Incremental distinct-count maintenance via MERGEABLE HLL sketches
    * (Spark's native DataSketches surface): history and the incoming
    * batch each collapse to a constant-size binary sketch, and the
    * corpus-wide distinct count comes from `hll_union` of the two —
    * never from recounting history. In production the history sketch is
    * a PERSISTED artifact (kilobytes, regardless of corpus size) and
    * each increment unions yesterday's sketch with the day's batch —
    * the same incremental contract as `neardup_minhash_incr`, for
    * cardinality instead of similarity. The sketch binary has no SQL
    * twin, so the gate binds exact counts plus in-band booleans (see
    * below); SketchAccuracySpec additionally pins the
    * merged estimate inside HLL error of the exact distinct count and
    * the estimates' monotonicity.
    */
  def approxDistinctIncr(spark: SparkSession, dir: String): DataFrame = {
    // Value-gated like the percentile twin: exact distincts per side
    // ride along for the oracle, and each estimate (history, batch,
    // merged-by-union) binds as a boolean inside the 5% band
    // SketchAccuracySpec pins (DataSketches HLL lgK=12 ≈ 1.6% RSE;
    // hash-based, deterministic for fixed data).
    val d = SampleOps.withSplit(Tables.documents(spark, dir))
      .select(col("split"), col("text"))
    val hist = d.filter(col("split") === "train")
      .agg(hll_sketch_agg(col("text")).as("sk_h"),
        countDistinct(col("text")).as("history_exact"))
    val batch = d.filter(col("split") =!= "train")
      .agg(hll_sketch_agg(col("text")).as("sk_b"),
        countDistinct(col("text")).as("batch_exact"))
    val whole = d.agg(countDistinct(col("text")).as("merged_exact"))
    def inBand(est: Column, exact: Column) =
      abs(est - exact) <= exact * lit(0.05)
    hist.crossJoin(broadcast(batch)).crossJoin(broadcast(whole))
      .select(col("history_exact"), col("batch_exact"), col("merged_exact"),
        inBand(hll_sketch_estimate(col("sk_h")), col("history_exact"))
          .as("history_in_band"),
        inBand(hll_sketch_estimate(col("sk_b")), col("batch_exact"))
          .as("batch_in_band"),
        inBand(hll_sketch_estimate(hll_union(col("sk_h"), col("sk_b"))),
          col("merged_exact")).as("merged_in_band"))
  }

  /** Incremental quantile maintenance via MERGEABLE KLL sketches
    * (Spark 4's native DataSketches quantile surface) — the
    * [[approxDistinctIncr]] contract for percentiles instead of
    * cardinality: history (shipped before the cut date) and the
    * incoming batch each collapse to a constant-size binary sketch per
    * group, and corpus-wide quantiles come from `kll_sketch_merge` of
    * the two — never from re-sorting history. In production the
    * history sketch is a PERSISTED artifact (kilobytes regardless of
    * corpus size; `kll_merge_agg_double` folds a whole directory of
    * daily sketches) and each day unions its batch in — the exact-sort
    * `agg_percentile` twin's scale path when even the two-pass exact
    * plan is too hot. KLL compaction is randomized, so the raw
    * estimates have no SQL twin — instead the output is VALUE-GATED
    * through exact bands: counts recomputed by the oracle, estimates
    * as in-band booleans (see below). SketchAccuracySpec keeps the
    * independent pin on the raw estimates.
    */
  def approxPercentileIncr(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_shipdate"))
    // Each side's sketch travels with ITS OWN exact ±3%-rank band (the
    // SketchAccuracySpec window: KLL k=200 rank error ~1.65% at 99%
    // confidence plus randomized-compaction wobble), and the merged
    // estimates check against the WHOLE population's bands — so the
    // value gate binds the sketch n-bookkeeping exactly (history_n /
    // batch_n / merged_n are oracle-recomputed counts) and every
    // quantile estimate as an in-band boolean.
    val hist = li.filter(col("l_shipdate") < lit(PercentileIncrCut))
      .groupBy("l_returnflag")
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk_h"),
        graft.functions.PercentileFast(col("l_extendedprice"),
          Seq(0.47, 0.53)).as("hb"))
    val batch = li.filter(col("l_shipdate") >= lit(PercentileIncrCut))
      .groupBy("l_returnflag")
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk_b"),
        graft.functions.PercentileFast(col("l_extendedprice"),
          Seq(0.47, 0.53)).as("bb"))
    val whole = li.groupBy("l_returnflag")
      .agg(graft.functions.PercentileFast(col("l_extendedprice"),
        Seq(0.47, 0.53, 0.87, 0.93)).as("mb"))
    hist.join(batch, "l_returnflag").join(whole, "l_returnflag")
      .select(col("l_returnflag"),
        expr("kll_sketch_get_n_double(sk_h)").as("history_n"),
        expr("kll_sketch_get_n_double(sk_b)").as("batch_n"),
        expr("kll_sketch_get_n_double(kll_sketch_merge_double(sk_h, sk_b))")
          .as("merged_n"),
        expr("kll_sketch_get_quantile_double(sk_h, 0.5)")
          .between(element_at(col("hb"), 1), element_at(col("hb"), 2))
          .as("history_p50_in_band"),
        expr("kll_sketch_get_quantile_double(sk_b, 0.5)")
          .between(element_at(col("bb"), 1), element_at(col("bb"), 2))
          .as("batch_p50_in_band"),
        expr("kll_sketch_get_quantile_double(kll_sketch_merge_double(sk_h, sk_b), 0.5)")
          .between(element_at(col("mb"), 1), element_at(col("mb"), 2))
          .as("merged_p50_in_band"),
        expr("kll_sketch_get_quantile_double(kll_sketch_merge_double(sk_h, sk_b), 0.9)")
          .between(element_at(col("mb"), 3), element_at(col("mb"), 4))
          .as("merged_p90_in_band"))
      .orderBy("l_returnflag")
  }

  /** History/batch cut date for [[approxPercentileIncr]]. */
  val PercentileIncrCut = "1997-01-01"

  /** LATERAL correlated subquery through the SQL front end: top-2
    * orders per priority, expressed as a per-row dependent subquery with
    * ORDER BY + LIMIT. Catalyst decorrelates it (the plan is a join —
    * no per-outer-row re-execution; spec-asserted like subquery_mix),
    * which is exactly why LATERAL is usable at scale: the engine turns
    * the "for each row, run this query" form into the same
    * window/join shape topk_groups writes by hand. DuckDB runs the
    * identical SQL natively.
    */
  def sqlLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_lv")
    spark.sql(
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT o_orderpriority FROM orders_lv) p,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lv o
        |         WHERE o.o_orderpriority = p.o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY p.o_orderpriority, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other instead of vanishing from the join — the lookup
    * semantics a dimension with an explicit "missing" row needs. The
    * fact side derives NULLs deterministically (`nullif` on a modulus);
    * the dim side is an inline three-row broadcast with one NULL key,
    * so the NULL-match cardinality is bounded by the dim (never
    * null-count²). Surfaced as per-label counts.
    */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val facts = Tables.orders(spark, dir)
      .select(nullif(col("o_orderkey") % 7, lit(0L)).as("k"))
    val dim = Seq((Option(1L), "one"), (Option(2L), "two"), (Option.empty[Long], "missing"))
      .toDF("dk", "label")
    facts.join(broadcast(dim), col("k") <=> col("dk"))
      .groupBy("label").agg(count(lit(1)).as("cnt"))
      .orderBy("label")
  }

  /** The `spark.sql` entry path over a registered view — same engine,
    * SQL-text front end.
    */
  def sqlApi(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem_v
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Pivot: one column per line status, counts as cells (explicit value
    * list — dynamic pivots need a values scan first; at scale you always
    * declare the columns).
    */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy("l_returnflag")

  /** Unpivot (melt): wide numeric columns to (metric, value) rows. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 100)
      .unpivot(
        Array(col("o_orderkey")),
        Array(col("o_totalprice"), col("o_custkey").cast("double")),
        "metric", "value")
      .orderBy("o_orderkey", "metric")

  /** posexplode: fan-out with the element index kept (the LATERAL VIEW
    * shape; 0-based on both engines).
    */
  def posExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
      .toDF("doc_id", "pos", "word")
      .withColumn("pos", col("pos").cast("long"))
      .orderBy("doc_id", "pos")

  /** Approximate percentiles (rows-only: interpolation/sketch details
    * are engine-specific). Surfaced as scalar columns — the driver's
    * row-sort cannot hash array cells, so the multi-quantile array is
    * unpacked before leaving the query.
    */
  /** Sketch percentiles VALUE-GATED through exact rank bands: the raw
    * estimates are sketch outputs no SQL engine reproduces, so the
    * output carries the group's exact row count, the exact ±1%-rank
    * band edges (interpolated percentile — the established
    * quantile_cont parity), and BOOLEANS pinning each estimate inside
    * its band plus their ordering. The oracle recomputes counts and
    * edges exactly and expects every boolean TRUE — a sketch drifting
    * out of its contract (accuracy 10000 bounds rank error at 0.01%,
    * far inside the 1% band) hash-fails the gate instead of hiding
    * behind a rows-only check. SketchAccuracySpec keeps the
    * independent JVM-side pin on the raw estimates.
    */
  def approxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.9)),
          lit(10000)).as("pp"),
        graft.functions.PercentileFast(col("l_extendedprice"),
          Seq(0.49, 0.51, 0.89, 0.91)).as("bb"))
      .select(col("l_returnflag"), col("n_rows"),
        element_at(col("bb"), 1).as("p50_band_lo"),
        element_at(col("bb"), 2).as("p50_band_hi"),
        element_at(col("bb"), 3).as("p90_band_lo"),
        element_at(col("bb"), 4).as("p90_band_hi"),
        element_at(col("pp"), 1).between(element_at(col("bb"), 1),
          element_at(col("bb"), 2)).as("p50_in_band"),
        element_at(col("pp"), 2).between(element_at(col("bb"), 3),
          element_at(col("bb"), 4)).as("p90_in_band"),
        (element_at(col("pp"), 1) <= element_at(col("pp"), 2)).as("ordered"))
      .orderBy("l_returnflag")

  /** Exact percentiles (linear interpolation) — empirically bit-exact
    * against DuckDB's quantile_cont, so fully oracle-checked, unlike the
    * sketch-based approx_percentile.
    */
  def exactPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      // One agg with both quantiles: a single value->count state per
      // group instead of two, sorted once (~25% faster at sf0.1).
      .agg(graft.functions.PercentileFast(col("l_extendedprice"),
        Seq(0.5, 0.9)).as("pp"))
      .select(col("l_returnflag"),
        element_at(col("pp"), 1).as("price_p50"),
        element_at(col("pp"), 2).as("price_p90"))
      .orderBy("l_returnflag")

  /** Winsorization bounds for [[winsorizedStats]]. */
  val WinsorLo = 0.1
  val WinsorHi = 0.9

  /** Winsorized (clipped) statistics — the robust-mean move between
    * plain averaging (outlier-dominated) and the median (throws away
    * magnitude): clip every value into the group's exact
    * [p10, p90] band, then aggregate the clipped stream. Two-pass shape
    * like `agg_mad`: exact per-group cuts (bit-exact vs quantile_cont,
    * the agg_percentile parity) broadcast back onto the scan, clipping
    * is pure `least`/`greatest` selection, and the clipped sum surfaces
    * as floor-micros — floor of a bit-identical double is engine-exact,
    * where a DECIMAL cast of the INTERPOLATED cut value could round
    * differently at a half-way point. Also reports how many values each
    * tail clipped, which is the sanity check that the band actually
    * bit (~10% each side).
    */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val cuts = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(graft.functions.PercentileFast(col("l_extendedprice"),
        Seq(WinsorLo, WinsorHi)).as("pp"))
      .select(col("l_returnflag"),
        element_at(col("pp"), 1).as("lo"), element_at(col("pp"), 2).as("hi"))
    Tables.lineitem(spark, dir)
      .join(broadcast(cuts), "l_returnflag")
      .select(col("l_returnflag"),
        least(greatest(col("l_extendedprice"), col("lo")), col("hi")).as("wv"),
        (col("l_extendedprice") < col("lo")).as("clip_lo"),
        (col("l_extendedprice") > col("hi")).as("clip_hi"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        expr("CAST(sum(CAST(floor(wv * 1000000.0) AS DECIMAL(38,0))) AS BIGINT)")
          .as("win_micro_sum"),
        sum(when(col("clip_lo"), 1L).otherwise(0L)).as("clipped_lo"),
        sum(when(col("clip_hi"), 1L).otherwise(0L)).as("clipped_hi"))
      .orderBy("l_returnflag")
  }

  /** Robust statistics per group: exact median and MAD (median absolute
    * deviation) — the outlier-resistant counterpart of agg_stats'
    * mean/stddev. Two-pass shape like the z-score query: per-group
    * medians (rows = groups) broadcast back onto the stream, the
    * deviation |x − med| is scan-local, and a second exact percentile
    * runs over the deviations. Exact-percentile state is keyed by
    * DISTINCT values (domain-bounded for cent-quantized prices, ~6e7
    * entries worst case — the same cap as the distinct-value-frame
    * windows), but its per-group merge still lands on one reducer —
    * the documented agg_percentile trade; [[robustStatsApprox]]
    * (`agg_mad_approx`) is the registered sketch path whose state
    * stays bounded for value domains too large to enumerate. An r14
    * rank-locate rewrite (distinct-level window + bracketing-rank
    * explode, the agg_ntile_range machinery) measured 3.46s vs 2.56s
    * for this shape in a same-session A/B at sf0.1 — the extra level
    * exchange and single-task window sort cost more than percentile's
    * map merge, with no scale-posture gain (both forms are
    * domain-keyed, single-reducer-per-group) — so the aggregate form
    * stays. Parity: percentile
    * interpolation is bit-exact against quantile_cont (pinned by
    * agg_percentile), and |x − med| is one IEEE subtraction on both
    * engines.
    */
  def robustStats(spark: SparkSession, dir: String): DataFrame = {
    val meds = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(graft.functions.PercentileFast(col("l_extendedprice"), 0.5).as("med"))
    Tables.lineitem(spark, dir)
      .join(broadcast(meds), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        max(col("med")).as("median_price"),
        graft.functions.PercentileFast(
          abs(col("l_extendedprice") - col("med")), 0.5).as("mad_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** Sketch accuracy knob shared by [[robustStatsApprox]] and its spec:
    * percentile_approx's rank error is bounded by n/accuracy rows.
    */
  private[queries] val ApproxAccuracy = 10000

  /** Sketch twin of [[robustStats]] — the same two-pass median+MAD shape
    * with `percentile_approx` (bounded-state rank sketch) in place of
    * exact `percentile`, mirroring the agg_percentile/approx_percentile
    * pairing. This is the 100 TB path: an `l_returnflag` group is ~1/3
    * of the corpus and exact percentile's per-group value→count state
    * outgrows an executor, while the sketch holds O([[ApproxAccuracy]])
    * state per group at any scale. Rows-only in the harness (sketch
    * internals are engine-specific); SketchAccuracySpec pins both
    * columns inside the sketch's rank-error band of the exact twin.
    */
  def robustStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    val meds = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(ApproxAccuracy))
        .as("med"))
    // Value gate like approx_percentile: exact count and exact ±1%-rank
    // median band edges (oracle-recomputed), plus booleans — the
    // sketch median inside the exact band, and the sketch MAD inside
    // the exact band of |x − approxMed| (that band is centered on the
    // sketch's own median, so it binds as a boolean only; the same
    // framing SketchAccuracySpec uses).
    Tables.lineitem(spark, dir)
      .join(broadcast(meds), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.PercentileFast(col("l_extendedprice"),
          Seq(0.49, 0.51)).as("mb"),
        max(col("med")).as("amed"),
        percentile_approx(abs(col("l_extendedprice") - col("med")), lit(0.5),
          lit(ApproxAccuracy)).as("amad"),
        graft.functions.PercentileFast(
          abs(col("l_extendedprice") - col("med")),
          Seq(0.49, 0.51)).as("db"))
      .select(col("l_returnflag"), col("cnt"),
        element_at(col("mb"), 1).as("med_band_lo"),
        element_at(col("mb"), 2).as("med_band_hi"),
        col("amed").between(element_at(col("mb"), 1),
          element_at(col("mb"), 2)).as("med_in_band"),
        col("amad").between(element_at(col("db"), 1),
          element_at(col("db"), 2)).as("mad_in_band"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mad" -> (robustStats _),
    "agg_mad_approx" -> (robustStatsApprox _),
    "agg_percentile" -> (exactPercentile _),
    "agg_winsorized" -> (winsorizedStats _),
    "pivot_counts" -> (pivotCounts _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "flatmap_posexplode" -> (posExplode _),
    "approx_percentile" -> (approxPercentile _),
    "scalar_funcs" -> (scalarFuncs _),
    "scalar_datetime" -> (datetimeFuncs _),
    "scalar_array" -> (arrayFuncs _),
    "scalar_map" -> (scalarMap _),
    "range_join" -> (rangeJoin _),
    "band_join" -> (bandJoin _),
    "band_join_auto" -> (bandJoinAuto _),
    "cube_agg" -> (cubeAgg _),
    "set_except" -> (setExcept _),
    "approx_distinct" -> (approxDistinct _),
    "approx_distinct_incr" -> (approxDistinctIncr _),
    "approx_percentile_incr" -> (approxPercentileIncr _),
    "sql_api" -> (sqlApi _),
    "sql_lateral" -> (sqlLateral _),
    "join_nullsafe" -> (nullSafeJoin _),
  )

  val oracle: Map[String, String] = Map(
    // Sketch gates: exact counts and exact band edges recompute
    // relationally; every in-band boolean is expected TRUE — the
    // sketch's contract is what the hash binds, not its internals.
    "approx_percentile" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  quantile_cont(l_extendedprice, 0.49) AS p50_band_lo,
        |  quantile_cont(l_extendedprice, 0.51) AS p50_band_hi,
        |  quantile_cont(l_extendedprice, 0.89) AS p90_band_lo,
        |  quantile_cont(l_extendedprice, 0.91) AS p90_band_hi,
        |  TRUE AS p50_in_band, TRUE AS p90_in_band, TRUE AS ordered
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "approx_percentile_incr" ->
      s"""SELECT l_returnflag,
         |  CAST(sum(CASE WHEN l_shipdate < DATE '$PercentileIncrCut'
         |    THEN 1 ELSE 0 END) AS BIGINT) AS history_n,
         |  CAST(sum(CASE WHEN l_shipdate >= DATE '$PercentileIncrCut'
         |    THEN 1 ELSE 0 END) AS BIGINT) AS batch_n,
         |  CAST(count(*) AS BIGINT) AS merged_n,
         |  TRUE AS history_p50_in_band, TRUE AS batch_p50_in_band,
         |  TRUE AS merged_p50_in_band, TRUE AS merged_p90_in_band
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  TRUE AS within_4sigma
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_mad_approx" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
        |  quantile_cont(l_extendedprice, 0.49) AS med_band_lo,
        |  quantile_cont(l_extendedprice, 0.51) AS med_band_hi,
        |  TRUE AS med_in_band, TRUE AS mad_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "approx_distinct_incr" -> {
      val bucket = graft.queries.DedupOps
        .duckPortable64("CAST(doc_id AS VARCHAR)") + " % 100"
      s"""WITH s AS (
         |  SELECT text,
         |    CASE WHEN $bucket < ${SampleOps.TrainPct} THEN 'train'
         |         ELSE 'other' END AS split
         |  FROM documents)
         |SELECT
         |  (SELECT CAST(count(DISTINCT text) AS BIGINT) FROM s
         |   WHERE split = 'train') AS history_exact,
         |  (SELECT CAST(count(DISTINCT text) AS BIGINT) FROM s
         |   WHERE split <> 'train') AS batch_exact,
         |  (SELECT CAST(count(DISTINCT text) AS BIGINT) FROM s)
         |    AS merged_exact,
         |  TRUE AS history_in_band, TRUE AS batch_in_band,
         |  TRUE AS merged_in_band""".stripMargin
    },
    "scalar_map" ->
      """SELECT user_id, event_type, count(*) AS cnt
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS price_p50,
        |  quantile_cont(l_extendedprice, 0.9) AS price_p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // Same quantile_cont cuts, pure least/greatest clipping, and the
    // floor-micro sum — no decimal cast of the interpolated bound.
    "agg_winsorized" ->
      s"""WITH c AS (
         |  SELECT l_returnflag,
         |    quantile_cont(l_extendedprice, $WinsorLo) AS lo,
         |    quantile_cont(l_extendedprice, $WinsorHi) AS hi
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l.l_returnflag, count(*) AS cnt,
         |  CAST(sum(CAST(floor(least(greatest(l.l_extendedprice, c.lo), c.hi)
         |    * 1000000.0) AS DECIMAL(38,0))) AS BIGINT) AS win_micro_sum,
         |  CAST(sum(CASE WHEN l.l_extendedprice < c.lo THEN 1 ELSE 0 END) AS BIGINT)
         |    AS clipped_lo,
         |  CAST(sum(CASE WHEN l.l_extendedprice > c.hi THEN 1 ELSE 0 END) AS BIGINT)
         |    AS clipped_hi
         |FROM lineitem l JOIN c USING (l_returnflag)
         |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "agg_mad" ->
      """WITH m AS (
        |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, max(m.med) AS median_price,
        |  quantile_cont(abs(l.l_extendedprice - m.med), 0.5) AS mad_price,
        |  count(*) AS cnt
        |FROM lineitem l JOIN m USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "pivot_counts" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "unpivot_metrics" ->
      """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value
        |FROM orders WHERE o_orderkey < 100
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
        |FROM orders WHERE o_orderkey < 100
        |ORDER BY o_orderkey, metric""".stripMargin,
    "flatmap_posexplode" ->
      """SELECT doc_id,
        |  unnest(range(0, len(toks))) AS pos,
        |  unnest(toks) AS word
        |FROM (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id < 20) t
        |ORDER BY doc_id, pos""".stripMargin,
    // list_sort is binary-collation ascending like array_sort; DuckDB
    // slices are 1-based inclusive (tk[1:3] == slice(tk, 1, 3)); the
    // fold surfaces via list_sum with an empty-list coalesce matching
    // aggregate()'s zero seed.
    "scalar_array" ->
      """SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(tk)) AS BIGINT) AS uniq_cnt,
        |  array_to_string(list_sort(tk)[1:3], ' ') AS first3_sorted,
        |  CAST(CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END AS BIGINT) AS has_the,
        |  list_reverse(tk)[1] AS last_tok,
        |  CAST(coalesce(list_sum(list_transform(tk, t -> strlen(t))), 0) AS BIGINT) AS char_sum
        |FROM (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents WHERE doc_id < 20) t
        |ORDER BY doc_id""".stripMargin,
    // Every derived value is an epoch-day/number BIGINT; isodow aligns
    // Spark's Monday=0 weekday with DuckDB's Monday=1 isodow.
    "scalar_datetime" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
        |  CAST(isodow(o_orderdate) AS BIGINT) AS o_isodow,
        |  CAST(date_diff('day', DATE '1970-01-01',
        |       date_trunc('month', CAST(o_orderdate AS DATE))) AS BIGINT) AS month_start_day,
        |  CAST(date_diff('day', DATE '1970-01-01',
        |       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS BIGINT) AS plus30_day,
        |  CAST(date_diff('day', DATE '1970-01-01',
        |       last_day(CAST(o_orderdate AS DATE))) AS BIGINT) AS month_end_day
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin,
    "scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  CAST(day(o_orderdate) AS BIGINT) AS o_day,
        |  upper(substr(o_orderpriority, 1, 4)) AS prio4,
        |  CAST(length(o_orderstatus) AS BIGINT) AS status_len,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
        |  o_orderkey % 7 AS key_mod,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  greatest(o_custkey, o_orderkey) AS max_key
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "range_join" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // The oracle states the band predicate directly (DuckDB's IEJoin
    // handles it natively); the Spark side must produce the identical
    // relation through the bucketized equi path.
    "band_join" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders JOIN lineitem
        |  ON abs(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) <= 1
        |WHERE o_orderkey % 97 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "band_join_auto" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders JOIN lineitem
        |  ON abs(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) <= 1
        |WHERE o_orderkey % 97 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "set_except" ->
      s"""SELECT c_nationkey AS nk FROM customer
         |EXCEPT
         |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > $ExceptMinAcctbal
         |ORDER BY nk""".stripMargin,
    // DuckDB runs the LATERAL form natively; Spark decorrelates it.
    "sql_lateral" ->
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_orderpriority = p.o_orderpriority
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY p.o_orderpriority, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "join_nullsafe" ->
      """WITH f AS (SELECT nullif(o_orderkey % 7, 0) AS k FROM orders),
        |d(dk, label) AS (VALUES (1, 'one'), (2, 'two'), (NULL, 'missing'))
        |SELECT label, count(*) AS cnt
        |FROM f JOIN d ON f.k IS NOT DISTINCT FROM d.dk
        |GROUP BY label ORDER BY label""".stripMargin,
    "sql_api" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
