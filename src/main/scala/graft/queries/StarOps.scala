package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Parity

/** Extension query set over the TPC-H-ish star schema (SURVEY.md §2.3/§2.4):
  * joins in all the shapes Catalyst plans (broadcast hash, shuffled hash /
  * sort-merge, semi, anti), aggregates beyond COUNT, window functions,
  * top-k, set operations and rollup.
  *
  * Scale posture: dimension tables (`nation`, `region`) are explicitly
  * broadcast — at 100 TB the fact tables shuffle on join keys once and
  * dimensions never shuffle at all; aggregates are declared so Catalyst
  * plans partial (map-side) aggregation; every float sum routes through
  * [[Parity]]'s exact decimal arithmetic, which is simultaneously the
  * DuckDB-parity trick and the order-insensitivity guarantee a
  * 1000-executor plan needs.
  */
object StarOps {

  /** TPC-H Q1-shaped pricing summary: filter → wide aggregate. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_shipdate") <= Tables.tsLit(l, "l_shipdate", "2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Parity.dsum(col("l_quantity")).as("sum_qty"),
        Parity.dsum(col("l_extendedprice")).as("sum_base"),
        // Scale-8 product sum exceeds 2^53 unscaled at sf0.1 — double
        // surfacing hits the decimal→double double-rounding cliff, so
        // this one column is surfaced as exact cents (see dsumProdCents).
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price_cents"),
        Parity.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue per nation: 3 joins (fact ⋈ fact ⋈ dim ⋈ dim). `lineitem ⋈
    * orders` and `⋈ customer` shuffle on their keys (sort-merge/shuffled
    * hash at scale); `nation` is broadcast.
    */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= Tables.tsLit(o, "o_orderdate", "1996-01-01"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue_cents"),
        count(lit(1)).as("cnt"))
      .orderBy("n_name")
  }

  /** Left-semi join: customers that have at least one open order. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti join: customers with no orders at all. */
  /** [[joinAnti]]'s excluded order class: the anti side is "customers
    * with no order of THIS priority" — in the fixture every customer
    * has SOME order, so a bare no-orders anti-join returns the empty
    * frame on both engines and its exact oracle binds nothing (the
    * q22 lesson). The priority filter pushes to the orders scan before
    * the anti-join's key shuffle.
    */
  val AntiPriority = "1-URGENT"

  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === AntiPriority)
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Window function: top-3 orders per market segment by total price
    * (row_number with a unique tie-breaker so the pick is deterministic).
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("c_mktsegment", "rn")
  }

  /** The skew-salted equi-join exercised as a registered query:
    * [[graft.operators.Salt.saltedJoin]] spreads each supplier key's
    * lineitem rows over 8 shuffle partitions, and because any salt
    * assignment joins every probe row to exactly one replicated build
    * row, the result is identical to the plain join — which is exactly
    * what the oracle checks (its SQL is the UNSALTED join).
    */
  def joinSalted(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Salt.saltedJoin(
        Tables.lineitem(spark, dir).select("l_suppkey", "l_quantity"),
        Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey"),
        key = "l_suppkey", smallKey = "s_suppkey", factor = 8)
      .groupBy("s_nationkey")
      .agg(Parity.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("s_nationkey")

  /** [[joinSkewAqe]]'s planted skew: every lineitem row whose suppkey
    * is NOT ≡ 0 (mod this) collapses onto [[SkewHotKey]] — ~90% of the
    * fact lands in one join partition.
    */
  val SkewKeyMod = 10L

  /** The hot key the collapsed rows join through (a real suppkey, so
    * the inner join keeps them).
    */
  val SkewHotKey = 1L

  /** AQE AUTOMATIC skew-join handling, completing the skew toolkit's
    * measure → manual → automatic ladder (`audit_skew` measures the
    * key distribution, `join_salted` splits a hot key by hand, this
    * query lets the engine split it at RUNTIME): ~90% of the fact
    * collapses onto [[SkewHotKey]], the join runs as a sort-merge join
    * under adaptive execution, and AQE's OptimizeSkewedJoin splits the
    * oversized partition by mapper ranges while DUPLICATING the
    * matching dim rows per split. The body EXECUTES the query and then
    * asserts the final adaptive plan actually took the skew path
    * (`SortMergeJoin(skew=true)` + `AQEShuffleRead skewed`) — a
    * configuration drift that silently fell back to the unsplit join
    * fails loudly instead of passing on values alone. The value oracle
    * binds the same exact aggregate as `join_salted`'s (the skew split
    * must not change results).
    *
    * Fixture-scoped knobs, on a conf-isolated clone (Verify runs
    * queries concurrently): the skew thresholds scale down to fixture
    * bytes, broadcast is disabled so the join stays SMJ (at real scale
    * the dim may well broadcast — then skew handling is moot by
    * design), and the fact pre-repartitions to 8 mappers because AQE
    * splits at MAPPER granularity — a single-row-group parquet scan
    * writes the whole skewed partition from one mapper, which is
    * unsplittable. At production scale none of these knobs are needed:
    * real partitions exceed the default 256 MB threshold and scans
    * have thousands of mappers.
    */
  def joinSkewAqe(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4k")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2k")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val fact = Tables.lineitem(s, dir).select(
      when(col("l_suppkey") % SkewKeyMod === 0, col("l_suppkey"))
        .otherwise(lit(SkewHotKey)).as("k"),
      col("l_quantity"))
    val dim = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("k"), col("s_nationkey"))
    val res = fact.repartition(8).join(dim, "k")
      .groupBy("s_nationkey")
      .agg(Parity.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("s_nationkey")
    val rows = res.collect()
    // Assert on the executed plan TREE, not its rendered string: the
    // formatted markers ("skew=true", "AQEShuffleRead skewed") are
    // display strings a Spark minor version may reword, while
    // SortMergeJoinExec.isSkewJoin and the PartialReducerPartitionSpec
    // splits inside AQEShuffleReadExec are the planner facts themselves.
    // QueryStageExec/AdaptiveSparkPlanExec hold their materialized plans
    // outside `children`, so the walk descends into them explicitly.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ (p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty[SparkPlan]
      })).flatMap(flatten)
    val nodes = flatten(res.queryExecution.executedPlan)
    val skewJoin = nodes.exists {
      case s: SortMergeJoinExec => s.isSkewJoin
      case _ => false
    }
    val skewRead = nodes.exists {
      case r: AQEShuffleReadExec =>
        r.partitionSpecs.exists(_.isInstanceOf[PartialReducerPartitionSpec])
      case _ => false
    }
    require(skewJoin && skewRead,
      "AQE did not take the skew-join path — the drill's planted skew or " +
        "its scoped thresholds no longer trigger OptimizeSkewedJoin:\n" +
        res.queryExecution.executedPlan)
    // Return the ALREADY-EXECUTED result (one row per nation): handing
    // back the lazy frame would re-run the whole skewed join when the
    // caller writes/collects it, double-paying the drill.
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), res.schema)
      .orderBy("s_nationkey")
  }

  /** Pure theta join (no equi key): BroadcastNestedLoopJoin with the
    * small side broadcast. NLJ cost is |A|×|B| by construction — only
    * ever sane when one side is broadcast-small, which is why every
    * other join here carries an equi key.
    */
  def joinTheta(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)),
        col("c_acctbal") > col("s_acctbal") && col("c_nationkey") =!= col("s_nationkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("pairs"))
      .orderBy("c_mktsegment")

  /** Set union (distinct): all nation keys appearing on either side. */
  def setUnion(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  /** Top-k: orderBy + limit, planned as TakeOrderedAndProject — no full
    * global sort materializes at any scale.
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Set operation: nations that have both customers and suppliers. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  /** Rollup (grouping sets): per (flag, status), per flag, and grand
    * total. NULLS FIRST is pinned on both engines — their defaults
    * differ.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), Parity.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Aggregates beyond COUNT: sum/avg/min/max/count-distinct in one pass. */
  def aggStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        Parity.dsum(col("l_extendedprice")).as("sum_price"),
        Parity.davg(col("l_discount")).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        countDistinct(col("l_partkey")).as("distinct_parts"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Exact second-moment statistics in ONE distributed pass: sample
    * stddev and Pearson correlation derived from decimal power sums
    * (n, Σx, Σy, Σx², Σy², Σxy). Built-in float stddev/corr aggregates
    * are order-sensitive (result depends on partitioning, and engines
    * disagree); the power sums are exact decimals — map-side combinable
    * like any sum — and the closed-form double arithmetic at the end is
    * the same IEEE expression tree on both engines, so the result is
    * bit-exact and partitioning-independent. This is the shape that
    * survives a 1000-executor aggregation without a second pass.
    */
  def aggCorr(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        Parity.dsum(col("l_quantity")).as("sx"),
        Parity.dsum(col("l_extendedprice")).as("sy"),
        Parity.dsumProd(col("l_quantity"), col("l_quantity")).as("sxx"),
        Parity.dsumProd(col("l_extendedprice"), col("l_extendedprice")).as("syy"),
        Parity.dsumProd(col("l_quantity"), col("l_extendedprice")).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        // Surfaced as floor-scaled ppm longs: the power sums exceed
        // 2^53, so their decimal->double casts can differ by 1 ulp
        // between engines (DuckDB double-rounds via int128); flooring
        // at 1e6 absorbs that, in the same style as every ratio column.
        floor(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          * 1000000.0).cast("long").as("std_qty_ppm"),
        floor(((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))))
          * 1000000.0).cast("long").as("corr_ppm"))
      .orderBy("l_returnflag")

  /** SQL-standard linear-regression aggregates (the `REGR_*` family:
    * REGR_SLOPE / REGR_INTERCEPT / REGR_R2) per group — the OLS fit of
    * price on quantity from the SAME one-pass decimal power sums as
    * [[aggCorr]]: slope = Sxy/Sxx, intercept = ȳ − slope·x̄, R² =
    * Sxy²/(Sxx·Syy), all from (n, Σx, Σy, Σx², Σy², Σxy). One
    * map-side-combinable aggregation, closed form at the end — no
    * second pass, no per-group iteration, the shape `regr_slope` takes
    * on any MPP engine. The centered sums are computed once in an
    * intermediate projection so the final double tree is written
    * identically on both engines; results surface as floor-scaled ppm
    * longs in the house style.
    */
  def aggRegression(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        Parity.dsum(col("l_quantity")).as("sx"),
        Parity.dsum(col("l_extendedprice")).as("sy"),
        Parity.dsumProd(col("l_quantity"), col("l_quantity")).as("sxx"),
        Parity.dsumProd(col("l_extendedprice"), col("l_extendedprice")).as("syy"),
        Parity.dsumProd(col("l_quantity"), col("l_extendedprice")).as("sxy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        (col("sxy") - col("sx") * col("sy") / col("n")).as("cxy"),
        (col("sxx") - col("sx") * col("sx") / col("n")).as("cxx"),
        (col("syy") - col("sy") * col("sy") / col("n")).as("cyy"))
      .select(col("l_returnflag"), col("n"),
        floor(col("cxy") / col("cxx") * 1000000.0)
          .cast("long").as("slope_ppm"),
        floor((col("sy") / col("n") - col("cxy") / col("cxx") * (col("sx") / col("n")))
          * 1000000.0).cast("long").as("intercept_ppm"),
        floor(col("cxy") * col("cxy") / (col("cxx") * col("cyy")) * 1000000.0)
          .cast("long").as("r2_ppm"))
      .orderBy("l_returnflag")

  /** Welch's two-sample t statistic between every pair of groups —
    * the A/B-test / drift-detection aggregate on the same one-pass
    * power-sum machinery as [[aggCorr]]: per group (n, Σx, Σx²)
    * map-side-combine in ONE scan; the pairwise comparison is a
    * self-join of the GROUP-COUNT-sized aggregate (3 rows here —
    * bounded by distinct keys, never data), and the closed-form t and
    * Welch–Satterthwaite degrees of freedom are the same IEEE double
    * tree on both engines, surfaced as floored ppm. Unequal variances
    * and sizes are the point of Welch's form — no pooled-variance
    * assumption, the production default.
    */
  def aggTtest(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(count(lit(1)).as("n"),
        Parity.dsum(col("l_quantity")).as("sx"),
        Parity.dsumProd(col("l_quantity"), col("l_quantity")).as("sxx"))
      .select(col("flag"), col("n"), (col("sx") / col("n")).as("mean"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("vr"))
    def side(s: String) = g.select(col("flag").as(s"flag_$s"),
      col("n").as(s"n_$s"), col("mean").as(s"mean_$s"), col("vr").as(s"vr_$s"))
    side("a").join(side("b"), col("flag_a") < col("flag_b"))
      .select(col("flag_a"), col("flag_b"), col("n_a"), col("n_b"),
        (col("vr_a") / col("n_a") + col("vr_b") / col("n_b")).as("se2"),
        col("mean_a"), col("mean_b"), col("vr_a"), col("vr_b"))
      .select(col("flag_a"), col("flag_b"), col("n_a"), col("n_b"),
        floor((col("mean_a") - col("mean_b")) / sqrt(col("se2")) * 1000000.0)
          .cast("long").as("t_ppm"),
        floor(col("se2") * col("se2") /
          ((col("vr_a") / col("n_a")) * (col("vr_a") / col("n_a")) / (col("n_a") - 1) +
           (col("vr_b") / col("n_b")) * (col("vr_b") / col("n_b")) / (col("n_b") - 1))
          * 1000000.0).cast("long").as("dof_ppm"))
      .orderBy("flag_a", "flag_b")
  }

  /** Pearson χ² test of independence over the
    * returnflag × linestatus contingency table — the categorical
    * companion to [[aggTtest]]: ONE scan builds the cell counts
    * (bounded by |flags|·|statuses|, never data), margins come from
    * re-aggregating the CELLS (not the table), and each cell reports
    * its expected count and its χ² contribution. Every per-cell value
    * is a deterministic function of integer counts; the total
    * statistic is defined as the INTEGER sum of the floored per-cell
    * ppm terms (a window over the constant-size cell relation), so no
    * order-sensitive float summation exists anywhere — the discipline
    * that keeps the cross-engine compare exact. dof = (R−1)(C−1)
    * rides along.
    */
  def aggChisq(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
      .agg(count(lit(1)).as("obs"))
    val rt = cells.groupBy("flag").agg(sum("obs").as("rt"))
    val ct = cells.groupBy("status").agg(sum("obs").as("ct"))
    val tot = cells.agg(sum("obs").as("n"),
      countDistinct("flag").as("r"), countDistinct("status").as("c"))
    val all = Window.partitionBy()
    cells
      .join(broadcast(rt), "flag")
      .join(broadcast(ct), "status")
      .crossJoin(broadcast(tot))
      .select(col("flag"), col("status"), col("obs"),
        ((col("rt") * col("ct")).cast("double") / col("n")).as("e"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"))
      .select(col("flag"), col("status"), col("obs"), col("dof"),
        floor(col("e") * 1000.0).cast("long").as("exp_milli"),
        floor((col("obs") - col("e")) * (col("obs") - col("e")) / col("e")
          * 1000000.0).cast("long").as("term_ppm"))
      .withColumn("chi2_ppm", sum("term_ppm").over(all))
      .orderBy("flag", "status")
  }

  /** Exact higher moments per group: skewness and excess kurtosis from
    * integer power sums of the (integral) quantity — the one-pass,
    * map-side-combinable extension of [[aggCorr]]'s machinery to 3rd
    * and 4th moments. Sums ride DECIMAL(38,0) (a long would overflow
    * Σx⁴ past ~10^12 rows); each sum is < 2^53 at harness scale, so the
    * decimal→double casts are exact, and the closed-form double tree is
    * written identically on both engines. Surfaced as floored ppm like
    * every ratio.
    */
  def aggMoments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val xi = col("l_quantity").cast("long")
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(DecimalType(38, 0)))
    val nD = col("n").cast("double")
    val mean = col("s1").cast("double") / nD
    val t2 = col("s2").cast("double") / nD
    val t3 = col("s3").cast("double") / nD
    val t4 = col("s4").cast("double") / nD
    val m2 = t2 - mean * mean
    val m3 = t3 - lit(3.0) * mean * t2 + lit(2.0) * mean * mean * mean
    val m4 = t4 - lit(4.0) * mean * t3 + lit(6.0) * mean * mean * t2 -
      lit(3.0) * mean * mean * mean * mean
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dsum(xi).as("s1"),
        dsum(xi * xi).as("s2"),
        dsum(xi * xi * xi).as("s3"),
        dsum(xi * xi * xi * xi).as("s4"))
      .select(col("l_returnflag"), col("n"),
        floor(m3 / sqrt(m2 * m2 * m2) * 1000000.0).cast("long").as("skew_ppm"),
        floor((m4 / (m2 * m2) - lit(3.0)) * 1000000.0).cast("long").as("kurt_ppm"))
      .orderBy("l_returnflag")
  }

  /** Exact mode (most frequent value) per group, deterministic: counts
    * per (group, value) then `min_by` over (-count, value) — highest
    * count wins, ties break to the lexicographically smallest value,
    * identically to the oracle's `row_number OVER (ORDER BY cnt DESC,
    * value)`. Two map-side-combinable aggregations; the built-in `mode`
    * aggregate is tie-nondeterministic and would not oracle-check.
    */
  def aggMode(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("o_orderstatus")
      .agg(
        min_by(col("o_orderpriority"),
          struct((-col("cnt")).as("nc"), col("o_orderpriority"))).as("mode_priority"),
        max(col("cnt")).as("mode_cnt"))
      .orderBy("o_orderstatus")

  /** The typed `Aggregator[IN,BUF,OUT]` surface (SURVEY §7.3) inside a
    * relational `agg()`: quantity-weighted average discount per flag via
    * [[graft.functions.WeightedAvg]], next to a built-in count.
    */
  def typedWavg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val wavg = udaf(graft.functions.WeightedAvg,
      org.apache.spark.sql.Encoders.row(StructType(Seq(
        StructField("v", DoubleType), StructField("w", DoubleType)))))
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        wavg(col("l_discount"), col("l_quantity")).as("wavg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** Top-3 orders per priority through the bounded
    * [[graft.functions.TopKAgg]] aggregator — the partial-combine
    * alternative to `window_rank`'s full per-group sort: each partition
    * reduces to ≤ k rows per group BEFORE the exchange, so the shuffle
    * volume is O(groups × k × partitions) at any corpus size. Scores are
    * compared, never combined, so the window-function oracle matches
    * bit-for-bit.
    */
  def topkGroups(spark: SparkSession, dir: String): DataFrame = {
    val top3 = graft.functions.TopKAgg.asUdaf(3)
    val agg = Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
    graft.functions.TopKAgg.exploded(agg, "top", Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("rank"),
        col("key").as("o_orderkey"), col("score").as("o_totalprice"))
      .orderBy("o_orderpriority", "rank")
  }

  /** TPC-H Q3-shaped shipping-priority query: the canonical three-way
    * fact ⋈ fact ⋈ dim shape with selective filters on all three inputs
    * and a top-k head. The segment-filtered customer keys are broadcast
    * (dimension-sized after the filter); lineitem and orders shuffle
    * once each on the order key; both date predicates push into the
    * parquet scans; and the top-10 head plans as TakeOrderedAndProject,
    * so no global sort materializes at any corpus size. The order date
    * rides through the aggregate as max() (it is functionally dependent
    * on the order key) and surfaces as epoch seconds for engine-neutral
    * comparison.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    l.filter(col("l_shipdate") > Tables.tsLit(l, "l_shipdate", "1997-06-30"))
      .join(o.filter(col("o_orderdate") < Tables.tsLit(o, "o_orderdate", "1997-06-30")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(building), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("revenue_cents"),
        max(unix_timestamp(col("o_orderdate").cast("timestamp"))).as("odate_s"))
      .orderBy(desc("revenue_cents"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped 6-way join: revenue by nation for one region and
    * one order year, where the supplier must be LOCAL to the customer
    * (same nation) — the join-graph stress case a warehouse optimizer
    * must get right. The region→nation prune happens before any fact is
    * touched (two dims broadcast as one 5-row build side); the
    * customer/orders/lineitem/supplier chain shuffles once per equi key
    * with Catalyst + AQE picking build sides from runtime sizes; the
    * local-supplier condition rides the supplier join as a second
    * conjunct, never a post-join filter over a wider product.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    Tables.lineitem(spark, dir)
      .join(o.filter(col("o_orderdate") >= Tables.tsLit(o, "o_orderdate", "1996-01-01")
          && col("o_orderdate") < Tables.tsLit(o, "o_orderdate", "1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("revenue_cents"),
        count(lit(1)).as("cnt"))
      .orderBy(desc("revenue_cents"), asc("n_name"))
  }

  /** [[q6Forecast]]'s predicate window, mirrored in the oracle. */
  val Q6DiscLo = 0.05
  val Q6DiscHi = 0.07
  val Q6MaxQty = 24.0

  /** TPC-H Q6-shaped REVENUE FORECAST: the pure scan-filter-aggregate
    * probe — what would revenue change by if discounts in a band were
    * dropped for one ship year. No join at all: the whole query is one
    * parquet scan whose date range and quantity/discount bounds PUSH
    * DOWN to the reader (range predicates on the raw columns, never
    * `year()`-wrapped expressions that would defeat pushdown), one
    * map-side partial sum, one 1-row exchange. Discount bounds compare
    * against the identical double literals both engines parse, and the
    * revenue is the exact-decimal cents sum.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(
        col("l_shipdate") >= Tables.tsLit(l, "l_shipdate", "1996-01-01") &&
        col("l_shipdate") < Tables.tsLit(l, "l_shipdate", "1997-01-01") &&
        col("l_discount") >= Q6DiscLo && col("l_discount") <= Q6DiscHi &&
        col("l_quantity") < Q6MaxQty)
      .agg(count(lit(1)).as("cnt"),
        Parity.dsumProdCents(col("l_extendedprice"), col("l_discount"))
          .as("revenue_cents"))
  }

  /** TPC-H Q10-shaped RETURNED-ITEM REPORT: the top 20 customers by
    * revenue lost to returns in one order quarter. The returnflag and
    * order-date predicates both push to their fact scans before the
    * one data-scale shuffle (lineitem ⋈ orders on the order key);
    * customer attaches by key and the 3-row nation dim broadcasts.
    * The final top-20 is a TakeOrderedAndProject (per-partition heads,
    * never a global sort), tie-broken by customer key; the account
    * balance surfaces as exact floor-cents.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(o.filter(
          col("o_orderdate") >= Tables.tsLit(o, "o_orderdate", "1996-01-01") &&
          col("o_orderdate") < Tables.tsLit(o, "o_orderdate", "1996-04-01"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        floor(col("c_acctbal") * 100).cast("long").as("acctbal_cents"),
        col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("revenue_cents"))
      .orderBy(desc("revenue_cents"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-shaped PROMOTION EFFECT: the share of one ship-month's
    * revenue that came from promoted parts. The date predicate pushes
    * to the lineitem scan; part attaches by key (projected to two
    * columns — AQE broadcasts it at fixture scale, and at any scale
    * the join shuffles on the part key, never wider than the two fact
    * columns). Both revenue sums ride ONE aggregation over the same
    * decimal product (the promo side zeroes non-promo rows), and the
    * promo share surfaces as integer ppm from the two exact cents
    * values — `promo_cents * 1e6 div total_cents`, exact cross-engine,
    * no double ratio anywhere.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(
        col("l_shipdate") >= Tables.tsLit(l, "l_shipdate", "1996-03-01") &&
        col("l_shipdate") < Tables.tsLit(l, "l_shipdate", "1996-04-01"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        Parity.dsumProdCents(
          when(col("p_type") === "PROMO", col("l_extendedprice"))
            .otherwise(lit(0.0)),
          lit(1.0) - col("l_discount")).as("promo_cents"),
        Parity.dsumProdCents(col("l_extendedprice"),
          lit(1.0) - col("l_discount")).as("total_cents"))
      .selectExpr("promo_cents", "total_cents",
        // nullif guards an empty ship-month identically on both
        // engines (DuckDB's // would RAISE on a zero denominator
        // where Spark's div yields NULL — the guarded forms agree).
        "promo_cents * 1000000 div nullif(total_cents, 0) AS promo_ppm")
  }

  /** [[q13CustDist]] excludes this priority class, mirroring TPC-H
    * Q13's comment-pattern exclusion with a column the schema has.
    */
  val Q13Excluded = "1-URGENT"

  /** TPC-H Q13-shaped CUSTOMER ORDER-COUNT DISTRIBUTION: how many
    * customers placed exactly k qualifying orders, INCLUDING the
    * zero-order customers only a LEFT join can see (the shape's whole
    * point — an inner join silently drops the biggest bucket). The
    * exclusion predicate rides the JOIN CONDITION, not a post-filter
    * (filtering after the join would turn excluded-only customers into
    * zero-count rows twice). Two shuffles at any scale: customer⋈orders
    * on the customer key, then the counts-of-counts aggregate over a
    * customers-sized frame.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= Q13Excluded)
      .select("o_orderkey", "o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** [[q15TopSupplier]] revenue quarter. */
  val Q15From = "1996-01-01"
  val Q15To = "1996-04-01"

  /** TPC-H Q15-shaped TOP SUPPLIER: the supplier(s) achieving the
    * maximum quarterly revenue — the "view + max = view.revenue" shape
    * without the view. Revenue lands as exact floor-cents per supplier
    * (a suppliers-sized frame, localCheckpointed because both the max
    * and the equality probe read it), the 1-row max broadcasts back,
    * and ties are all reported (deterministic without tie-breaks).
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val rev = l.filter(
        col("l_shipdate") >= Tables.tsLit(l, "l_shipdate", Q15From) &&
        col("l_shipdate") < Tables.tsLit(l, "l_shipdate", Q15To))
      .groupBy("l_suppkey")
      .agg(Parity.dsumProdCents(col("l_extendedprice"),
        lit(1.0) - col("l_discount")).as("revenue_cents"))
      .localCheckpoint()
    rev.join(broadcast(rev.agg(max("revenue_cents").as("mx"))),
        col("revenue_cents") === col("mx"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
      .orderBy("s_suppkey")
  }

  /** [[q18BigOrders]] quantity threshold (sum over the order's lines). */
  val Q18MinQty = 300

  /** TPC-H Q18-shaped LARGE-VOLUME CUSTOMERS: orders whose total line
    * quantity clears [[Q18MinQty]], with their customer and value. The
    * HAVING prunes the order-key aggregate to a tiny frame BEFORE any
    * join, so the probe side of both joins is the handful of big
    * orders (AQE broadcasts it), and the top-100 is a
    * TakeOrderedAndProject on exact cents with the order key as the
    * tie-break. Quantities stay DECIMAL through the sum and compare
    * (the q1 spelling) — the threshold test is exact on both engines.
    */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 4)
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(dec)).as("qdec"))
      .filter(col("qdec") > Q18MinQty)
    big.join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("totalprice_cents"),
        col("qdec").cast("double").as("total_qty"))
      .orderBy(desc("totalprice_cents"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q17-shaped SMALL-QUANTITY-ORDER REVENUE: revenue from lines
    * whose quantity is below a fifth of their part's average order
    * quantity. The per-part average never materializes as a DIVISION:
    * `qty < avg/5` rearranges to `5·qty·cnt < sum` — three exact
    * DECIMAL terms, so the threshold test is bit-exact on both engines
    * (a double average would wobble at the boundary). Per-part
    * (sum, cnt) is a parts-sized aggregate joined back on the part
    * key — a SHUFFLE join on purpose (the parts dimension scales with
    * the data; AQE may still broadcast it at small scale), so the plan
    * is two shuffles on the same key at any size.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 4)
    val l = Tables.lineitem(spark, dir)
    val perPart = l.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast(dec)).as("qsum"),
        count(lit(1)).as("qcnt"))
    l.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast(dec) * 5 * col("qcnt") < col("qsum"))
      .agg(count(lit(1)).as("cnt"),
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0))
          .as("revenue_cents"))
  }

  /** [[q19Disjunct]] brand/quantity bands, mirrored in the oracle. */
  val Q19BrandA = "Brand#1"
  val Q19BrandB = "Brand#2"
  val Q19QtyA = (1, 15)
  val Q19QtyB = (10, 25)

  /** TPC-H Q19-shaped DISCOUNTED REVENUE under a DISJUNCTION of
    * brand × quantity-band conjunctions — the shape that exercises
    * OR-of-AND predicate handling: the join stays a plain key join and
    * the disjunction evaluates post-join (it references both sides),
    * while each side's single-table conjuncts (quantity ceiling, size
    * floor) still push to their scans.
    */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === Q19BrandA &&
          col("l_quantity") >= Q19QtyA._1 && col("l_quantity") <= Q19QtyA._2 &&
          col("p_size") >= 1 && col("p_size") <= 20) ||
        (col("p_brand") === Q19BrandB &&
          col("l_quantity") >= Q19QtyB._1 && col("l_quantity") <= Q19QtyB._2 &&
          col("p_size") >= 1 && col("p_size") <= 40))
      .agg(count(lit(1)).as("cnt"),
        Parity.dsumProdCents(col("l_extendedprice"),
          lit(1.0) - col("l_discount")).as("revenue_cents"))
  }

  /** [[q22IdleCustomers]] idleness cutoff: a customer is idle when it
    * placed no order ON OR AFTER this date (the fixture's order dates
    * run 1995-01..2001-08, and every customer has SOME order, so the
    * reference Q22's "no orders ever" arm would be vacuously empty —
    * the gate must bind rows the anti-join actually produces).
    */
  val Q22IdleSince = "1997-06-01"

  /** TPC-H Q22-shaped IDLE WEALTHY CUSTOMERS: per nation, the count
    * and balance of customers who hold more than HALF the average
    * positive balance yet placed no orders since [[Q22IdleSince]] —
    * the scalar-subquery + anti-join shape. The 1-row average
    * broadcasts onto the customer scan; the date predicate pushes to
    * the orders scan BEFORE the anti-join shuffles on the customer
    * key. The average itself is a DECIMAL ratio surfaced only as a
    * filter bound: the compare rearranges to `acctbal · cnt · 2 >
    * sum` (division-free, exact).
    */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 4)
    val c = Tables.customer(spark, dir)
    val avgPos = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast(dec)).as("bsum"),
        count(lit(1)).as("bcnt"))
    val o = Tables.orders(spark, dir)
    c.join(broadcast(avgPos),
        col("c_acctbal").cast(dec) * col("bcnt") * 2 > col("bsum"))
      .join(o.filter(
          col("o_orderdate") >= Tables.tsLit(o, "o_orderdate", Q22IdleSince))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        expr("CAST(floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT)")
          .as("totacctbal_cents"))
      .orderBy("n_name")
  }

  /** The two trading partners of [[q7Volume]]. */
  val Q7NationA = "NATION_1"
  val Q7NationB = "NATION_2"

  /** TPC-H Q7-shaped VOLUME SHIPPING: bilateral trade between two
    * nations by ship year — supplier nation from the lineitem side,
    * customer nation through orders, revenue as exact cents per
    * (supp_nation, cust_nation, year). The nation dims PRUNE to the
    * two partners before any fact scan and broadcast onto
    * supplier/customer (the q5 discipline), so the fact pipeline is
    * lineitem ⋈ broadcast(supp) ⋈ orders ⋈ broadcast(cust) — the only
    * data-scale shuffle is lineitem⋈orders on the order key, and the
    * asymmetric-pair filter drops mismatched directions before the
    * aggregation. Year extraction via `year()` on the timestamp is
    * calendar-portable across both engines.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val partners = Tables.nation(spark, dir)
      .filter(col("n_name").isin(Q7NationA, Q7NationB))
      .select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(partners), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(partners), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === Q7NationA && col("cust_nation") === Q7NationB) ||
        (col("supp_nation") === Q7NationB && col("cust_nation") === Q7NationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("cnt"),
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** The observed nation / market / product slice of [[q8MarketShare]]. */
  val Q8Nation = "NATION_1"
  val Q8Region = "ASIA"
  val Q8Type = "PROMO"

  /** TPC-H Q8-shaped NATIONAL MARKET SHARE: of all [[Q8Type]]-part
    * revenue sold to customers in [[Q8Region]], what fraction per
    * order year was supplied by [[Q8Nation]] — the classic
    * numerator-inside-denominator share query. Both sums ride ONE
    * aggregation over the same joined scan (the nation-only numerator
    * is a conditional decimal sum — no second pass, no self-join), and
    * the share is integer-cents division, exact in both engines. The
    * part/region/nation dims prune-and-broadcast before the fact scan;
    * customer and supplier attach by key like every star join here.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === Q8Type).select("p_partkey")
    val marketCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === Q8Region)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val nationPrice =
      when(col("supp_nation") === Q8Nation, col("l_extendedprice"))
        .otherwise(lit(0.0))
    Tables.lineitem(spark, dir)
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("cnt"),
        Parity.dsumProdCents(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("total_cents"),
        Parity.dsumProdCents(nationPrice, lit(1.0) - col("l_discount"))
          .as("nation_cents"))
      .select(col("o_year"), col("cnt"), col("total_cents"), col("nation_cents"),
        expr("(nation_cents * 1000000) div total_cents").as("share_ppm"))
      .orderBy("o_year")
  }

  /** Spearman rank correlation per group, exactly: Pearson over DOUBLED
    * average ranks. A tie group occupying ranks [r, r+c-1] has average
    * rank r + (c-1)/2 — doubling (2r + c − 1 = 2·cum − c + 1) keeps
    * every rank an integer, so the power sums are exact (integers
    * < 2^53 ride [[Parity]]'s decimal route) and the closed-form double
    * arithmetic at the end is the same IEEE tree on both engines —
    * bit-exact like [[aggCorr]].
    *
    * Rank computation runs over DISTINCT (group, value) pairs — count
    * per value, then a cumulative sum along the value order — instead
    * of a rank window over the raw rows. A raw-row window puts a whole
    * group on one task (3 giant partitions at 100 TB); the distinct
    * formulation's heavy shuffle is keyed by (group, value) — well
    * distributed — and the window only sorts the distinct-value frame.
    *
    * No rank is ever joined back: l_quantity has ~50 distinct values
    * per group, so its rank map BROADCASTS onto the base scan, and the
    * near-unique l_extendedprice side's tie-adjusted doubled rank
    * comes from a RANGE-frame window (peers included) minus a
    * peer-count window over the range-partitioned rows directly — no
    * cell pre-aggregation, no checkpoint, ONE exchange total on the
    * heavy side.
    *
    * The prefix-sum's second pass FUSES into the final aggregation
    * instead of joining offsets back per row (the generic
    * [[graft.operators.PrefixSum]] shape this replaces): with
    * dy = A + 2·offset, where A = 2·local_cum − c + 1 is computable
    * WITHIN an order-preserving price bucket (floor(price/W) is
    * monotone, so ties never split and bucket order is price order)
    * and offset is the per-(bucket, group) row-count prefix, every
    * group-level power sum expands polynomially —
    * `Σ dy    = ΣA    + 2·offset·n_p`,
    * `Σ dy²   = ΣA²   + 4·offset·ΣA + 4·offset²·n_p`,
    * `Σ dy·dx = ΣA·dx + 2·offset·Σdx` —
    * so one pass over the bucket-clustered rows (two windows sharing
    * one sort, then a partial aggregation to ONE row per
    * (bucket, group)) followed by driver-scale arithmetic on that
    * ≤ buckets × groups frame replaces the former cell hash-agg, its
    * corpus-scale localCheckpoint, the broadcast offsets join-back,
    * AND the corpus-scale final group exchange — and because the
    * bucket is a VALUE function, the whole heavy side rides ONE hash
    * exchange (range partitioning cost a sampling pass, the range
    * exchange, and a second exchange for the window, since
    * spark_partition_id is opaque to Catalyst). No task ever windows
    * a whole group (the quantity-side window touches only the
    * ~150-row distinct-quantity frame; the price-side windows are
    * bounded by one bucket). Sums stay DECIMAL end-to-end (integers —
    * exact at any scale, the [[Parity]] route; a long-product variant
    * overflows at ~1.5e9 rows/group); the polynomial regrouping is
    * exact integer arithmetic, so the final double closed form is the
    * SAME IEEE tree as the oracle's — the oracle text is unchanged.
    * Boundary invariance: WHERE the bucket boundaries land only moves
    * rows between (A, offset) decompositions of the same dy, never
    * changes a group sum.
    */
  /** [[aggSpearman]]'s price-bucket width: prices span ~[900, 105000],
    * so ~26 buckets per group at any scale factor — enough parallelism
    * for the local windows at fixture scale, tiny offsets frame. At
    * 100 TB the width is sized from column stats (min/max/ndv) so one
    * (bucket, group) slice fits a task.
    */
  val SpearmanBucketWidth = 4096.0

  def aggSpearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 4)
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qRanks = base.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
      .select(col("l_returnflag"), col("l_quantity"),
        (sum("c").over(wq) * 2 - col("c") + 1).cast("double").as("dx"))
    // ORDER-PRESERVING VALUE BUCKETS instead of a range exchange:
    // floor(price / W) is monotone in price (bucket order = price
    // order, ties never split), so the local window can partition by
    // (bucket, group) directly — ONE hash exchange of the annotated
    // rows total, where range partitioning cost a sampling pass, the
    // range exchange, AND a second hash exchange for the window's
    // required clustering (spark_partition_id is opaque to Catalyst).
    // Bucket boundaries are a deterministic function of the VALUE, not
    // of sampled split points. At 100 TB the width is chosen from
    // column stats so a (bucket, group) slice fits a task — same
    // sizing rule as every range split.
    val bucketed = base.join(broadcast(qRanks), Seq("l_returnflag", "l_quantity"))
      .withColumn("__b",
        floor(col("l_extendedprice") / lit(SpearmanBucketWidth)).cast("long"))
    // Doubled tie-average rank, bucket-locally: the RANGE frame
    // includes the current row's price PEERS (2·cum counts through the
    // whole tie cell), and the peer-count window supplies c.
    val cumW = Window.partitionBy(col("__b"), col("l_returnflag"))
      .orderBy("l_extendedprice")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cellW = Window.partitionBy(col("__b"), col("l_returnflag"),
      col("l_extendedprice"))
    val aCol = (count(lit(1)).over(cumW) * 2 -
      count(lit(1)).over(cellW) + 1).cast(dec)
    val dxD = col("dx").cast(dec)
    val per = bucketed.withColumn("__a", aCol)
      .groupBy(col("__b"), col("l_returnflag"))
      .agg(count(lit(1)).as("ptot"),
        sum(dxD).as("sdx_t"),
        sum(dxD * dxD).as("sdxx_t"),
        sum(col("__a")).as("sac"),
        sum(col("__a") * col("__a")).as("sa2c"),
        sum(col("__a") * dxD).as("sasdx"))
    // 2·offset per (bucket, group): the row-count prefix over earlier
    // (lower-priced) buckets of the same group — a window over the
    // tiny per-bucket frame.
    val offW = Window.partitionBy("l_returnflag").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    per.withColumn("__off2",
        (coalesce(sum("ptot").over(offW), lit(0L)) * 2).cast(dec))
      .groupBy("l_returnflag")
      .agg(
        sum("ptot").as("n"),
        sum("sdx_t").cast("double").as("sx"),
        sum(col("sac") + col("__off2") * col("ptot").cast(dec))
          .cast("double").as("sy"),
        sum("sdxx_t").cast("double").as("sxx"),
        sum(col("sa2c") + col("__off2") * col("sac") * 2 +
            col("__off2") * col("__off2") * col("ptot").cast(dec))
          .cast("double").as("syy"),
        sum(col("sasdx") + col("__off2") * col("sdx_t"))
          .cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        floor(((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))))
          * 1000000.0).cast("long").as("spearman_ppm"))
      .orderBy("l_returnflag")
  }

  /** Quantile-bin resolution for [[aggSpearmanApprox]]. Rank error from
    * binning is ≤ n/[[SpearmanBins]] rows per value, so the bin-index
    * correlation converges to Spearman at O(1/bins).
    */
  val SpearmanBins = 256

  /** Sketch twin of [[aggSpearman]] — the bounded-state 100 TB path for
    * the last exact-sort aggregate, mirroring the agg_mad /
    * agg_mad_approx pairing: exact average ranks (a distinct-value
    * window plus two joins back) are replaced by QUANTILE-BIN indices.
    * Each group keeps [[SpearmanBins]]−1 approximate cut points per
    * column (`percentile_approx`, O(accuracy) state regardless of group
    * size), the cuts broadcast back like a model artifact, every row's
    * approximate rank is its bin index (the native
    * [[graft.functions.SortedRank]] binary search — O(log bins) inside
    * whole-stage codegen, where the HOF `size(filter(...))` form
    * interprets O(bins) boxed compares per row and measured 11.8s vs
    * ~1s at sf0.1; no window, no join on values, no distinct frame),
    * and Pearson over the two bin indices is the estimate. Monotone-
    * invariant like true Spearman (bins are order statistics); ties
    * share a bin by construction. Rows-only in the harness (sketch cut
    * points are engine-specific); SketchAccuracySpec pins the estimate
    * inside a fixed band of the exact twin.
    */
  def aggSpearmanApprox(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val fracs = array((1 until SpearmanBins).map(i =>
      lit(i.toDouble / SpearmanBins)): _*)
    val cuts = base.groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_quantity").cast("double"), fracs,
          lit(ScalarOps.ApproxAccuracy)).as("cx"),
        percentile_approx(col("l_extendedprice").cast("double"), fracs,
          lit(ScalarOps.ApproxAccuracy)).as("cy"))
    val approx = base.join(broadcast(cuts), "l_returnflag")
      .select(col("l_returnflag"),
        graft.functions.SortedRank(col("cx"), col("l_quantity").cast("double"))
          .cast("double").as("bx"),
        graft.functions.SortedRank(col("cy"), col("l_extendedprice").cast("double"))
          .cast("double").as("by"))
      .groupBy("l_returnflag")
      .agg(corr(col("bx"), col("by")).as("r"))
      .select(col("l_returnflag"),
        floor(col("r") * 1000000.0).cast("long").as("approx_ppm"))
    // Value gate: the exact twin runs alongside (shared oracle text)
    // and the binned estimate binds as a boolean inside the 10000-ppm
    // band SketchAccuracySpec pins — the sketch cut points themselves
    // have no SQL twin, their contract does.
    aggSpearman(spark, dir)
      .join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("spearman_ppm"),
        (abs(col("approx_ppm") - col("spearman_ppm")) <= lit(10000L))
          .as("within_band"))
      .orderBy("l_returnflag")
  }

  /** Full outer join: per-nation customer and supplier counts with
    * presence on either side — the join variant where neither input is
    * the anchor. Both sides pre-aggregate to nation-sized frames before
    * joining, so the outer join itself touches rows = |nations| at any
    * corpus size.
    */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    c.join(s, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  /** Multiset EXCEPT ALL: order multiplicity per customer minus the
    * customer row itself — set ops with duplicate semantics (distinct
    * variants are `set_union`/`set_intersect`/`set_except`). Spark
    * plans exceptAll as a counted anti-multiplicity join, not a
    * distinct exchange.
    */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_custkey").as("k"))
      .exceptAll(Tables.customer(spark, dir).select(col("c_custkey").as("k")))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  /** Range partitions for the Pareto prefix sum (at production scale:
    * sized so each holds a memory-friendly slice of the CUSTOMER
    * relation, not the order rows).
    */
  val ParetoPartitions = 32

  /** Revenue concentration (Pareto) analysis — "how many customers make
    * up 80% of revenue": per-customer exact cents revenue, a GLOBAL
    * cumulative sum over (revenue desc, custkey), and the crossing
    * point. The cumulative sum runs through
    * [[graft.operators.PrefixSum]] — range partitioning + per-partition
    * running sums + a broadcast offset join — because the naive
    * `Window.orderBy` with no partition key would drag the whole
    * relation into ONE task; here every window is bounded by a range
    * split, and only the per-PARTITION totals (≤ [[ParetoPartitions]]
    * rows) see a global window. All-integer cents arithmetic keeps the
    * crossing-point comparison exact on both engines (cum·5 < total·4 ⇔
    * cum < 80%).
    */
  def pareto(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(Parity.dsumCents(col("o_totalprice")).as("rev"))
    val cum = graft.operators.PrefixSum.withRunningTotal(
      rev, Seq(desc("rev"), asc("o_custkey")), col("rev"), ParetoPartitions)
    val t = rev.agg(sum(col("rev")).as("total"), count(lit(1)).as("customers"))
    cum.crossJoin(broadcast(t))
      .agg(max(col("customers")).as("customers"),
        max(col("total")).as("total_cents"),
        (sum(when(col("cum") * 5 < col("total") * 4, 1L).otherwise(0L)) + lit(1L))
          .as("top80_customers"),
        min(when(col("cum") * 5 >= col("total") * 4, col("cum"))).as("covered"))
      .select(col("customers"), col("total_cents"), col("top80_customers"),
        expr("(covered * 1000000) div total_cents").as("covered_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_pareto" -> (pareto _),
    "typed_wavg" -> (typedWavg _),
    "q3_shipping" -> (q3Shipping _),
    "agg_spearman" -> (aggSpearman _),
    "agg_spearman_approx" -> (aggSpearmanApprox _),
    "join_full" -> (joinFull _),
    "set_exceptall" -> (setExceptAll _),
    "topk_groups" -> (topkGroups _),
    "q1_pricing" -> (q1Pricing _),
    "join_revenue" -> (joinRevenue _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q7_volume" -> (q7Volume _),
    "q8_market_share" -> (q8MarketShare _),
    "q6_forecast" -> (q6Forecast _),
    "q10_returns" -> (q10Returns _),
    "q14_promo" -> (q14Promo _),
    "q13_custdist" -> (q13CustDist _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q18_big_orders" -> (q18BigOrders _),
    "q17_small_qty" -> (q17SmallQty _),
    "q19_disjunct" -> (q19Disjunct _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "window_rank" -> (windowRank _),
    "topk_orders" -> (topkOrders _),
    "join_theta" -> (joinTheta _),
    "join_salted" -> (joinSalted _),
    "join_skew_aqe" -> (joinSkewAqe _),
    "agg_corr" -> (aggCorr _),
    "agg_regression" -> (aggRegression _),
    "agg_ttest" -> (aggTtest _),
    "agg_chisq" -> (aggChisq _),
    "agg_moments" -> (aggMoments _),
    "set_union" -> (setUnion _),
    "set_intersect" -> (setIntersect _),
    "rollup_agg" -> (rollupAgg _),
    "agg_stats" -> (aggStats _),
    "agg_mode" -> (aggMode _),
  )

  /** agg_spearman's exact statement — shared verbatim with the
    * approx twin's gate so the two cannot drift.
    */
  private val duckSpearman: String =
      """WITH r AS (
        |  SELECT l_returnflag,
        |    CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) * 2
        |      + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS DOUBLE) AS dx,
        |    CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) * 2
        |      + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS DOUBLE) AS dy
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(dx AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(dy AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(dx AS DECIMAL(28,4)) * CAST(dx AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(dy AS DECIMAL(28,4)) * CAST(dy AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(dx AS DECIMAL(28,4)) * CAST(dy AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        |  FROM r GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(floor((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) * 1000000.0) AS BIGINT) AS spearman_ppm
        |FROM s ORDER BY l_returnflag""".stripMargin

  val oracle: Map[String, String] = Map(
    // The cents chain is dsumCents' documented twin; the tie-broken
    // global order makes RANGE/ROWS frames identical, and the 80%
    // crossing is pure integer comparison.
    "agg_pareto" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(30,4)) * 100) AS BIGINT) AS rev
        |  FROM orders GROUP BY o_custkey),
        |c AS (
        |  SELECT o_custkey, rev,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS cum
        |  FROM r),
        |t AS (SELECT CAST(sum(rev) AS BIGINT) AS total, count(*) AS customers FROM r),
        |k AS (
        |  SELECT
        |    CAST(sum(CASE WHEN cum * 5 < total * 4 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS top80,
        |    CAST(min(CASE WHEN cum * 5 >= total * 4 THEN cum END) AS BIGINT) AS covered
        |  FROM c, t)
        |SELECT t.customers, t.total AS total_cents, k.top80 AS top80_customers,
        |  (k.covered * 1000000) // t.total AS covered_ppm
        |FROM t, k""".stripMargin,
    "join_full" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust,
        |  coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp
        |           FROM supplier GROUP BY s_nationkey) s
        |  ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,
    "set_exceptall" ->
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS k FROM customer) t
        |GROUP BY k ORDER BY k""".stripMargin,
    "agg_spearman" -> duckSpearman,
    // The binned twin: exact n and the EXACT spearman_ppm recompute
    // through the shared statement, and the sketch-binned estimate
    // binds as a boolean inside the 10000-ppm band SketchAccuracySpec
    // pins (quantile binning at 256 bins bounds rank error at n/256).
    "agg_spearman_approx" ->
      s"""WITH ex AS MATERIALIZED ($duckSpearman)
         |SELECT l_returnflag, n, spearman_ppm,
         |  TRUE AS within_band
         |FROM ex ORDER BY l_returnflag""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents,
        |  CAST(max(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS odate_s
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "topk_groups" ->
      """SELECT o_orderpriority, CAST(rank AS BIGINT) AS rank,
        |  o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) t
        |WHERE rank <= 3
        |ORDER BY o_orderpriority, rank""".stripMargin,
    "typed_wavg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |  / CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS wavg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
        |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS sum_disc_price_cents,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents,
        |  count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "join_revenue" ->
      """SELECT n_name,
        |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents,
        |  count(*) AS cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey AND o_orderpriority = '$AntiPriority')
         |ORDER BY c_custkey""".stripMargin,
    "window_rank" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    // Power sums stay < 2^53 (integral quantities ≤ 50), so every
    // decimal→double cast is exact and the closed-form double tree —
    // written with identical association on both sides — cannot differ.
    "agg_moments" ->
      """SELECT l_returnflag, n,
        |  CAST(floor(m3 / sqrt(m2*m2*m2) * 1000000.0) AS BIGINT) AS skew_ppm,
        |  CAST(floor((m4 / (m2*m2) - 3.0) * 1000000.0) AS BIGINT) AS kurt_ppm
        |FROM (
        |  SELECT l_returnflag, n,
        |    t2 - mean*mean AS m2,
        |    t3 - 3.0*mean*t2 + 2.0*mean*mean*mean AS m3,
        |    t4 - 4.0*mean*t3 + 6.0*mean*mean*t2 - 3.0*mean*mean*mean*mean AS m4
        |  FROM (
        |    SELECT l_returnflag, n,
        |      s1 / nd AS mean, s2 / nd AS t2, s3 / nd AS t3, s4 / nd AS t4
        |    FROM (
        |      SELECT l_returnflag, count(*) AS n,
        |        CAST(count(*) AS DOUBLE) AS nd,
        |        CAST(sum(xi) AS DOUBLE) AS s1,
        |        CAST(sum(xi*xi) AS DOUBLE) AS s2,
        |        CAST(sum(xi*xi*xi) AS DOUBLE) AS s3,
        |        CAST(sum(xi*xi*xi*xi) AS DOUBLE) AS s4
        |      FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS xi
        |            FROM lineitem) t
        |      GROUP BY l_returnflag) a) b) c
        |ORDER BY l_returnflag""".stripMargin,
    "agg_corr" ->
      """SELECT l_returnflag, n,
        |  CAST(floor(sqrt((sxx - sx*sx/n) / (n - 1)) * 1000000.0) AS BIGINT) AS std_qty_ppm,
        |  CAST(floor((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) * 1000000.0) AS BIGINT) AS corr_ppm
        |FROM (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    -- one side widened to DECIMAL(28,4): DuckDB multiplies the
        |    -- stored integers BEFORE widening, so (18,4)x(18,4) overflows
        |    -- int64 for price*price; the wide form is still exact at
        |    -- scale 8, matching Spark's DECIMAL(37,8) product bit-for-bit
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag) t
        |ORDER BY l_returnflag""".stripMargin,
    // Same decimal power-sum block as agg_corr; the centered sums land
    // in an intermediate projection so the closed-form double tree is
    // the IDENTICAL IEEE expression on both engines.
    "agg_regression" ->
      """SELECT l_returnflag, n,
        |  CAST(floor(cxy / cxx * 1000000.0) AS BIGINT) AS slope_ppm,
        |  CAST(floor((sy / n - cxy / cxx * (sx / n)) * 1000000.0) AS BIGINT) AS intercept_ppm,
        |  CAST(floor(cxy * cxy / (cxx * cyy) * 1000000.0) AS BIGINT) AS r2_ppm
        |FROM (
        |  SELECT l_returnflag, n, sx, sy,
        |    sxy - sx*sy/n AS cxy,
        |    sxx - sx*sx/n AS cxx,
        |    syy - sy*sy/n AS cyy
        |  FROM (
        |    SELECT l_returnflag, count(*) AS n,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |      CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        |    FROM lineitem GROUP BY l_returnflag) s) t
        |ORDER BY l_returnflag""".stripMargin,
    // The group aggregate (3 rows) is the only data-scale work; the
    // pairwise self-join and the t / Welch-dof trees are written as
    // the SAME IEEE expression both sides.
    "agg_ttest" ->
      """WITH g AS (
        |  SELECT flag, n, sx / n AS mean,
        |    (sxx - sx*sx/n) / (n - 1) AS vr
        |  FROM (
        |    SELECT l_returnflag AS flag, count(*) AS n,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(28,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx
        |    FROM lineitem GROUP BY l_returnflag) s),
        |p AS (
        |  SELECT a.flag AS flag_a, b.flag AS flag_b, a.n AS n_a, b.n AS n_b,
        |    a.vr / a.n + b.vr / b.n AS se2,
        |    a.mean AS mean_a, b.mean AS mean_b, a.vr AS vr_a, b.vr AS vr_b
        |  FROM g a JOIN g b ON a.flag < b.flag)
        |SELECT flag_a, flag_b, n_a, n_b,
        |  CAST(floor((mean_a - mean_b) / sqrt(se2) * 1000000.0) AS BIGINT) AS t_ppm,
        |  CAST(floor(se2 * se2 /
        |    ((vr_a / n_a) * (vr_a / n_a) / (n_a - 1) +
        |     (vr_b / n_b) * (vr_b / n_b) / (n_b - 1))
        |    * 1000000.0) AS BIGINT) AS dof_ppm
        |FROM p ORDER BY flag_a, flag_b""".stripMargin,
    "q7_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year, count(*) AS cnt,
         |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = '$Q7NationA' AND n2.n_name = '$Q7NationB')
         |   OR (n1.n_name = '$Q7NationB' AND n2.n_name = '$Q7NationA')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Numerator and denominator from ONE aggregation; the share is
    // integer-cents division (both engines truncate non-negatives
    // identically).
    "q8_market_share" ->
      s"""WITH j AS (
         |  SELECT year(o_orderdate) AS o_year, l_extendedprice, l_discount,
         |    n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_type = '$Q8Type'
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = '$Q8Region'
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey),
         |a AS (
         |  SELECT CAST(o_year AS BIGINT) AS o_year, count(*) AS cnt,
         |    CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS total_cents,
         |    CAST(floor(CAST(sum(CAST(CASE WHEN supp_nation = '$Q8Nation' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS nation_cents
         |  FROM j GROUP BY 1)
         |SELECT o_year, cnt, total_cents, nation_cents,
         |  (nation_cents * 1000000) // total_cents AS share_ppm
         |FROM a ORDER BY o_year""".stripMargin,
    // Q17 twin: the division-free threshold (5·qty·cnt < sum, all
    // DECIMAL) makes the boundary test exact.
    "q17_small_qty" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS pk,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))) AS qsum,
        |    CAST(count(*) AS BIGINT) AS qcnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS cnt,
        |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN per_part ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 * qcnt < qsum""".stripMargin,
    // Q19 twin: the same OR-of-AND disjunction post-join.
    "q19_disjunct" ->
      s"""SELECT count(*) AS cnt,
         |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = '$Q19BrandA'
         |       AND l_quantity BETWEEN ${Q19QtyA._1} AND ${Q19QtyA._2}
         |       AND p_size BETWEEN 1 AND 20)
         |   OR (p_brand = '$Q19BrandB'
         |       AND l_quantity BETWEEN ${Q19QtyB._1} AND ${Q19QtyB._2}
         |       AND p_size BETWEEN 1 AND 40)""".stripMargin,
    // Q22 twin: division-free half-average compare (acctbal·cnt·2 >
    // sum), anti-join via NOT EXISTS over the date-filtered orders,
    // floor-cents balance total.
    "q22_idle_customers" ->
      s"""WITH avgpos AS (
         |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS bsum,
         |         CAST(count(*) AS BIGINT) AS bcnt
         |  FROM customer WHERE c_acctbal > 0.0)
         |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
         |  CAST(floor(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS totacctbal_cents
         |FROM customer, avgpos
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * bcnt * 2 > bsum
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '$Q22IdleSince')
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // Q13 twin: LEFT join with the exclusion ON the join condition;
    // counts of counts are exact integers.
    "q13_custdist" ->
      s"""WITH per_cust AS (
         |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
         |  FROM customer c LEFT JOIN orders o
         |    ON c.c_custkey = o.o_custkey
         |   AND o.o_orderpriority <> '$Q13Excluded'
         |  GROUP BY c.c_custkey)
         |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         |FROM per_cust GROUP BY c_count
         |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q15 twin: per-supplier floor-cents revenue CTE, max by self-join
    // equality — ties all reported, no tie-break needed.
    "q15_top_supplier" ->
      s"""WITH rev AS MATERIALIZED (
         |  SELECT l_suppkey,
         |    CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '$Q15From'
         |    AND l_shipdate < TIMESTAMP '$Q15To'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, revenue_cents
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    // Q18 twin: the DECIMAL quantity sum and threshold compare are the
    // q1 spelling; top-100 on exact cents, order key tie-break.
    "q18_big_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |    sum(CAST(l_quantity AS DECIMAL(18,4))) AS qdec
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > $Q18MinQty)
         |SELECT c_custkey, c_name, o_orderkey,
         |  CAST(floor(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
         |  CAST(qdec AS DOUBLE) AS total_qty
         |FROM big JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY totalprice_cents DESC, o_orderkey
         |LIMIT 100""".stripMargin,
    // Q14 twin: the identical decimal product tree (CASE-zeroed on the
    // promo side), both sums floored to cents ONCE, ppm from the two
    // exact integers — no double ratio.
    "q14_promo" ->
      s"""SELECT
         |  CAST(floor(CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS promo_cents,
         |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS total_cents,
         |  CAST(CAST(floor(CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) * 1000000
         |    // nullif(CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT), 0) AS BIGINT) AS promo_ppm
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q6_forecast" ->
      s"""SELECT count(*) AS cnt,
         |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount >= $Q6DiscLo AND l_discount <= $Q6DiscHi
         |  AND l_quantity < $Q6MaxQty""".stripMargin,
    "q10_returns" ->
      s"""SELECT c_custkey, c_name,
         |  CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
         |  n_name, count(*) AS cnt,
         |  CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT) AS revenue_cents
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    // Margins from the cells, expected counts as integer-ratio doubles,
    // the total as an ORDER-FREE integer sum of floored terms.
    "agg_chisq" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS flag, l_linestatus AS status,
        |    count(*) AS obs
        |  FROM lineitem GROUP BY flag, status),
        |rt AS (SELECT flag, sum(obs) AS rt FROM cells GROUP BY flag),
        |ct AS (SELECT status, sum(obs) AS ct FROM cells GROUP BY status),
        |tot AS (SELECT sum(obs) AS n, count(DISTINCT flag) AS r,
        |               count(DISTINCT status) AS c FROM cells),
        |t AS (
        |  SELECT cells.flag, cells.status, obs,
        |    CAST(rt.rt * ct.ct AS DOUBLE) / n AS e,
        |    CAST((r - 1) * (c - 1) AS BIGINT) AS dof
        |  FROM cells JOIN rt ON cells.flag = rt.flag
        |    JOIN ct ON cells.status = ct.status, tot),
        |terms AS (
        |  SELECT flag, status, CAST(obs AS BIGINT) AS obs, dof,
        |    CAST(floor(e * 1000.0) AS BIGINT) AS exp_milli,
        |    CAST(floor((obs - e) * (obs - e) / e * 1000000.0) AS BIGINT) AS term_ppm
        |  FROM t)
        |SELECT flag, status, obs, dof, exp_milli, term_ppm,
        |  CAST(sum(term_ppm) OVER () AS BIGINT) AS chi2_ppm
        |FROM terms ORDER BY flag, status""".stripMargin,
    "join_salted" ->
      """SELECT s_nationkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    // The planted-skew CASE shares its constants with the Spark side;
    // the skew SPLIT must not change the exact aggregate.
    "join_skew_aqe" ->
      s"""SELECT s_nationkey,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         |  count(*) AS cnt
         |FROM (SELECT CASE WHEN l_suppkey % $SkewKeyMod = 0
         |             THEN l_suppkey ELSE $SkewHotKey END AS k, l_quantity
         |      FROM lineitem) l
         |JOIN supplier ON l.k = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "join_theta" ->
      """SELECT c_mktsegment, count(*) AS pairs
        |FROM customer JOIN supplier
        |  ON c_acctbal > s_acctbal AND c_nationkey <> s_nationkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "set_union" ->
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION
        |  SELECT s_nationkey AS nk FROM supplier) t
        |ORDER BY nk""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_cnt
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
