package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Parity

/** Relational-surface depth beyond the §2.3 basics: explicit grouping
  * sets, window frames (lag/lead + sliding frames), multi-distinct
  * aggregation, filtered/conditional aggregates, correlated subqueries
  * through the SQL front end, and deterministic string aggregation.
  *
  * Scale posture: every query here is scan → (window or partial-agg) →
  * one shuffle → final agg/sort. Grouping sets expand rows AFTER the
  * partial aggregate (Spark's Expand sits below the exchange, so the
  * shuffle carries group rows, not input rows); multi-distinct plans as
  * Expand + two-level aggregate — both shapes survive 100× data growth
  * because their shuffle volume is bounded by distinct group/key counts,
  * not input rows. The subqueries decorrelate to joins (no per-row
  * re-execution; asserted in RelOpsSpec).
  */
object RelOps {

  /** Explicit GROUPING SETS through the Dataset API (finer than rollup/
    * cube: exactly the requested sets) — per-(flag,status) detail plus
    * per-flag subtotals plus a grand total. NULL group markers are
    * unambiguous because the fixture columns are non-null.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), Parity.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** Window frames: previous/next order price (lag/lead) and a 3-row
    * sliding sum per customer. The frame sum routes through exact
    * decimal ([[Parity]]) so partition order can't perturb the double.
    * One shuffle on the partition key; the frame is bounded (3 rows) so
    * state per key is O(1) at any scale.
    */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 100 === 0)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(frame)
          .cast("double").as("mov_sum3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Several COUNT(DISTINCT …) in one aggregate: Spark plans Expand +
    * two-phase aggregation — each distinct column shuffles once on
    * (group, value), never collecting value sets to one place.
    */
  def multiDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  /** Conditional/filtered aggregates: predicates inside one aggregation
    * pass (count_if, filtered decimal sum, bool_or/bool_and) — one scan,
    * one shuffle, map-side combinable.
    */
  def conditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        count_if(col("o_totalprice") > 150000).as("n_big"),
        sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .cast(DecimalType(18, 4))).cast("double").as("sum_f_price"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        bool_and(col("o_totalprice") > 0).as("all_positive"))
      .orderBy("o_orderpriority")

  /** Correlated EXISTS + IN + scalar subquery through the SQL front end.
    * Catalyst decorrelates all three to joins (semi joins + a broadcast
    * scalar) — no per-outer-row re-execution; the spec asserts the plan.
    * The scalar threshold uses max() (order-insensitive), not a float
    * mean, so the oracle compare stays exact.
    */
  def subqueries(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_sq")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_sq")
    Tables.nation(spark, dir).createOrReplaceTempView("nation_sq")
    spark.sql(
      """SELECT c_custkey, c_name
        |FROM customer_sq c
        |WHERE EXISTS (SELECT 1 FROM orders_sq o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 250000)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation_sq
        |                      WHERE n_regionkey <= 1)
        |  AND c_acctbal * 2 > (SELECT max(c_acctbal) FROM customer_sq)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Deterministic distributed string aggregation: per-language sorted
    * distinct sources joined into one value. collect_set's arrival order
    * is nondeterministic; array_sort makes the result a pure function of
    * the set. Group cardinality (distinct sources) bounds state, not
    * corpus size.
    */
  def stringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** Days covered by the [[windowRange]] trailing frame. */
  private val RangeFrameDays = 30

  /** RANGE window frame (value-based, vs [[windowFrames]]' row-based):
    * each order's trailing-30-day spend for its customer. The order-by
    * key is an integer day number — Spark range frames need a numeric
    * sort key, and integer day arithmetic is engine-exact where interval
    * frames over raw dates invite boundary drift. Frame width is bounded
    * by data density per 30 days, not corpus size.
    */
  def windowRange(spark: SparkSession, dir: String): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-RangeFrameDays, Window.currentRow)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 100 === 0)
      .withColumn("day", datediff(to_date(col("o_orderdate")), epoch).cast("long"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("day"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
          .cast("double").as("trailing_spend"),
        count(lit(1)).over(w).as("trailing_orders"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** Typed COGROUP — the two-sided generalization of the reference's
    * per-group reduce (/root/reference/MapReduceFramework.cpp:358): both
    * inputs shuffle once on the key and a user function sees the two
    * iterators together, without materializing either side as an array.
    * Here: per-order lineitem count and quantity sum folded streamingly
    * next to the order's price — the relational twin is a join+group-by,
    * which is exactly what the oracle runs.
    */
  def cogroupOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    val items = Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_quantity"))
      .as[(Long, Double)]
      .groupByKey(_._1)
    orders.cogroup(items) { (key, os, ls) =>
      // Iterator fold, never a materialized Seq: per-key state is three
      // scalars no matter how many lineitems an order has.
      var price = Option.empty[Double]
      os.foreach(o => price = Some(o._2))
      var cnt = 0L
      var qty = 0L
      ls.foreach { l => cnt += 1; qty += l._2.toLong }
      price.iterator.map(p => (key, p, cnt, qty))
    }.toDF("o_orderkey", "o_totalprice", "item_cnt", "qty_sum")
      .orderBy("o_orderkey")
  }

  /** Bloom-pruned join — the runtime-filter pattern for joins whose
    * probe side dwarfs the build side: sketch the (filtered, small)
    * build keys into a constant-size bloom filter, drop probe rows that
    * cannot match BEFORE the shuffle, then run the exact join. False
    * positives only let a few extra rows into the exact join, so the
    * result is identical to the plain join — which is what the oracle
    * executes. At 100 TB the bloom (1.2M bits here) replaces shuffling
    * the ~97% of lineitem that can never match; Spark's own
    * InjectRuntimeFilter does the same rewrite when statistics let it
    * (RelOpsSpec pins that path too).
    */
  def bloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val bloom = urgent.stat.bloomFilter(col("o_orderkey"), 200000L, 0.03)
    val mightMatch = udf((k: Long) => bloom.mightContainLong(k))
    Tables.lineitem(spark, dir)
      .filter(mightMatch(col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("cnt"), Parity.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_year")
  }

  /** Quantile bucketing via ntile: per-priority spend deciles with each
    * decile's count and exact-cents spend — the balance audit behind
    * equal-frequency binning. The tie-break (price desc, orderkey asc)
    * totally orders every partition, so decile membership is
    * deterministic and both engines' identical ntile definitions agree
    * exactly. Scale note: a window partition sorts on one task, so this
    * shape holds while a single priority's orders fit an executor
    * (~millions of rows); past that, production swaps ntile for
    * range-assignment against sampled decile boundaries — the same
    * sample-then-assign move Spark's own RangePartitioner makes for
    * global sorts — and `agg_percentile` already computes such exact
    * boundaries.
    */
  def ntileDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("o_orderpriority", "decile")
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Parity.dsumCents(col("o_totalprice")).as("spend_cents"))
      .orderBy("o_orderpriority", "decile")
  }

  /** Exact ntile(10) by range assignment — the scale path for
    * [[ntileDeciles]], whose window sorts a whole priority's ROWS on one
    * task. Here nothing corpus-sized is ever sorted on one task:
    *
    *   1. counts per DISTINCT (priority, price) level cumulate in a
    *      window over price levels — partition size is the price DOMAIN
    *      (≤ ~6e7 cent values), not the row count (the same
    *      distinct-value-frame move `agg_spearman` makes);
    *   2. ntile's nine cut ranks R_b = b·⌊n/10⌋ + min(b, n mod 10) are
    *      located in that cumulative profile IN THE SAME PASS (the group
    *      total rides a second window on the same partitioning, so the
    *      exchange is shared); a cut falling INSIDE a tie run is
    *      resolved by one sorted-collect of the ntile tie-break key
    *      (orderkey) over that price point's rows — ≤ 9 price points
    *      per group, so the collect touches only boundary-value rows;
    *   3. each row's decile is 1 + the number of cut keys it follows in
    *      (price DESC, orderkey ASC) order — a broadcast of ≤ 9 cut keys
    *      per group and one scan-local array `filter`, no second shuffle
    *      of the facts.
    *
    * Row at rank k follows cut b iff k > R_b, so the assignment equals
    * `ntile(10)` bit-for-bit — including under heavy ties and n < 10
    * (both spec-pinned) — which is why it shares agg_ntile's oracle.
    * Prices map to exact cents through the same DECIMAL route as
    * [[graft.operators.Parity.dsumCents]], so level grouping never
    * touches double identity.
    */
  private[queries] def rangeDecile(base: DataFrame): DataFrame = {
    // Every derived relation re-derives from `base`, so all intermediate
    // column names are kept globally unique — Spark's ambiguous-self-join
    // detection rejects dataset-qualified refs across shared lineage.
    val keys = base.select("prio", "cents", "okey")
    // DOMAIN-bounded (≤ distinct prices per priority) and consumed by
    // exactly one derivation below (the fused cut locator), so no
    // materialization — the r12 tower (four fact scans from three
    // consumers replanning this subtree) is gone by fusion, not by
    // checkpointing.
    val levels = keys.groupBy("prio", "cents").agg(count(lit(1)).as("lcnt"))

    // Cut location in ONE pass over the level profile: the cumulative
    // count and the group total ride two windows on the SAME prio
    // partitioning (one exchange), so the nine cut ranks R_b =
    // b·⌊n/10⌋ + min(b, n mod 10) locate directly on each level row —
    // no separate per-group aggregate, no rank join. tie_rank is the
    // cut's position inside its level's (orderkey-ordered) tie run.
    val wl = Window.partitionBy("prio").orderBy(desc("cents"))
    val lvlCut = levels
      .withColumn("cum", sum("lcnt").over(wl))
      .withColumn("n", sum("lcnt").over(Window.partitionBy("prio")))
      .withColumn("cum_before", col("cum") - col("lcnt"))
      .withColumn("b", explode(sequence(lit(1L), lit(9L))))
      .withColumn("rank_b",
        col("b") * floor(col("n") / 10) + least(col("b"), col("n") % 10))
      .filter(col("cum_before") < col("rank_b") && col("rank_b") <= col("cum"))
      .select(col("prio").as("lprio"), col("cents").as("cut_cents"),
        (col("rank_b") - col("cum_before")).as("tie_rank"))
      // n < 10 saturates the cut ranks (R_b = n for every b ≥ n), so
      // several buckets cut at the SAME (level, tie_rank) — collapse
      // them, or the duplicates multiply into the sorted-collect below
      // and shift element_at's pick. Dropping duplicates is exact: a
      // row "follows" the saturated rank-n cut only at rank > n, and
      // no such row exists.
      .distinct()

    // Resolve intra-tie cuts by orderkey rank — only rows AT a cut
    // price survive the broadcast join (≤ 9 levels per priority), and
    // the rank probe is one sorted-collect per cut: the group carries
    // that level's tie run (duplicated per cut falling inside it, so
    // tie_rank is group-constant), and element_at picks the cut key.
    val boundaries = keys
      .join(broadcast(lvlCut),
        col("prio") === col("lprio") && col("cents") === col("cut_cents"))
      .groupBy(col("prio").as("pprio"), col("cut_cents"), col("tie_rank"))
      .agg(element_at(sort_array(collect_list(col("okey"))),
        col("tie_rank").cast("int")).as("cut_okey"))

    val packed = boundaries.groupBy("pprio")
      .agg(collect_list(struct(col("cut_cents").as("c"), col("cut_okey").as("k")))
        .as("cuts"))

    // decile = 1 + |{cuts the row follows in (price DESC, okey ASC) order}|
    base.join(broadcast(packed), col("prio") === col("pprio"))
      .drop("pprio")
      .withColumn("decile",
        (size(filter(col("cuts"), x =>
          col("cents") < x.getField("c") ||
            (col("cents") === x.getField("c") && col("okey") > x.getField("k")))) + 1)
          .cast("long"))
      .drop("cuts")
  }

  /** [[ntileDeciles]] recomputed through [[rangeDecile]] — identical
    * output (same oracle SQL), but the plan survives a priority whose
    * orders no longer fit one task.
    */
  def ntileDecilesRange(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("prio"),
      col("o_totalprice"),
      (col("o_totalprice").cast(DecimalType(18, 4)) * 100).cast("long").as("cents"),
      col("o_orderkey").as("okey"))
    rangeDecile(base)
      .groupBy(col("prio").as("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Parity.dsumCents(col("o_totalprice")).as("spend_cents"))
      .orderBy("o_orderpriority", "decile")
  }

  /** Distribution window functions: percent_rank, cume_dist, and the
    * running leader (first_value) per priority, on a customer-sampled
    * slice. Both ratios are a single integer division in both engines
    * (same IEEE op), surfaced as floored ppm like every ratio column.
    */
  def windowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 100 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("pr_ppm", floor(percent_rank().over(w) * 1000000.0).cast("long"))
      .withColumn("cd_ppm", floor(cume_dist().over(w) * 1000000.0).cast("long"))
      .withColumn("top_price", first("o_totalprice").over(w))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /** Equal-WIDTH histogram (the fixed-bucket complement of
    * [[ntileDeciles]]' equal-frequency bins): spend bucketed by a
    * constant width — a scan-local floor division, map-side combinable,
    * the cheapest possible distribution profile at any scale.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy((floor(col("o_totalprice") / 25000.0) * 25000).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("cnt"),
        graft.operators.Parity.dsumCents(col("o_totalprice")).as("spend_cents"))
      .orderBy("bucket_lo")

  /** Bits per dimension of the [[zorderLayout]] interleave. */
  private val ZBits = 8

  /** Morton/Z-order interleave of two [[ZBits]]-bit non-negative keys:
    * bit i of x lands at position 2i, bit i of y at 2i+1 — pure shift/
    * mask arithmetic, identical in both engines on non-negatives.
    */
  private def zorder(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** The DuckDB twin of [[zorder]], generated from the same constants. */
  private def duckZorder(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}) + ((($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Z-order (Morton) data-layout clustering profile: interleave the
    * low [[ZBits]] bits of two scan dimensions and bucket by the
    * curve's high bits. Each bucket is a tight axis-aligned rectangle
    * (32×32 here — the spec asserts the bound), which is exactly why a
    * Z-ORDER BY table layout prunes multi-dimension range scans: sorting
    * the 100 TB fact table by `z` before writing gives every parquet
    * file min/max bounds on BOTH dimensions at once, so either
    * predicate skips files. The interleave is scan-local expression
    * arithmetic (codegen'd, no shuffle); the profile aggregate is one
    * map-side-combinable group-by on 64 buckets.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val z = zorder(col("x"), col("y"))
    Tables.lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(256L)).as("x"),
        pmod(col("l_suppkey"), lit(256L)).as("y"))
      .groupBy(shiftright(z, 10).cast("long").as("zbucket"))
      .agg(count(lit(1)).as("cnt"),
        min("x").as("x_lo"), max("x").as("x_hi"),
        min("y").as("y_lo"), max("y").as("y_hi"))
      .orderBy("zbucket")
  }

  /** Rollup with explicit grouping markers: `grouping_id()` and
    * per-column `grouping()` distinguish "NULL because subtotal row"
    * from "NULL in the data" — the contract every consumer of rollup
    * output keys on. Both engines put the first rollup column in the
    * marker's most significant bit (checked against DuckDB's GROUPING).
    * Same one-exchange plan as any rollup: Expand sits below the
    * exchange, so the shuffle carries group rows.
    */
  def groupingMarkers(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        grouping_id().cast("long").as("gid"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Shared by agg_ntile and agg_ntile_range — both must equal ntile. */
  private val NtileOracleSql =
    """SELECT o_orderpriority, CAST(decile AS BIGINT) AS decile,
      |  count(*) AS cnt,
      |  CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(30,4)) * 100) AS BIGINT) AS spend_cents
      |FROM (
      |  SELECT o_orderpriority, o_totalprice,
      |    ntile(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY o_totalprice DESC, o_orderkey) AS decile
      |  FROM orders) t
      |GROUP BY o_orderpriority, decile
      |ORDER BY o_orderpriority, decile""".stripMargin

  /** ANALYZE-style column statistics: per column non-null count, null
    * count, exact NDV, and min/max rendered to a uniform string — the
    * stats a cost-based optimizer (or a pipeline owner sizing a
    * shuffle) collects before planning. Two passes, both hash-
    * aggregated and map-side combinable: (1) counts and typed min/max
    * for ALL columns in one no-distinct aggregate (a single row); (2)
    * NDVs via a `stack`-melt to narrow (column, value) rows and ONE
    * two-level distinct — grouping (col, val) first means partial
    * aggregation dedups within each partition before the exchange.
    * This deliberately avoids a single multi-column `count_distinct`
    * aggregate: Catalyst plans that as a 6-way Expand into 6-key
    * SortAggregates (measured 7s vs 1s at sf0.1). The melt renders
    * values injectively (casts, never lossy formats), so per-column
    * distinct counts are exact. At 100 TB the exact NDVs swap for
    * `approx_count_distinct` — the sketch twin the registry already
    * carries as `approx_distinct`. Min/max strings avoid float
    * rendering: quantities cast to BIGINT (integral by construction),
    * dates format as yyyy-MM-dd.
    */
  /** Residue ring for [[tableChecksums]]: per-row hash residues mod
    * 2³¹ sum exactly in DECIMAL(38) at any row count (10²⁹ rows before
    * the sum could overflow 38 digits), then reduce mod again.
    */
  val ChecksumMod = 1L << 31

  /** Order-insensitive table content checksums — the cheap
    * did-the-copy-preserve-the-table equality check for datasets too
    * large to diff: each row canonicalizes to one portable64 hash
    * (integers/strings verbatim, doubles as floor-micros, timestamps
    * as epoch-µs — the repo's standard engine-exact canonical forms,
    * nulls as an explicit sentinel so NULL ≠ ''), and the table reduces
    * to (row count, Σ row-hash residues mod [[ChecksumMod]]). Integer
    * addition commutes, so the checksum is independent of partitioning,
    * row order, and merge order — two tables agree iff counts and
    * checksums agree (up to hash collisions, as with any checksum).
    * One scan per table, constant output; the three covered tables
    * exercise every canonicalization rule.
    */
  private def checksumCanon(c: Column): Column =
    coalesce(c.cast("string"), lit("\\N"))
  private def checksumMicro(c: Column): Column =
    checksumCanon(floor(c * lit(1000000.0)).cast("long"))

  /** The documents table's canonical row-hash residue — ONE expression
    * shared by the full and incremental twins (the Duck side shares
    * `duckDocsChecksum` the same way), so an edit to the canonical form
    * cannot break the incr-vs-direct equivalence gate silently.
    */
  private def documentsResidue: Column =
    checksumResidue(Seq(checksumCanon(col("doc_id")), checksumCanon(col("text")),
      checksumCanon(col("lang")), checksumCanon(col("source")),
      checksumCanon(col("n_chars"))))

  private def checksumResidue(cols: Seq[Column]): Column =
    pmod(graft.queries.DedupOps.portable64(concat_ws("\u0001", cols: _*)),
      lit(ChecksumMod))

  private def checksumRow(df: DataFrame, name: String, residue: Column): DataFrame =
    df.select(residue.as("hm"))
      .agg(count(lit(1)).as("n_rows"),
        expr(s"CAST(sum(CAST(hm AS DECIMAL(38,0))) % $ChecksumMod AS BIGINT)")
          .as("checksum"))
      .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))

  def tableChecksums(spark: SparkSession, dir: String): DataFrame = {
    val docs = checksumRow(Tables.documents(spark, dir), "documents", documentsResidue)
    val cust = checksumRow(Tables.customer(spark, dir), "customer",
      checksumResidue(Seq(checksumCanon(col("c_custkey")), checksumCanon(col("c_name")),
        checksumCanon(col("c_nationkey")), checksumMicro(col("c_acctbal")),
        checksumCanon(col("c_mktsegment")))))
    val ords = checksumRow(Tables.orders(spark, dir), "orders",
      checksumResidue(Seq(checksumCanon(col("o_orderkey")), checksumCanon(col("o_custkey")),
        checksumCanon(col("o_orderstatus")), checksumMicro(col("o_totalprice")),
        checksumCanon(unix_micros(col("o_orderdate").cast("timestamp"))),
        checksumCanon(col("o_orderpriority")))))
    docs.unionByName(cust).unionByName(ords).orderBy("table_name")
  }

  /** Incremental checksum maintenance — the [[tableChecksums]] residue
    * sum is associative, so the persisted HISTORY fingerprint (count +
    * residue sum of the train split, stored once) merges with the
    * incoming batch's fingerprint by integer addition — no history
    * re-scan, and the merged value must equal the full-table
    * fingerprint EXACTLY (same residue ring). This registers the
    * documents-table equivalence as its own gated row: persisted
    * history + batch ≡ direct, the `embed_centroids_incr` contract
    * applied to the integrity artifact.
    */
  def tableChecksumsIncremental(spark: SparkSession, dir: String): DataFrame = {
    def fp(df: DataFrame): DataFrame =
      df.select(documentsResidue.as("hm"))
        .agg(count(lit(1)).as("n_rows"),
          expr("sum(CAST(hm AS DECIMAL(38,0)))").as("s"))
    val d = SampleOps.withSplit(Tables.documents(spark, dir))
    val out = graft.Scratch.dir("cksumindex")
    fp(d.filter(col("split") === "train")).write.mode("overwrite").parquet(out)
    fp(d.filter(col("split") =!= "train"))
      .unionByName(spark.read.parquet(out))
      .agg(sum(col("n_rows")).as("n_rows"),
        expr(s"CAST(sum(s) % $ChecksumMod AS BIGINT)").as("checksum"))
      .select(lit("documents").as("table_name"), col("n_rows"), col("checksum"))
  }

  def metaStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def stats(c: String, minS: Column, maxS: Column): Seq[Column] = Seq(
      count(col(c)).as(s"nn_$c"), minS.as(s"min_$c"), maxS.as(s"max_$c"))
    val tall = li.agg(
        count(lit(1)).as("n_rows"),
        stats("l_returnflag", min(col("l_returnflag")), max(col("l_returnflag"))) ++
        stats("l_linestatus", min(col("l_linestatus")), max(col("l_linestatus"))) ++
        stats("l_quantity",
          min(col("l_quantity")).cast("long").cast("string"),
          max(col("l_quantity")).cast("long").cast("string")) ++
        stats("l_orderkey",
          min(col("l_orderkey")).cast("string"),
          max(col("l_orderkey")).cast("string")) ++
        stats("l_shipdate",
          date_format(min(col("l_shipdate")), "yyyy-MM-dd"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd")): _*)
      .selectExpr(
        "n_rows",
        """stack(5,
          |  'l_linestatus', nn_l_linestatus, min_l_linestatus, max_l_linestatus,
          |  'l_orderkey', nn_l_orderkey, min_l_orderkey, max_l_orderkey,
          |  'l_quantity', nn_l_quantity, min_l_quantity, max_l_quantity,
          |  'l_returnflag', nn_l_returnflag, min_l_returnflag, max_l_returnflag,
          |  'l_shipdate', nn_l_shipdate, min_l_shipdate, max_l_shipdate
          |) AS (col, non_null, min_s, max_s)""".stripMargin)
    val ndv = li.selectExpr(
        """stack(5,
          |  'l_linestatus', l_linestatus,
          |  'l_orderkey', cast(l_orderkey AS string),
          |  'l_quantity', cast(l_quantity AS string),
          |  'l_returnflag', l_returnflag,
          |  'l_shipdate', cast(l_shipdate AS string)
          |) AS (col, val)""".stripMargin)
      .filter(col("val").isNotNull)
      .distinct()
      .groupBy("col").agg(count(lit(1)).as("ndv"))
    tall.join(broadcast(ndv), Seq("col"), "left")
      .select(col("col"), col("non_null"),
        (col("n_rows") - col("non_null")).as("nulls"),
        coalesce(col("ndv"), lit(0L)).as("ndv"),
        col("min_s"), col("max_s"))
      .orderBy("col")
  }

  /** The `Dataset.observe` / CollectMetrics surface under the value
    * gate — production pipelines hang data-quality counters on
    * `observe` because the metrics ride the MAIN pass (one scan, no
    * second monitoring job — the only monitoring shape that survives
    * 100 TB). The query runs a full pass through a row-preserving noop
    * sink with three observed aggregates and emits what the
    * Observation listener delivered; the oracle recomputes the same
    * aggregates directly, so a CollectMetrics node that dropped rows,
    * double-counted a retried partition, or detached from the plan
    * breaks the hash. All-integer metrics (floor-cents for the double)
    * keep the comparison exact.
    */
  def observedStats(spark: SparkSession, dir: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    Tables.orders(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("key_sum"),
        sum(floor(col("o_totalprice") * 100).cast("long")).as("price_cents"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
      m("key_sum").asInstanceOf[Long],
      m("price_cents").asInstanceOf[Long]))
      .toDF("n_rows", "key_sum", "price_cents")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_grouping_id" -> (groupingMarkers _),
    "meta_observe" -> (observedStats _),
    "meta_stats" -> (metaStats _),
    "meta_checksum" -> (tableChecksums _),
    "meta_checksum_incr" -> (tableChecksumsIncremental _),
    "agg_ntile" -> (ntileDeciles _),
    "agg_ntile_range" -> (ntileDecilesRange _),
    "window_dist" -> (windowDist _),
    "agg_histogram" -> (histogram _),
    "grouping_sets" -> (groupingSets _),
    "window_frames" -> (windowFrames _),
    "agg_multidistinct" -> (multiDistinct _),
    "agg_conditional" -> (conditionalAgg _),
    "subquery_mix" -> (subqueries _),
    "agg_stringagg" -> (stringAgg _),
    "window_range" -> (windowRange _),
    "cogroup_orders" -> (cogroupOrders _),
    "join_bloom" -> (bloomJoin _),
    "layout_zorder" -> (zorderLayout _),
  )

  // Checksum canonical forms rendered once and shared by the full and
  // incremental twins (see the map entries).
  private def duckChecksumOne(table: String, canonical: String): String =
    s"""SELECT '$table' AS table_name, count(*) AS n_rows,
       |  CAST(sum(hm) % $ChecksumMod AS BIGINT) AS checksum
       |FROM (SELECT ${DedupOps.duckPortable64(canonical)} % $ChecksumMod AS hm
       |      FROM $table) t""".stripMargin
  private def duckCanon(x: String) = s"coalesce(CAST($x AS VARCHAR), '\\N')"
  private def duckCanonMicro(x: String) =
    duckCanon(s"CAST(floor($x * 1000000.0) AS BIGINT)")
  private val duckDocsChecksum: String = duckChecksumOne("documents",
    s"concat_ws(chr(1), ${duckCanon("doc_id")}, ${duckCanon("text")}, " +
      s"${duckCanon("lang")}, ${duckCanon("source")}, ${duckCanon("n_chars")})")
  private val duckCustChecksum: String = duckChecksumOne("customer",
    s"concat_ws(chr(1), ${duckCanon("c_custkey")}, ${duckCanon("c_name")}, " +
      s"${duckCanon("c_nationkey")}, ${duckCanonMicro("c_acctbal")}, " +
      s"${duckCanon("c_mktsegment")})")
  private val duckOrdsChecksum: String = duckChecksumOne("orders",
    s"concat_ws(chr(1), ${duckCanon("o_orderkey")}, ${duckCanon("o_custkey")}, " +
      s"${duckCanon("o_orderstatus")}, ${duckCanonMicro("o_totalprice")}, " +
      s"${duckCanon("epoch_us(CAST(o_orderdate AS TIMESTAMP))")}, " +
      s"${duckCanon("o_orderpriority")})")

  val oracle: Map[String, String] = Map(
    // The observed metrics recomputed directly: integer count/sum and
    // the per-row floor-cents fold (deterministic on both engines).
    "meta_observe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders""".stripMargin,
    // Same canonical forms (chr(1) separators, '\N' null sentinel,
    // floor-micro doubles, epoch-µs timestamps) and the same residue
    // ring; integer addition commutes, so row order cannot matter.
    "meta_checksum" ->
      s"""$duckDocsChecksum
         |UNION ALL
         |$duckCustChecksum
         |UNION ALL
         |$duckOrdsChecksum
         |ORDER BY table_name""".stripMargin,
    // SAME documents-row SQL as meta_checksum's first branch: the
    // residue sum is associative, so persisted history + batch merge
    // must reproduce the direct fingerprint exactly — the equivalence
    // IS the gate.
    "meta_checksum_incr" -> duckDocsChecksum,
    "meta_stats" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    count(l_returnflag) AS nn_rf, count(DISTINCT l_returnflag) AS ndv_rf,
        |    min(l_returnflag) AS min_rf, max(l_returnflag) AS max_rf,
        |    count(l_linestatus) AS nn_ls, count(DISTINCT l_linestatus) AS ndv_ls,
        |    min(l_linestatus) AS min_ls, max(l_linestatus) AS max_ls,
        |    count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS ndv_q,
        |    CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR) AS min_q,
        |    CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR) AS max_q,
        |    count(l_orderkey) AS nn_ok, count(DISTINCT l_orderkey) AS ndv_ok,
        |    CAST(min(l_orderkey) AS VARCHAR) AS min_ok,
        |    CAST(max(l_orderkey) AS VARCHAR) AS max_ok,
        |    count(l_shipdate) AS nn_sd, count(DISTINCT l_shipdate) AS ndv_sd,
        |    strftime(min(l_shipdate), '%Y-%m-%d') AS min_sd,
        |    strftime(max(l_shipdate), '%Y-%m-%d') AS max_sd
        |  FROM lineitem)
        |SELECT col, non_null, n_rows - non_null AS nulls, ndv, min_s, max_s
        |FROM (
        |  SELECT n_rows, 'l_linestatus' AS col, nn_ls AS non_null, ndv_ls AS ndv, min_ls AS min_s, max_ls AS max_s FROM a
        |  UNION ALL
        |  SELECT n_rows, 'l_orderkey', nn_ok, ndv_ok, min_ok, max_ok FROM a
        |  UNION ALL
        |  SELECT n_rows, 'l_quantity', nn_q, ndv_q, min_q, max_q FROM a
        |  UNION ALL
        |  SELECT n_rows, 'l_returnflag', nn_rf, ndv_rf, min_rf, max_rf FROM a
        |  UNION ALL
        |  SELECT n_rows, 'l_shipdate', nn_sd, ndv_sd, min_sd, max_sd FROM a)
        |ORDER BY col""".stripMargin,
    // The interleave SQL is generated from the same ZBits constants the
    // Spark expression uses, so the two sides cannot drift.
    "layout_zorder" ->
      s"""WITH b AS (
        |  SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
        |z AS (SELECT x, y, ${duckZorder("x", "y")} AS z FROM b)
        |SELECT CAST(z >> 10 AS BIGINT) AS zbucket, count(*) AS cnt,
        |  CAST(min(x) AS BIGINT) AS x_lo, CAST(max(x) AS BIGINT) AS x_hi,
        |  CAST(min(y) AS BIGINT) AS y_lo, CAST(max(y) AS BIGINT) AS y_hi
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    "window_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(floor(percent_rank() OVER w * 1000000.0) AS BIGINT) AS pr_ppm,
        |  CAST(floor(cume_dist() OVER w * 1000000.0) AS BIGINT) AS cd_ppm,
        |  first_value(o_totalprice) OVER (
        |    PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS top_price
        |FROM orders WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) * 25000 AS BIGINT) AS bucket_lo,
        |  count(*) AS cnt,
        |  CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(30,4)) * 100) AS BIGINT) AS spend_cents
        |FROM orders GROUP BY bucket_lo ORDER BY bucket_lo""".stripMargin,
    "agg_ntile" -> NtileOracleSql,
    // Same oracle on purpose: the range-assignment path must reproduce
    // ntile(10) bit-for-bit, not merely approximate it.
    "agg_ntile_range" -> NtileOracleSql,
    "agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "window_frames" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3
        |FROM orders
        |WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "agg_multidistinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_conditional" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f_price,
        |  bool_or(o_orderstatus = 'F') AS any_f,
        |  bool_and(o_totalprice > 0) AS all_positive
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "subquery_mix" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 250000)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey <= 1)
        |  AND c_acctbal * 2 > (SELECT max(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "agg_stringagg" ->
      """SELECT lang,
        |  string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // RANGE frames include all peer rows of the current day value, so
    // the result is deterministic even where intra-day order is not.
    "window_range" ->
      """SELECT o_custkey, o_orderkey, day,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_spend,
        |  count(*) OVER w AS trailing_orders
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        |  FROM orders WHERE o_custkey % 100 = 0)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    // The cogroup fold is relationally a left join + group-by; quantities
    // are integral doubles, so the per-item BIGINT cast is exact.
    "cogroup_orders" ->
      """SELECT o.o_orderkey, o.o_totalprice,
        |  count(l.l_orderkey) AS item_cnt,
        |  coalesce(CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT), 0) AS qty_sum
        |FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey % 50 = 0
        |GROUP BY o.o_orderkey, o.o_totalprice
        |ORDER BY o.o_orderkey""".stripMargin,
    // The bloom prefilter is result-transparent (false positives are
    // removed by the exact join), so the twin is the plain join.
    "join_bloom" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
  )
}
