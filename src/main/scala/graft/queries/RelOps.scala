package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "grouping_sets" -> (groupingSets _),
    "window_frames" -> (windowFrames _),
    "agg_multidistinct" -> (multiDistinct _),
    "agg_conditional" -> (conditionalAgg _),
    "subquery_mix" -> (subqueries _),
    "agg_stringagg" -> (stringAgg _),
  )

  val oracle: Map[String, String] = Map(
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
  )
}
