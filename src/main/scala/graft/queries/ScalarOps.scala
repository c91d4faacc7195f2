package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Cube: all four grouping sets over (flag, status). */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Set difference: nations with customers but no suppliers. */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .except(Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  /** HyperLogLog++ approximate distinct — sketch implementations differ
    * between engines, so this takes the rows-only check; the exact twin
    * is `agg_stats.distinct_parts`.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("approx_parts"))
      .orderBy("l_returnflag")

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scalar_funcs" -> (scalarFuncs _),
    "range_join" -> (rangeJoin _),
    "cube_agg" -> (cubeAgg _),
    "set_except" -> (setExcept _),
    "approx_distinct" -> (approxDistinct _),
    "sql_api" -> (sqlApi _),
  )

  val oracle: Map[String, String] = Map(
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
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "sql_api" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
