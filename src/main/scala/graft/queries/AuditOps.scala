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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audit_quality" -> (qualityChecks _),
    "audit_kanon" -> (kAnonymity _),
    "audit_skew" -> (joinKeySkew _),
  )

  val oracle: Map[String, String] = Map(
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
