package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers for DuckDB-oracle parity (SURVEY.md §5.2, §7.4).
  *
  * Floating-point aggregation is order-sensitive, and both Spark and
  * DuckDB aggregate in nondeterministic (partitioned) order. Every summed
  * double in a compared column therefore routes through exact decimal
  * arithmetic and is only converted back to double at the very end —
  * decimal→double conversion is correctly rounded in both engines, so
  * results are bit-identical regardless of execution order. The same
  * pattern appears verbatim in the oracle SQL.
  */
object Parity {

  /** Order-insensitive exact sum of a double column, surfaced as double.
    * Oracle twin: `CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    *
    * Input-domain contract: |x| < 1e14 (prices/quantities/metric values).
    * DECIMAL(18,4) is kept (not widened) so that the dsumProd product stays
    * at DECIMAL(37,8) — within both Spark's and DuckDB's 38-digit cap, which
    * keeps the two engines' decimal arithmetic bit-identical. Out-of-range
    * values would become null and silently drop from the sum; callers on
    * wider domains must pre-scale.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact sum of a product of two doubles (e.g. price * (1-discount)).
    * Oracle twin:
    * `CAST(sum(CAST(a AS DECIMAL(18,4)) * CAST(b AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 4)) * b.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count, in double.
    * Oracle twin: `CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / count(*)`.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact sum surfaced as a floor-scaled BIGINT of hundredths
    * ("cents"): decimal in, integer out, no double anywhere. The double
    * route above is bit-exact only while the sum's scaled value stays
    * within double's 2^53 integer range — beyond it the two engines'
    * decimal→double casts can differ by 1 ulp (DuckDB double-rounds via
    * int128; observed on q1's sf0.1 money sums). Integer surfacing has
    * no such cliff at any corpus size. Oracle twin:
    * `CAST(floor(CAST(sum(CAST(x AS DECIMAL(18,4))) AS DECIMAL(30,4)) * 100) AS BIGINT)`
    * — the (30,s) re-cast keeps the *100 inside both engines' 38-digit
    * decimal cap (DuckDB would otherwise spill the product to DOUBLE,
    * reintroducing the problem).
    */
  def dsumCents(c: Column): Column =
    floor(sum(c.cast(DecimalType(18, 4))).cast(DecimalType(30, 4)) * lit(100))
      .cast(org.apache.spark.sql.types.LongType)

  /** Cents twin of [[dsumProd]] (product sums carry scale 8). Oracle:
    * `CAST(floor(CAST(sum(CAST(a AS DECIMAL(18,4)) * CAST(b AS DECIMAL(18,4))) AS DECIMAL(30,8)) * 100) AS BIGINT)`.
    */
  def dsumProdCents(a: Column, b: Column): Column =
    floor(sum(a.cast(DecimalType(18, 4)) * b.cast(DecimalType(18, 4)))
        .cast(DecimalType(30, 8)) * lit(100))
      .cast(org.apache.spark.sql.types.LongType)
}
