package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running totals — the prefix-sum shape that makes
  * "cumulative X over the WHOLE relation" scale, where the naive
  * spelling (`Window.orderBy(...)` with no partition key) drags every
  * row into ONE task.
  *
  * The classic two-pass construction: range-partition by the global
  * sort key (Spark's own global-sort machinery — each partition holds a
  * contiguous key range), compute the running sum WITHIN each partition
  * (a window keyed by partition id, bounded by the range split sizes),
  * aggregate one total per partition (a relation the size of the
  * partition COUNT), prefix-sum those totals on the tiny relation, and
  * broadcast the offsets back. Every row's global cumulative value is
  * `local running sum + offset of all earlier partitions`.
  *
  * Determinism: the per-row result depends only on the TOTAL order of
  * the sort key (callers must pass a tie-broken key list), not on where
  * the sampled range boundaries land — prefix sums are
  * partition-boundary-invariant — so the output is exactly reproducible
  * even though `repartitionByRange` samples its split points. Use
  * integer/decimal value columns for cross-engine exactness (the usual
  * Parity discipline).
  */
object PrefixSum {

  /** `df` plus a `cum` column: the running sum of `value` over the
    * global `sortCols` order (ascending list as given; pass explicit
    * `desc(...)` columns for descending). `partitions` bounds the
    * per-task window size at roughly rows/partitions.
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column], value: Column,
      partitions: Int): DataFrame = {
    val ranged = df.repartitionByRange(partitions, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
    val local = ranged.withColumn("__local_cum",
      sum(col("__v")).over(Window.partitionBy("__pid").orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // One row per partition; the offset window runs over ≤ `partitions`
    // rows — driver-scale, never data-scale.
    val offsets = ranged.groupBy("__pid").agg(sum(col("__v")).as("__ptot"))
      .withColumn("__offset",
        coalesce(sum(col("__ptot")).over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum", col("__local_cum") + col("__offset"))
      .drop("__pid", "__v", "__local_cum", "__offset")
  }
}
