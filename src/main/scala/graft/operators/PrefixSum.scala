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

  /** Working column names this operator claims for itself (`cum` is the
    * OUTPUT column; the rest are dropped before returning). Guarded by a
    * `require` below: `withColumn` silently REPLACES an existing column,
    * so an input already carrying one of these names would be corrupted
    * without the check.
    */
  private val Reserved =
    Seq("cum", "__pid", "__v", "__local_cum", "__offset", "__opid")

  /** Hard ceiling on the broadcast offsets frame (partitions ×
    * |groups| rows). Far above any legitimate low-cardinality use
    * (32 partitions × 2048 groups) yet small enough that a per-key
    * misuse (millions of groups) fails fast instead of broadcasting.
    */
  val MaxOffsetRows = 65536L

  /** `df` plus a `cum` column: the running sum of `value` over the
    * global `sortCols` order (ascending list as given; pass explicit
    * `desc(...)` columns for descending) — or, with `groupCols`
    * non-empty, the running sum WITHIN each group over that order (the
    * grouped variant StarOps' Spearman rank cumsum rides; no task ever
    * windows a whole group, because the local window is still bounded
    * by one range split). `partitions` bounds the per-task window size
    * at roughly rows/partitions. The input must not already contain a
    * column named `cum` (or any [[Reserved]] working name); the output
    * column is named `cum`. NULL group values form their own group
    * (the offsets re-join is null-safe). `groupCols` must be
    * LOW-CARDINALITY (flags, languages, categories): the offset frame
    * is partitions × |groups| rows and BROADCASTS — for per-key
    * running totals over a high-cardinality key, a plain
    * `Window.partitionBy(key)` is already scale-correct and this
    * operator is the wrong tool.
    *
    * The range-partitioned frame is materialized ONCE
    * (`localCheckpoint`) before either branch derives from it: both the
    * per-partition window and the per-partition totals MUST see the same
    * partitioning, and `repartitionByRange` samples its split points —
    * without the shared materialization, the two branches plan two
    * independent range exchanges and correctness would silently depend
    * on exchange reuse deduplicating them (the same multiply-referenced-
    * frame discipline as GraphOps/BandedPairs). Boundary invariance
    * (prefix sums don't care WHERE the range splits land, only that both
    * passes agree on them) therefore holds by construction here.
    */
  def withRunningTotal(df: DataFrame, sortCols: Seq[Column], value: Column,
      partitions: Int, groupCols: Seq[String] = Nil): DataFrame = {
    val reserved = Reserved ++ groupCols.map("__og_" + _)
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"PrefixSum reserves column names ${reserved.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")}")
    // Grouped runs range-partition by (group, sort): each partition
    // holds contiguous runs of whole-or-partial groups, so the offset
    // frame below stays ≤ partitions × groups-per-partition rows.
    val rangeCols = groupCols.map(col) ++ sortCols
    val ranged = df.repartitionByRange(partitions, rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint()
    val partKeys = col("__pid") +: groupCols.map(col)
    val local = ranged.withColumn("__local_cum",
      sum(col("__v")).over(Window.partitionBy(partKeys: _*).orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // One row per (partition, group); the offset window runs over ≤
    // `partitions` rows per group. The frame as a whole is
    // partitions × |groups| rows — broadcastable under the documented
    // low-cardinality contract above.
    val offsetWindow =
      (if (groupCols.isEmpty) Window.orderBy("__pid")
       else Window.partitionBy(groupCols.map(col): _*).orderBy("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    val offsetsBase = ranged.groupBy(partKeys: _*).agg(sum(col("__v")).as("__ptot"))
    // Enforce the low-cardinality contract at runtime, not just in the
    // scaladoc: a high-cardinality group column would silently build
    // and broadcast a partitions × |groups| frame and run an unbounded
    // per-group offset window. Fail loudly instead. The count rides the
    // materialized frame (≤ one row per (partition, group)), so the
    // guard itself is a tiny job over the checkpointed input.
    val offsetsSized =
      if (groupCols.isEmpty) offsetsBase
      else {
        val sized = offsetsBase.localCheckpoint()
        val n = sized.count()
        require(n <= MaxOffsetRows,
          s"PrefixSum.withRunningTotal: offsets frame has $n rows " +
            s"(> $MaxOffsetRows) — groupCols ${groupCols.mkString(", ")} " +
            "are not low-cardinality; use Window.partitionBy(key) for " +
            "per-key running totals instead")
        sized
      }
    val offsets = offsetsSized
      .withColumn("__offset",
        coalesce(sum(col("__ptot")).over(offsetWindow), lit(0L)))
      .select(partKeys :+ col("__offset"): _*)
      // Rename the join keys: the null-SAFE condition below needs
      // unambiguous sides (a using-columns join is null-unsafe and
      // would silently DROP every null-group row).
      .toDF(("__opid" +: groupCols.map("__og_" + _)) :+ "__offset": _*)
    val joinCond = groupCols.foldLeft(col("__pid") === col("__opid")) {
      (acc, g) => acc && (col(g) <=> col("__og_" + g))
    }
    local.join(broadcast(offsets), joinCond)
      .withColumn("cum", col("__local_cum") + col("__offset"))
      .drop(("__pid" +: "__v" +: "__local_cum" +: "__offset" +: "__opid" +:
        groupCols.map("__og_" + _)): _*)
  }
}
