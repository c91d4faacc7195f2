package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native upper-bound binary search: the number of elements ≤ `x` in a
  * SORTED `array<double>` — the bin index a row lands in against a
  * broadcast cut-point array (quantile-bin ranking, histogram
  * assignment).
  *
  * Why native: the HOF formulation `size(filter(cuts, c -> c <= x))` is
  * `CodegenFallback` — every row leaves generated code and interprets
  * the lambda once per cut point, O(bins) boxed compares per row per
  * column (measured 11.8s for agg_spearman_approx at sf0.1 vs ~1s with
  * this expression). This is one O(log bins) loop with `doGenCode`,
  * inside whole-stage codegen, and equality with the HOF form on sorted
  * inputs is property-pinned in SortedRankSpec.
  *
  * Contract: either input null → null; empty array → 0. The array MUST
  * be sorted ascending and null-free (binary search examines O(log n)
  * slots, so neither can be validated here — `percentile_approx` cut
  * points satisfy both by construction); unsorted or null-holding
  * arrays give unspecified results.
  */
case class SortedRank(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_rank"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_rank expects (ARRAY<DOUBLE>, DOUBLE), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedRank.rank(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, x) =>
      s"${ev.value} = graft.functions.SortedRank.rank($a, $x);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedRank =
    copy(left = newLeft, right = newRight)
}

object SortedRank {

  /** Shared by the interpreted and generated paths so they cannot
    * drift: classic upper-bound search — first index whose element
    * is > x, which equals the count of elements ≤ x.
    */
  def rank(arr: ArrayData, x: Double): Long = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getDouble(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Column wrapper: count of elements of sorted `cuts` ≤ `x`. */
  def apply(cuts: Column, x: Column): Column =
    GraftBridge.column(SortedRank(GraftBridge.expression(cuts), GraftBridge.expression(x)))
}
