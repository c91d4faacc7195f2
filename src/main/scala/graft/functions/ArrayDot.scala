package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns: Σ a(i)*b(i) as a
  * LEFT FOLD in element-index order — the exact accumulation sequence of
  * the higher-order-function formulation
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`, and of the DuckDB twin
  * in [[VectorOps.dotSql]], so every cosine oracle keeps its exact-value
  * check (bit-equality is pinned by a scalacheck property in
  * ArrayDotSpec).
  *
  * Why native: Spark's array HOFs (`ZipWith`, `ArrayAggregate`) are
  * `CodegenFallback` — each row leaves generated code, allocates the
  * zipped intermediate array, and interprets the lambda twice per
  * element. On the similarity-search hot path that is three such HOF
  * stacks per row (dot + the two norms). This expression is one fused
  * loop with `doGenCode`, no intermediate array, inside whole-stage
  * codegen — the difference between scoring 100 TB of embeddings in one
  * pass and paying an interpreter round-trip per vector element.
  *
  * Null contract (same as the HOF shape): null input → null; length
  * mismatch or empty arrays → null; any null element → null.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.ArrayDot.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {

  /** Shared by the interpreted and generated paths so they cannot drift.
    * Returns a boxed Double (null encodes the guard failures above); the
    * one box per ROW is noise next to the per-ELEMENT allocations the
    * HOF stack pays.
    */
  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements() || n == 0) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column wrapper: `ArrayDot(a, b)` over `array<double>` columns. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
