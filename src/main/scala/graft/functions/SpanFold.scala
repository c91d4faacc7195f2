package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native every-position window fold over an `array<bigint>` of token
  * hashes: for each k-wide window, the coprime double modular fold
  * `(fold mod Mod1) · 2³¹ + (fold mod Mod2)` — the 62-bit shingle/span
  * identity the whole near-dup family keys on
  * (`DedupOps.trigramHashesOf` is the k = 3 instance; see `CdcMix2`'s
  * doc there for why ONE modulus is not collision-resistant).
  *
  * Why native: the HOF formulation is k − 1 `ZipWith` passes, each a
  * `CodegenFallback` that leaves generated code, allocates two slice
  * arrays and a zipped output per pass, and interprets the lambda per
  * element — the dominant interpreted cost of the shingle-index build
  * and every span query. This expression is ONE fused loop with
  * `doGenCode`, no intermediate arrays, inside whole-stage codegen.
  * Bit-equality to the HOF form is pinned by a scalacheck property
  * (SpanFoldSpec) on the real domain (non-negative < 2⁶⁰ hashes, where
  * no intermediate exceeds 2⁶² — outside it the HOF's packed
  * shift/mask arithmetic is itself undefined).
  *
  * Null contract (matching the HOF shape exactly): null array → null
  * row; fewer than k elements → empty array; a null ELEMENT nullifies
  * every window containing it (arithmetic over null is null in each
  * zip pass), other windows unaffected.
  */
case class SpanFold(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "span_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"span_fold width must be >= 1, got $k")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"span_fold expects ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    SpanFold.fold(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanFold.fold($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): SpanFold =
    copy(child = newChild)
}

object SpanFold {

  /** The fold constants — single source of truth; `DedupOps` re-exports
    * them (P31/BucketMix/CdcMix2/P31B) and every DuckDB twin renders
    * from the same values. Mod1/Mod2 are coprime primes just under
    * 2³¹; both mixes stay small enough that `f · mix + h` never
    * exceeds 2⁶² for 60-bit token hashes.
    */
  val Mod1 = 2147483647L // Mersenne prime 2^31 - 1
  val Mod2 = 2147483629L // largest prime below Mod1
  val Mix1 = 1000003L
  val Mix2 = 1000033L

  /** Shared by the interpreted and generated paths so they cannot
    * drift. The common case (no null elements — every production
    * caller, since token hashes are non-null by construction) fills a
    * primitive long[] and wraps it via
    * `UnsafeArrayData.fromPrimitiveArray` — genuinely unboxed end to
    * end (GenericArrayData's long[] constructor would re-box every
    * element); only an input that actually contains nulls falls back
    * to the boxed array.
    */
  def fold(th: ArrayData, k: Int): ArrayData = {
    val len = th.numElements()
    val n = math.max(len - (k - 1), 0)
    val out = new Array[Long](n)
    var boxed: Array[Any] = null
    var i = 0
    while (i < n) {
      var f1 = 0L
      var f2 = 0L
      var anyNull = false
      var j = 0
      while (j < k) {
        if (th.isNullAt(i + j)) { anyNull = true; j = k }
        else {
          val h = th.getLong(i + j)
          f1 = (f1 * Mix1 + h) % Mod1
          f2 = (f2 * Mix2 + h) % Mod2
          j += 1
        }
      }
      if (anyNull && boxed == null) {
        boxed = new Array[Any](n)
        var c = 0
        while (c < i) { boxed(c) = java.lang.Long.valueOf(out(c)); c += 1 }
      }
      val v = f1 * (1L << 31) + f2
      if (boxed != null) boxed(i) = if (anyNull) null else java.lang.Long.valueOf(v)
      else out(i) = v
      i += 1
    }
    if (boxed != null) new GenericArrayData(boxed)
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Column wrapper: `SpanFold(th, k)` over an `array<bigint>` column. */
  def apply(th: Column, k: Int): Column =
    GraftBridge.column(SpanFold(GraftBridge.expression(th), k))
}
