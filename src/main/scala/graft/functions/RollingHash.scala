package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: polynomial rolling hash over the UTF-8 bytes of a
  * string — `h = h * 31 + byte` with natural 64-bit wraparound.
  *
  * A native Catalyst `Expression` with `doGenCode` rather than a Scala UDF:
  * the per-byte loop compiles straight into the whole-stage-codegen'd stage
  * (no boxing, no serialization of a closure per row), which is the shape
  * that survives a 100 TB scan. Used by the `text_fingerprint` query; the
  * interpreted path (`nullSafeEval`) and generated code share
  * [[RollingHash.hashBytes]] and are asserted identical in RollingHashSpec.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Shared by the interpreted and generated paths so they cannot drift. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Column wrapper: `rollingHash(col("text"))`. */
  def apply(c: Column): Column = GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}
