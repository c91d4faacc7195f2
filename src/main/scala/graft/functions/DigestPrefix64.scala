package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit hash — the value of the first 15 hex characters
  * of md5 — computed straight from the digest bytes: first 8 bytes read
  * big-endian, then `>>> 4` to drop the 16th nibble.
  *
  * Numerically identical to the composed built-ins
  * `conv(substring(md5(x), 1, 15), 16, 10)` (asserted per-row in
  * DigestPrefix64Spec), and therefore to the DuckDB twin
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` — every sketch oracle
  * keeps its exact value check. What it removes is the per-call string
  * work the composition pays on every shingle of a 100 TB corpus: the
  * 32-char hex rendering, the substring copy, and conv's base-16
  * string parse — three UTF8String allocations per hash, gone.
  *
  * Native `Expression` with `doGenCode`, so it stays inside whole-stage
  * codegen; interpreted and generated paths share [[DigestPrefix64.hash]]
  * (a thread-local MessageDigest — the JDK instance is not thread-safe
  * and per-call getInstance would dominate the hash itself).
  */
case class DigestPrefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "digest_prefix64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"digest_prefix64 expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    DigestPrefix64.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DigestPrefix64.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DigestPrefix64 =
    copy(child = newChild)
}

object DigestPrefix64 {
  private val local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Shared by the interpreted and generated paths so they cannot drift. */
  def hash(bytes: Array[Byte]): Long = {
    val md = local.get()
    md.reset()
    val d = md.digest(bytes)
    // First 8 digest bytes big-endian = first 16 hex chars; >>> 4 keeps
    // the leading 15 (a 60-bit non-negative value on both engines).
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Column wrapper: `DigestPrefix64(col("s"))`. */
  def apply(c: Column): Column = GraftBridge.column(DigestPrefix64(GraftBridge.expression(c)))
}
