package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL-surface registration of graft's native expressions, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works like a built-in.
  *
  * Two registration paths:
  *  - [[register]]: imperative, on an existing session (tests, REPL).
  *  - [[GraftExtensions]]: declarative, via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` on
  *    spark-submit — the standard plugin point for cluster deployments.
  */
object GraftFunctions {

  /** Arity-checked builder shared by both registration paths (a bare
    * `exprs.head` would silently drop extra arguments).
    */
  private[functions] def buildRollingHash(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"rolling_hash expects exactly 1 argument, got ${exprs.length}")
    RollingHash(exprs.head)
  }

  private[functions] def buildDigestPrefix64(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"digest_prefix64 expects exactly 1 argument, got ${exprs.length}")
    DigestPrefix64(exprs.head)
  }

  private[functions] def buildArrayDot(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"array_dot expects exactly 2 arguments, got ${exprs.length}")
    ArrayDot(exprs.head, exprs(1))
  }

  private[functions] def buildSortedRank(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"sorted_rank expects exactly 2 arguments, got ${exprs.length}")
    SortedRank(exprs.head, exprs(1))
  }

  private[functions] def buildSpanFold(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"span_fold expects exactly 2 arguments, got ${exprs.length}")
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
            v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"span_fold width must be an INT literal, got $other")
    }
    SpanFold(exprs.head, k)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", buildRollingHash, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "digest_prefix64", buildDigestPrefix64, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", buildArrayDot, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_rank", buildSortedRank, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "span_fold", buildSpanFold, "built-in")
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(extensions: SparkSessionExtensions): Unit = {
    // The full (non-deprecated) ExpressionInfo constructor; empty
    // fields render like any built-in without docs for that section.
    def info(clazz: Class[_], name: String, usage: String) =
      new ExpressionInfo(clazz.getName, null, name, usage,
        "", "", "", "hash_funcs", "1.0.0", "", "built-in")
    extensions.injectFunction((
      FunctionIdentifier("rolling_hash"),
      info(classOf[RollingHash], "rolling_hash",
        "rolling_hash(str) - 64-bit polynomial rolling hash of str's UTF-8 bytes."),
      GraftFunctions.buildRollingHash))
    extensions.injectFunction((
      FunctionIdentifier("digest_prefix64"),
      info(classOf[DigestPrefix64], "digest_prefix64",
        "digest_prefix64(str) - first 15 hex chars of md5(str) as a 60-bit integer."),
      GraftFunctions.buildDigestPrefix64))
    extensions.injectFunction((
      FunctionIdentifier("array_dot"),
      info(classOf[ArrayDot], "array_dot",
        "array_dot(a, b) - dot product of two ARRAY<DOUBLE> values (left fold in index order)."),
      GraftFunctions.buildArrayDot))
    extensions.injectFunction((
      FunctionIdentifier("sorted_rank"),
      info(classOf[SortedRank], "sorted_rank",
        "sorted_rank(cuts, x) - number of elements of sorted ARRAY<DOUBLE> cuts that are <= x."),
      GraftFunctions.buildSortedRank))
    extensions.injectFunction((
      FunctionIdentifier("span_fold"),
      info(classOf[SpanFold], "span_fold",
        "span_fold(th, k) - 62-bit double-modular fold identity of every k-wide window of ARRAY<BIGINT> th."),
      GraftFunctions.buildSpanFold))
    extensions.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
