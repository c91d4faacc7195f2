package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drives the DECLARATIVE registration path end to end — the
  * `spark.sql.extensions=graft.functions.GraftExtensions` plugin point a
  * cluster deployment uses — where the other specs only exercise the
  * imperative `GraftFunctions.register`. A fresh session is built over
  * the shared context with `withExtensions` (the same injection hook
  * spark-submit's conf triggers), then restored so the rest of the
  * suite keeps its session.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("the extensions entry point injects SQL functions and the optimizer rule") {
    val base = TestSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "withExtensions must yield a fresh session")

      val row = s.sql(
        "SELECT rolling_hash('abc') AS r, digest_prefix64('abc') AS d").collect().head
      assert(row.getLong(0) === RollingHash.hashBytes("abc".getBytes("UTF-8")))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("abc".getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      assert(row.getLong(1) === java.lang.Long.parseLong(hex, 16))

      val arr = s.sql(
        """SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       sorted_rank(array(1.0D, 2.0D, 2.0D, 5.0D), 2.0D) AS r""".stripMargin)
        .collect().head
      assert(arr.getDouble(0) === 11.0)
      assert(arr.getLong(1) === 3L)

      // span_fold arrives through the same plugin point and matches
      // the fold constants end to end (one 2-wide window of (7, 11)).
      val sf = s.sql("SELECT span_fold(array(7L, 11L), 2) AS w").collect().head
      val f1 = ((7L % SpanFold.Mod1) * SpanFold.Mix1 + 11L) % SpanFold.Mod1
      val f2 = ((7L % SpanFold.Mod2) * SpanFold.Mix2 + 11L) % SpanFold.Mod2
      assert(sf.getSeq[Long](0) === Seq(f1 * (1L << 31) + f2))

      // DESCRIBE works like a built-in (the ExpressionInfo is wired).
      val desc = s.sql("DESCRIBE FUNCTION rolling_hash").collect().mkString
      assert(desc.contains("rolling_hash"))

      // The optimizer rule rides in through the same entry point.
      assert(s.sessionState.optimizer.extendedOperatorOptimizationRules
        .contains(graft.plans.BandJoinRewrite))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
