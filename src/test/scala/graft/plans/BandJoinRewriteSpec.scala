package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.ScalarOps

class BandJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    TestSpark.withConf("spark.sql.adaptive.enabled" -> "false") {
      df.queryExecution.executedPlan.toString
    }

  test("naive band predicate is rewritten away from the nested loop") {
    BandJoinRewrite.install(spark)
    val naive = Seq((1L, 10L), (2L, 100L)).toDF("id", "x")
      .join(Seq((5L, 11L), (6L, 50L)).toDF("rid", "y"),
        abs(col("x") - col("y")) <= 3)
    val plan = planOf(naive)
    assert(plan.contains("__graft_bucket"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(naive.select("id", "rid").as[(Long, Long)].collect().toSet ===
      Set((1L, 5L)))
  }

  test("auto-rewritten query equals the hand-bucketized one") {
    val auto = ScalarOps.bandJoinAuto(spark, dir)
      .as[(String, Long)].collect().toMap
    val hand = ScalarOps.bandJoin(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(auto === hand)
    assert(auto.values.sum > 0)
  }

  test("joins that already carry an equi key are left untouched") {
    BandJoinRewrite.install(spark)
    val withEqui = Seq((1L, 10L)).toDF("id", "x")
      .join(Seq((1L, 12L)).toDF("rid", "y"),
        col("id") === col("rid") && abs(col("x") - col("y")) <= 3)
    assert(!planOf(withEqui).contains("__graft_bucket"))
    assert(withEqui.count() === 1L)
  }

  test("BETWEEN-style conjunct bands rewrite too, including asymmetric ones") {
    BandJoinRewrite.install(spark)
    val xs = Seq(-6L, -2L, 0L, 1L, 4L, 7L, 12L)
    val ys = Seq(-7L, -3L, 0L, 2L, 5L, 11L)
    // y - 1 <= x <= y + 4: asymmetric band, width 5
    val df = xs.map(x => (x, x)).toDF("xid", "x")
      .join(ys.map(y => (y, y)).toDF("yid", "y"),
        col("x") >= col("y") - 1 && col("x") <= col("y") + 4)
    val plan = planOf(df)
    assert(plan.contains("__graft_bucket"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val got = df.select("x", "y").as[(Long, Long)].collect().toSet
    val expected =
      (for { x <- xs; y <- ys if x >= y - 1 && x <= y + 4 } yield (x, y)).toSet
    assert(got === expected)
  }

  test("rewrite is exhaustive and exact on adversarial values") {
    BandJoinRewrite.install(spark)
    // Negatives, zero, and values straddling bucket boundaries: the
    // floor-division bucketing must behave identically on both signs.
    val xs = Seq(-7L, -3L, -1L, 0L, 1L, 2L, 5L, 9L)
    val ys = Seq(-8L, -4L, 0L, 3L, 4L, 8L, 10L)
    val k = 2
    val got = xs.map(x => (x, x)).toDF("xid", "x")
      .join(ys.map(y => (y, y)).toDF("yid", "y"),
        abs(col("x") - col("y")) <= k)
      .select("x", "y").as[(Long, Long)].collect().toSet
    val expected =
      (for { x <- xs; y <- ys if math.abs(x - y) <= k } yield (x, y)).toSet
    assert(got === expected)
  }
}
