package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._

class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketized band join equals the direct theta join") {
    val epoch = to_date(lit("1970-01-01"))
    val direct = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), epoch).as("od"))
      .join(Tables.lineitem(spark, dir)
          .select(datediff(to_date(col("l_shipdate")), epoch).as("ld")),
        abs(col("ld") - col("od")) <= 1)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val bucketized = ScalarOps.bandJoin(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(bucketized === direct)
    assert(bucketized.values.sum > 0, "fixture must produce matches")
  }

  test("band join plans as an equi join, never a nested loop") {
    // AQE wraps the tree and hides the join node from plan traversal;
    // inspect under AQE off, same as BucketingSpec.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = ScalarOps.bandJoin(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
