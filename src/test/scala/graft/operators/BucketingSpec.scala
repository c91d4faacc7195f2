package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing = the pre-shuffle that makes repeated joins on the same key
  * free (SURVEY scale notes: "bucketing for co-located joins"). Both
  * sides written bucketed by the join key land co-partitioned on disk,
  * so the join plans with ZERO shuffle exchanges — the physical proof,
  * read off the executed plan, not asserted from docs.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def countShuffles(plan: SparkPlan): Int = {
    var n = 0
    plan.foreach { case _: ShuffleExchangeLike => n += 1; case _ => () }
    n
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // warehouse dir is a static conf, set at session creation (TestSpark)
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 1000L).map(k => (k, k * 2)).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").saveAsTable("graft_bkt_right")
    try {
      // broadcast would bypass the point — force a shuffle-capable join;
      // plans must be inspected INSIDE the conf scope (they re-derive
      // lazily under whatever conf is current).
      // AQE wraps the plan in AdaptiveSparkPlanExec, which hides its
      // subtree from SparkPlan.foreach — disable it so the exchange
      // count reads the real tree.
      TestSpark.withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = spark.table("graft_bkt_left").join(spark.table("graft_bkt_right"), "k")
        assert(j.count() === 1000L)
        val shuffles = countShuffles(j.queryExecution.executedPlan)
        assert(shuffles === 0,
          s"expected co-located bucketed join, found $shuffles shuffle exchange(s):\n" +
            j.queryExecution.executedPlan)
        // control: the same join over unbucketed data DOES shuffle
        val plain = left.join(right, "k")
        plain.count()
        assert(countShuffles(plain.queryExecution.executedPlan) > 0)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
