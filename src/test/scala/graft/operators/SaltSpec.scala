package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SaltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of probe rows share one hot key.
    val probe = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .toDF("dk", "dv")
    val plain = probe.join(dim, probe("k") === dim("dk"))
      .select("k", "v", "dv").as[(String, Int, Int)].collect().sorted.toSeq
    val salted = Salt.saltedJoin(probe, dim, "k", "dk", factor = 8)
      .select("k", "v", "dv").as[(String, Int, Int)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._1 == "hot") === 900)
  }

  test("salt spreads a hot key across partitions") {
    val probe = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salts = probe
      .withColumn("s", pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
      .select("s").distinct().as[Long].collect().toSet
    assert(salts.size > 4, s"expected most of 8 salt buckets used, got $salts")
  }

  test("AQE's own skew-join mitigation fires on the same join shape") {
    // The thresholds guarding OptimizeSkewedJoin are sized for clusters;
    // drop them so the fixture's hot key registers as skew, and force
    // the sort-merge join the rule targets. This pins that saltedJoin's
    // manual spread is the same mitigation AQE applies at runtime — the
    // production default — while the salt operator remains the portable
    // form for engines/paths without AQE.
    TestSpark.withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = ((1 to 20000).map(i => ("hot", i)) ++ (1 to 200).map(i => (s"k$i", i)))
        .toDF("k", "v")
      val dim = (Seq("hot") ++ (1 to 200).map(i => s"k$i")).zipWithIndex
        .toDF("dk", "dv")
      // No aggregation downstream: splitting a skewed partition breaks
      // the join's output partitioning, and OptimizeSkewedJoin declines
      // when that would add a shuffle for a downstream consumer.
      val j = probe.join(dim, probe("k") === dim("dk")).select("k", "v", "dv")
      j.collect() // AQE re-plans at runtime; materialize to get the final plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join, got:\n$plan")
    }
  }
}
