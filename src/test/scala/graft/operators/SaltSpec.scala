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
}
