package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples =
    Seq("", "a", "abc", "the quick brown fox", "éclair ☃ mixed UTF-8", "a" * 1000)

  private def viaSpark(wholeStage: Boolean): Seq[Long] =
    TestSpark.withConf(
      "spark.sql.codegen.wholeStage" -> wholeStage.toString,
      "spark.sql.codegen.factoryMode" -> (if (wholeStage) "FALLBACK" else "NO_CODEGEN")) {
      samples.toDF("s")
        .select(RollingHash(col("s")).as("h"))
        .collect().map(_.getLong(0)).toSeq
    }

  test("codegen and interpreted paths agree with the driver-side model") {
    val expected = samples.map(s => RollingHash.hashBytes(s.getBytes("UTF-8")))
    assert(viaSpark(wholeStage = true) === expected)
    assert(viaSpark(wholeStage = false) === expected)
  }

  test("null input propagates null") {
    val out = Seq(Some("x"), None).toDF("s")
      .select(RollingHash(col("s")).as("h")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("registered SQL function: spark.sql('rolling_hash(...)') works") {
    GraftFunctions.register(spark)
    samples.toDF("s").createOrReplaceTempView("rh_samples")
    val viaSql = spark.sql("SELECT rolling_hash(s) FROM rh_samples")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === samples.map(s => RollingHash.hashBytes(s.getBytes("UTF-8"))))
  }

  test("non-string input is rejected at analysis time") {
    val e = intercept[Exception] {
      Seq(1L).toDF("n").select(RollingHash(col("n"))).collect()
    }
    assert(e.getMessage.contains("rolling_hash"))
  }
}
