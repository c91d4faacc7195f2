package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DigestPrefix64Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val samples =
    Seq("", "a", "abc", "the quick brown fox", "éclair ☃ mixed UTF-8", "a" * 1000)

  test("equals the composed conv(substring(md5)) built-ins on every input") {
    val rows = samples.toDF("s")
      .select(
        DigestPrefix64(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
      .as[(Long, Long)].collect()
    rows.zip(samples).foreach { case ((n, c), s) =>
      assert(n === c, s"mismatch for input '$s'")
    }
  }

  test("codegen and interpreted paths agree with the driver-side model") {
    val expected = samples.map(s => DigestPrefix64.hash(s.getBytes("UTF-8")))
    def viaSpark(wholeStage: Boolean): Seq[Long] =
      TestSpark.withConf(
        "spark.sql.codegen.wholeStage" -> wholeStage.toString,
        "spark.sql.codegen.factoryMode" -> (if (wholeStage) "FALLBACK" else "NO_CODEGEN")) {
        samples.toDF("s")
          .select(DigestPrefix64(col("s")).as("h"))
          .collect().map(_.getLong(0)).toSeq
      }
    assert(viaSpark(wholeStage = true) === expected)
    assert(viaSpark(wholeStage = false) === expected)
  }

  test("RFC 1321 vector: md5('abc') prefix matches the known digest") {
    // md5('abc') = 900150983cd24fb0...; the first 15 hex chars as a long.
    val got = Seq("abc").toDF("s")
      .select(DigestPrefix64(col("s"))).as[Long].head()
    assert(got === java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("null input propagates null") {
    val out = Seq(Some("x"), None).toDF("s")
      .select(DigestPrefix64(col("s")).as("h")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("registered SQL function: spark.sql('digest_prefix64(...)') works") {
    GraftFunctions.register(spark)
    samples.toDF("s").createOrReplaceTempView("dp_samples")
    val viaSql = spark.sql("SELECT digest_prefix64(s) FROM dp_samples")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === samples.map(s => DigestPrefix64.hash(s.getBytes("UTF-8"))))
  }
}
