package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The structural vacuity gate: Verify.dumpAll must flag any registered
  * query whose gate-scale result is EMPTY (the value oracle is then
  * vacuously true — round 13's hand audit found three such queries, and
  * this check makes the class impossible to reintroduce silently), while
  * leaving non-empty dumps and real exceptions with their existing
  * behavior.
  */
class VerifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def out(): String =
    Files.createTempDirectory("verifyspec").toString

  test("dumpAll flags an empty result as vacuous") {
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "ok_rows" -> ((s, _) => s.range(3).toDF("id")),
      // The pre-05f85ec join_anti shape: a structurally valid frame that
      // binds zero rows — both engines "agree" on it without gating
      // anything.
      "vacuous_empty" -> ((s, _) => s.range(3).toDF("id").filter("id < 0")),
      "boom" -> ((_, _) => throw new RuntimeException("deliberate"))
    )
    val dir = out()
    val failed = Verify.dumpAll(spark, "unused", dir, queries).toMap
    assert(!failed.contains("ok_rows"))
    assert(failed("vacuous_empty") == "vacuous: empty result at gate scale")
    assert(failed("boom").contains("deliberate"))
    // The non-empty dump is readable and complete; the vacuous one still
    // wrote its (empty) parquet so the driver compare stays diagnosable.
    assert(spark.read.parquet(s"$dir/ok_rows").count() == 3)
    assert(spark.read.parquet(s"$dir/vacuous_empty").count() == 0)
  }
}
