package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScalarOpsSpec extends AnyFunSuite {

  test("winsorized stats clip ~10% per tail and keep the sum inside the band") {
    import TestSpark.spark.implicits._
    val rows = ScalarOps.winsorizedStats(TestSpark.spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, cnt, microSum, clipLo, clipHi) =>
      // Exact p10/p90 cuts clip at most ~10% per tail (interpolation
      // can leave slightly fewer strictly-outside values).
      assert(clipLo <= cnt / 10 + 1 && clipHi <= cnt / 10 + 1, s"$flag tails")
      assert(clipLo > 0 && clipHi > 0, s"$flag band must bite on real data")
      // The clipped mean lies inside the clipping band by construction.
      val mean = microSum.toDouble / cnt / 1e6
      assert(mean > 0, s"$flag mean $mean")
    }
  }
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("LATERAL subquery decorrelates to a join — no per-row re-execution") {
    val plan = ScalarOps.sqlLateral(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"lateral fell back to a cartesian product:\n$plan")
    // The decorrelated form ranks within the correlation key — the same
    // shape topk_groups writes by hand — and joins it back.
    val rows = ScalarOps.sqlLateral(spark, dir).collect()
    val perPrio = rows.groupBy(_.getString(0))
    assert(perPrio.nonEmpty)
    perPrio.foreach { case (p, rs) => assert(rs.length <= 2, s"$p returned ${rs.length} rows") }
  }

  test("null-safe join matches NULL keys to the dim's missing row") {
    val rows = ScalarOps.nullSafeJoin(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Planted semantics: every o_orderkey % 7 == 0 row gets k = NULL and
    // must land on 'missing'; 1 and 2 land on their labels; 3..6 drop.
    val keys = graft.Tables.orders(spark, dir)
      .select((col("o_orderkey") % 7).as("m")).as[Long].collect()
    assert(rows("missing") === keys.count(_ == 0L).toLong)
    assert(rows("one") === keys.count(_ == 1L).toLong)
    assert(rows("two") === keys.count(_ == 2L).toLong)
    assert(rows.keySet === Set("missing", "one", "two"))
  }
}
