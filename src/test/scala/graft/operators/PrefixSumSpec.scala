package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("running totals equal the sequential prefix sum at ANY partition count") {
    // 200 rows with duplicate values — the tie-break (id) carries the
    // order. Partition-boundary invariance is the operator's defining
    // property: the same global order must yield the same cum whether
    // the range split lands between or inside tie runs.
    val rows = (1 to 200).map(i => (i.toLong, ((i * 37) % 11).toLong + 1L))
    val df = rows.toDF("id", "v")
    val want = rows.sortBy { case (id, v) => (-v, id) }
      .scanLeft(0L)(_ + _._2).tail
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = PrefixSum.withRunningTotal(
          df, Seq(desc("v"), asc("id")), col("v"), parts)
        .select("id", "v", "cum")
        .as[(Long, Long, Long)].collect()
        .sortBy { case (id, v, _) => (-v, id) }
        .map(_._3)
      assert(got.toSeq === want.toSeq, s"partitions=$parts")
    }
  }

  test("pareto report is internally consistent on the fixture") {
    import graft.queries.StarOps
    val (customers, total, top80, ppm) =
      StarOps.pareto(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long)].collect().head
    assert(top80 >= 1L && top80 <= customers)
    // The crossing point covers at least 80% and, minus one customer,
    // strictly less than 80%.
    assert(ppm >= 800000L, s"covered share $ppm must reach 80%")
    assert(total > 0L)
  }
}
