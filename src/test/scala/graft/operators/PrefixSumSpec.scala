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

  test("grouped running totals equal the per-group sequential prefix sum at ANY partition count") {
    // 3 groups × ~70 rows with duplicate values; the cumulative must
    // reset per group and stay partition-boundary-invariant even when
    // a range split lands inside a group.
    val rows = (1 to 200).map(i =>
      (("g" + (i % 3)), i.toLong, ((i * 37) % 11).toLong + 1L))
    val df = rows.toDF("g", "id", "v")
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.map(_._2).zip(sorted.scanLeft(0L)(_ + _._3).tail)
    }.toMap
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = PrefixSum.withRunningTotal(
          df, Seq(asc("id")), col("v"), parts, groupCols = Seq("g"))
        .select("g", "id", "cum")
        .as[(String, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq)
        .toMap
      assert(got === want, s"partitions=$parts")
    }
  }

  test("NULL group values form their own group instead of vanishing") {
    val df = Seq((Some("a"), 1L, 2L), (None, 2L, 3L), (None, 3L, 5L),
      (Some("a"), 4L, 7L)).toDF("g", "id", "v")
    val got = PrefixSum.withRunningTotal(
        df, Seq(asc("id")), col("v"), 4, groupCols = Seq("g"))
      .select("g", "id", "cum")
      .as[(Option[String], Long, Long)].collect().sortBy(_._2).toList
    // A null-unsafe offsets join would DROP the None rows entirely.
    assert(got === List((Some("a"), 1L, 2L), (None, 2L, 3L),
      (None, 3L, 8L), (Some("a"), 4L, 9L)))
  }

  test("a high-cardinality group column fails loudly instead of broadcasting") {
    // The grouped variant's offsets frame is partitions × |groups| rows
    // and BROADCASTS — a per-key misuse (here ~70k distinct groups)
    // must hit the runtime guard, not silently build the frame.
    val df = spark.range(70000).selectExpr("id AS g", "id", "1L AS v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotal(
        df, Seq(asc("id")), col("v"), 4, groupCols = Seq("g")).collect()
    }
    assert(e.getMessage.contains("Window.partitionBy"))
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
