package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Numerical cross-check of the one-pass moment machinery: the
  * power-sum formulation must agree with a direct central-moment fold
  * over the same rows (different summation order and formula, so the
  * tolerance allows a ppm of float drift — anything real diverges by
  * orders of magnitude).
  */
class StarOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one-pass skewness/kurtosis match a sequential central-moment fold") {
    val dir = "/root/testdata/sf0.001"
    val got = StarOps.aggMoments(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map { case (f, n, s, k) => f -> ((n, s, k)) }.toMap
    val raw = graft.Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(raw.keySet === got.keySet)
    raw.foreach { case (flag, xs) =>
      val n = xs.length.toDouble
      val mean = xs.sum / n
      def m(p: Int) = xs.map(x => math.pow(x - mean, p)).sum / n
      val skew = m(3) / math.pow(m(2), 1.5)
      val kurt = m(4) / (m(2) * m(2)) - 3.0
      val (gn, gs, gk) = got(flag)
      assert(gn === xs.length.toLong, s"$flag count")
      assert(math.abs(gs - math.floor(skew * 1e6).toLong) <= 2, s"$flag skew: $gs vs $skew")
      assert(math.abs(gk - math.floor(kurt * 1e6).toLong) <= 2, s"$flag kurtosis: $gk vs $kurt")
    }
  }
}
