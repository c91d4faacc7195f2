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

  test("one-pass regression and Welch t match sequential least-squares folds") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.lineitem(spark, dir)
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[(String, Double, Double)].collect()
    def ols(xs: Array[(Double, Double)]): (Double, Double, Double) = {
      val n = xs.length.toDouble
      val mx = xs.map(_._1).sum / n
      val my = xs.map(_._2).sum / n
      val cxy = xs.map { case (x, y) => (x - mx) * (y - my) }.sum
      val cxx = xs.map { case (x, _) => (x - mx) * (x - mx) }.sum
      val cyy = xs.map { case (_, y) => (y - my) * (y - my) }.sum
      (cxy / cxx, my - cxy / cxx * mx, cxy * cxy / (cxx * cyy))
    }
    val want = rows.groupBy(_._1).view
      .mapValues(g => ols(g.map(r => (r._2, r._3)))).toMap
    StarOps.aggRegression(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .foreach { case (flag, _, slope, intercept, r2) =>
        val (ws, wi, wr) = want(flag)
        // Different summation order/formula: allow a couple of floor
        // units of drift — a real defect diverges by orders of
        // magnitude.
        assert(math.abs(slope - math.floor(ws * 1e6)) <= 2, s"$flag slope")
        assert(math.abs(intercept - math.floor(wi * 1e6)) <= 2, s"$flag intercept")
        assert(math.abs(r2 - math.floor(wr * 1e6)) <= 2, s"$flag r2")
      }
    // Welch t: cross-check one pair against the direct formula over
    // per-group quantity folds.
    val byFlag = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def welch(a: Array[Double], b: Array[Double]): Double = {
      def mv(x: Array[Double]) = {
        val m = x.sum / x.length
        (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
      }
      val ((ma, va), (mb, vb)) = (mv(a), mv(b))
      (ma - mb) / math.sqrt(va / a.length + vb / b.length)
    }
    StarOps.aggTtest(spark, dir)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .foreach { case (fa, fb, _, _, t, _) =>
        val wt = welch(byFlag(fa), byFlag(fb))
        assert(math.abs(t - math.floor(wt * 1e6)) <= 2, s"($fa,$fb) t")
      }
  }

  test("AQE skew drill takes the split path at the smallest fixture too") {
    // joinSkewAqe asserts the skew markers internally (require on the
    // final adaptive plan); this drives that assertion at sf0.001 so a
    // threshold drift that only breaks the smallest fixture is caught
    // by tests, not by a later Verify run. Values must match the
    // manual-salting twin's shape: one row per supplier nation.
    val rows = StarOps.joinSkewAqe(spark, "/root/testdata/sf0.001")
      .as[(Int, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum === graft.Tables
      .lineitem(spark, "/root/testdata/sf0.001").count())
  }

  test("q22 idle-customers binds real rows at the driver gate's scale") {
    // The r12 advice: with "no orders ever" the anti-join arm was empty
    // at every fixture scale, so the exact oracle was vacuous. The
    // half-average bound + idle-since cutoff must produce rows at
    // sf0.01 (the driver's gate scale) for the hash to bind anything.
    val got = StarOps.q22IdleCustomers(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty, "q22 gate is vacuous: no idle wealthy customers")
    assert(got.map(_._2).sum >= 1L)
    got.foreach { case (_, n, cents) => assert(n >= 1L && cents != 0L) }
  }

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
