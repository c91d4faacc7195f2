package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Executable accuracy contracts for the `no_oracle` sketch queries.
  *
  * The harness records approx_distinct / approx_percentile /
  * agg_mad_approx as rows-only (sketch internals have no DuckDB twin),
  * so these assertions are their correctness gate: each approx result is
  * pinned inside its sketch's published error band around the registered
  * EXACT twin (agg_multidistinct, agg_percentile, agg_mad). Both sketches
  * are deterministic for a fixed input, so the bounds are stable, not
  * flaky-probabilistic.
  */
class SketchAccuracySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("approx_distinct is inside the HLL++ error band of the exact counts") {
    // approx_count_distinct's default relative standard deviation is
    // 0.05; 4 sigma (20%) is a generous-but-meaningful deterministic pin.
    val exact = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_part"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ScalarOps.approxDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      assert(math.abs(a - e) <= 0.2 * e,
        s"flag=$flag approx=$a exact=$e outside 4-sigma HLL band")
    }
  }

  test("approx_distinct_incr merge is inside HLL error of the exact union") {
    val row = ScalarOps.approxDistinctIncr(spark, dir).collect().head
    val (hist, batch, merged) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // Union semantics up to sketch error: the merged estimate sits
    // between the larger input and the inputs' sum, each bound slacked
    // by the HLL error band (all three numbers are estimates — the
    // exact containment only holds for true cardinalities).
    assert(merged >= 0.95 * math.max(hist, batch) && merged <= 1.05 * (hist + batch),
      s"merged=$merged outside the slacked [max($hist,$batch), $hist+$batch] band")
    // DataSketches HLL at default lgK=12 has ~1.6% relative standard
    // error; 5% is a generous deterministic pin against the exact count.
    val exact = Tables.documents(spark, dir)
      .select(countDistinct(col("text"))).collect().head.getLong(0)
    assert(math.abs(merged - exact) <= 0.05 * exact,
      s"merged=$merged exact=$exact outside the 5% HLL band")
    // Deterministic: a rerun yields the identical sketch estimates.
    val again = ScalarOps.approxDistinctIncr(spark, dir).collect().head
    assert((again.getLong(0), again.getLong(1), again.getLong(2)) === ((hist, batch, merged)))
  }

  test("text_heavyhitters_incr: superset of true heavy hitters, counts in the MG band") {
    import spark.implicits._
    val got = TextOps.heavyHittersIncr(spark, dir)
      .as[(String, Long)].collect()
    assert(got.nonEmpty)
    // Exact corpus-wide counts over the SAME tokenization.
    val exact = Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val total = exact.values.sum
    val k = TextOps.MgSummarySize.toLong
    // Superset guarantee survives the merge: every >= 0.1%-of-corpus
    // token must be among the merged candidates.
    val cands = got.map(_._1).toSet
    exact.foreach { case (w, c) =>
      if (c * 1000L >= total) assert(cands.contains(w),
        s"true heavy hitter $w (cnt=$c, total=$total) missing from merged summary")
    }
    // Merged counts are under-estimates within N_total/(k+1) of truth.
    got.foreach { case (w, est) =>
      val t = exact.getOrElse(w, 0L)
      assert(est <= t, s"$w: est=$est over true=$t")
      assert(t - est <= total / (k + 1) + 1,
        s"$w: est=$est below true=$t by more than N/(k+1)")
    }
    // Deterministic rerun.
    assert(TextOps.heavyHittersIncr(spark, dir)
      .as[(String, Long)].collect().toSeq === got.toSeq)
  }

  /** Exact quantile band [q(f-eps), q(f+eps)] per group for a column. */
  private def band(colExpr: org.apache.spark.sql.Column, f: Double, eps: Double) =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile(colExpr, array(lit(f - eps), lit(f + eps))).as("band"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1).head, r.getSeq[Double](1).last))
      .toMap

  test("approx_percentile lands within a 1%-rank window of the exact quantiles") {
    // accuracy=10000 bounds rank error at n/10000 rows — far inside the
    // 1%-rank window asserted here, which keeps the pin valid at any sf.
    val p50 = band(col("l_extendedprice"), 0.50, 0.01)
    val p90 = band(col("l_extendedprice"), 0.90, 0.01)
    val approx = ScalarOps.approxPercentile(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === p50.keySet)
    approx.foreach { case (flag, (a50, a90)) =>
      val (lo50, hi50) = p50(flag)
      val (lo90, hi90) = p90(flag)
      assert(a50 >= lo50 && a50 <= hi50, s"flag=$flag p50 $a50 outside [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"flag=$flag p90 $a90 outside [$lo90,$hi90]")
    }
  }

  test("approx_percentile_incr merged KLL quantiles land within a 3%-rank window") {
    // DataSketches KLL at Spark's default k=200 bounds normalized rank
    // error near 1.65% (99% confidence); 3% absorbs that plus the
    // randomized-compaction wobble on top of the merge.
    val p50 = band(col("l_extendedprice"), 0.50, 0.03)
    val p90 = band(col("l_extendedprice"), 0.90, 0.03)
    val counts = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = ScalarOps.approxPercentileIncr(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === p50.keySet)
    rows.foreach { case (flag, r) =>
      // n bookkeeping is exact in KLL: the split loses no rows.
      assert(r.getLong(1) + r.getLong(2) === counts(flag),
        s"flag=$flag history_n+batch_n != total")
      val (lo50, hi50) = p50(flag)
      val (lo90, hi90) = p90(flag)
      val (m50, m90) = (r.getDouble(5), r.getDouble(6))
      assert(m50 >= lo50 && m50 <= hi50, s"flag=$flag merged p50 $m50 outside [$lo50,$hi50]")
      assert(m90 >= lo90 && m90 <= hi90, s"flag=$flag merged p90 $m90 outside [$lo90,$hi90]")
    }
  }

  test("agg_mad_approx lands within a 1%-rank window of the exact median and MAD") {
    val medBand = band(col("l_extendedprice"), 0.50, 0.01)
    val approx = ScalarOps.robustStatsApprox(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === medBand.keySet)
    approx.foreach { case (flag, (aMed, _)) =>
      val (lo, hi) = medBand(flag)
      assert(aMed >= lo && aMed <= hi, s"flag=$flag median $aMed outside [$lo,$hi]")
    }
    // The MAD pass runs over |x − approxMed|, so its exact band must be
    // computed around the SAME approximate center the sketch used.
    val meds = approx.map { case (flag, (aMed, _)) => (flag, aMed) }
    val medsDf = spark.createDataFrame(meds.toSeq).toDF("l_returnflag", "amed")
    val devBand = Tables.lineitem(spark, dir)
      .join(broadcast(medsDf), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(percentile(abs(col("l_extendedprice") - col("amed")),
        array(lit(0.49), lit(0.51))).as("band"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1).head, r.getSeq[Double](1).last))
      .toMap
    approx.foreach { case (flag, (_, aMad)) =>
      val (lo, hi) = devBand(flag)
      assert(aMad >= lo && aMad <= hi, s"flag=$flag MAD $aMad outside [$lo,$hi]")
    }
  }

  test("agg_spearman_approx is within 1% (10000 ppm) of the exact rank correlation") {
    // Quantile binning at SpearmanBins=256 bounds per-value rank error
    // at n/256 rows, so the bin-index correlation sits O(1/256) ≈
    // 3900 ppm from true Spearman in the worst case; measured deltas on
    // this corpus are ≤ ~500 ppm. 10000 ppm is a generous-but-meaningful
    // deterministic pin (percentile_approx cuts are deterministic for a
    // fixed input, so this is stable, not flaky-probabilistic).
    val exact = StarOps.aggSpearman(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = StarOps.aggSpearmanApprox(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      assert(math.abs(a - e) <= 10000L,
        s"flag=$flag approx=$a exact=$e outside the 10000 ppm band")
    }
  }
}
