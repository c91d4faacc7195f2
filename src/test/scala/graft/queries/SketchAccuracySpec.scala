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
    // 0.05; 4 sigma (20%) is a generous-but-meaningful deterministic
    // pin. The registered query emits (exact, in-band boolean) — the
    // estimate is independently recomputed here so the pin does not
    // rest on the query's own band arithmetic.
    val exact = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_part"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("ap"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      assert(math.abs(a - e) <= 0.2 * e,
        s"flag=$flag approx=$a exact=$e outside 4-sigma HLL band")
    }
    // And the value-gated form agrees: exact counts match, every
    // boolean binds TRUE.
    ScalarOps.approxDistinct(spark, dir).collect().foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)))
      assert(r.getBoolean(2), s"flag=${r.getString(0)} estimate out of band")
    }
  }

  test("approx_distinct_incr merge is inside HLL error of the exact union") {
    val row = ScalarOps.approxDistinctIncr(spark, dir).collect().head
    val (hist, batch, merged) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // Exact side columns really are the exact distincts.
    val exact = Tables.documents(spark, dir)
      .select(countDistinct(col("text"))).collect().head.getLong(0)
    assert(merged === exact)
    assert(hist <= exact && batch <= exact && hist + batch >= exact)
    // Every estimate binds inside the 5% band (DataSketches HLL at
    // default lgK=12 has ~1.6% relative standard error).
    assert(row.getBoolean(3) && row.getBoolean(4) && row.getBoolean(5),
      "an HLL estimate drifted outside its 5% band")
    // Deterministic: a rerun yields identical gate values.
    val again = ScalarOps.approxDistinctIncr(spark, dir).collect().head
    assert(again.toSeq === row.toSeq)
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
    val k = TextOps.MgIncrK.toLong
    // Pruning is REAL at this k: the summary is bounded by k and the
    // survivors' counts were actually decremented (the drill must not
    // degenerate to a wordcount the way an over-sized k would).
    assert(got.length <= k)
    assert(got.exists { case (w, est) => est < exact(w) },
      "no estimate was decremented - the prunes never fired")
    // Superset guarantee survives the merge: every token heavier than
    // the MG threshold N/(k+1) must be among the merged candidates.
    val cands = got.map(_._1).toSet
    exact.foreach { case (w, c) =>
      if (c > total / (k + 1)) assert(cands.contains(w),
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
    // 1%-rank window asserted here, which keeps the pin valid at any
    // sf. The estimate is recomputed directly so the pin is independent
    // of the registered query's own band arithmetic.
    val p50 = band(col("l_extendedprice"), 0.50, 0.01)
    val p90 = band(col("l_extendedprice"), 0.90, 0.01)
    val approx = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("pp"))
      .select(col("l_returnflag"),
        element_at(col("pp"), 1).as("a50"), element_at(col("pp"), 2).as("a90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === p50.keySet)
    approx.foreach { case (flag, (a50, a90)) =>
      val (lo50, hi50) = p50(flag)
      val (lo90, hi90) = p90(flag)
      assert(a50 >= lo50 && a50 <= hi50, s"flag=$flag p50 $a50 outside [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"flag=$flag p90 $a90 outside [$lo90,$hi90]")
    }
    // The value-gated form: every in-band/ordered boolean binds TRUE.
    ScalarOps.approxPercentile(spark, dir).collect().foreach { r =>
      assert(r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8),
        s"flag=${r.getString(0)} sketch estimate escaped its gate band")
    }
  }

  test("approx_percentile_incr merged KLL quantiles land within a 3%-rank window") {
    // DataSketches KLL at Spark's default k=200 bounds normalized rank
    // error near 1.65% (99% confidence); 3% absorbs that plus the
    // randomized-compaction wobble on top of the merge. The registered
    // query emits exact n bookkeeping plus in-band booleans.
    val counts = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = ScalarOps.approxPercentileIncr(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === counts.keySet)
    rows.foreach { case (flag, r) =>
      // n bookkeeping is exact in KLL: the split loses no rows and the
      // merge preserves the total.
      assert(r.getLong(1) + r.getLong(2) === counts(flag),
        s"flag=$flag history_n+batch_n != total")
      assert(r.getLong(3) === counts(flag), s"flag=$flag merged_n != total")
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6) &&
        r.getBoolean(7),
        s"flag=$flag a KLL quantile escaped its 3%-rank band")
    }
  }

  test("agg_mad_approx lands within a 1%-rank window of the exact median and MAD") {
    // Independent recompute of the raw sketch estimates (the registered
    // query now emits in-band booleans, not the raw values).
    val medBand = band(col("l_extendedprice"), 0.50, 0.01)
    val approx = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5),
        lit(ScalarOps.ApproxAccuracy)).as("amed"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === medBand.keySet)
    approx.foreach { case (flag, aMed) =>
      val (lo, hi) = medBand(flag)
      assert(aMed >= lo && aMed <= hi, s"flag=$flag median $aMed outside [$lo,$hi]")
    }
    // The MAD pass runs over |x − approxMed|, so its exact band must be
    // computed around the SAME approximate center the sketch used.
    val medsDf = spark.createDataFrame(approx.toSeq).toDF("l_returnflag", "amed")
    val devBand = Tables.lineitem(spark, dir)
      .join(broadcast(medsDf), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(percentile_approx(abs(col("l_extendedprice") - col("amed")),
          lit(0.5), lit(ScalarOps.ApproxAccuracy)).as("amad"),
        percentile(abs(col("l_extendedprice") - col("amed")),
          array(lit(0.49), lit(0.51))).as("band"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getSeq[Double](2).head, r.getSeq[Double](2).last))
      .toMap
    devBand.foreach { case (flag, (aMad, lo, hi)) =>
      assert(aMad >= lo && aMad <= hi, s"flag=$flag MAD $aMad outside [$lo,$hi]")
    }
    // And the value-gated form binds: every boolean TRUE.
    ScalarOps.robustStatsApprox(spark, dir).collect().foreach { r =>
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"flag=${r.getString(0)} sketch estimate escaped its gate band")
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
    val rows = StarOps.aggSpearmanApprox(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      // The emitted exact ppm really is the exact twin's, and the
      // binned estimate binds inside the band.
      assert(r.getLong(2) === exact(r.getString(0)))
      assert(r.getBoolean(3),
        s"flag=${r.getString(0)} binned estimate outside the 10000 ppm band")
    }
  }
}
