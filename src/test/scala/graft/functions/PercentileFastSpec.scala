package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[PercentileFast]] BIT-EQUAL to the built-in `percentile` —
  * the whole point of the re-encoding is that only the state layout
  * changes, never a result: same value→count identity, same ascending
  * cumulative walk, same interpolation arithmetic. Randomized data
  * deliberately includes heavy duplication (few distinct values, so
  * rank brackets straddle repeats), negative values (the sign-fold
  * sort path), single-row and single-value groups (degenerate
  * brackets), and nulls (skipped on both sides).
  */
class PercentileFastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def compareOn(rows: Seq[(Long, java.lang.Double)],
      ps: Seq[Double]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v").repartition(5)
    val fast = df.groupBy("g")
      .agg(PercentileFast(col("v"), ps).as("pp"),
        PercentileFast(col("v"), ps.head).as("p0"))
      .orderBy("g").collect()
    val ref = df.groupBy("g")
      .agg(percentile(col("v"),
        array(ps.map(p => lit(p)): _*)).as("pp"),
        percentile(col("v"), lit(ps.head)).as("p0"))
      .orderBy("g").collect()
    assert(fast.length === ref.length)
    fast.zip(ref).foreach { case (f, r) =>
      assert(f.getLong(0) === r.getLong(0))
      val fa = f.getSeq[Double](1); val ra = r.getSeq[Double](1)
      assert(fa.length === ra.length, s"group ${f.getLong(0)}")
      fa.zip(ra).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ===
          java.lang.Double.doubleToLongBits(y),
          s"group ${f.getLong(0)}: $x vs $y")
      }
      assert(java.lang.Double.doubleToLongBits(f.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)))
    }
  }

  test("bit-equal to the built-in on continuous random doubles") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map(_ =>
      (rnd.nextInt(4).toLong, java.lang.Double.valueOf(
        (rnd.nextDouble() - 0.3) * 1e5)))
    compareOn(rows, Seq(0.0, 0.13, 0.5, 0.9, 1.0))
  }

  test("bit-equal under heavy duplication and cent-quantized values") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 8000).map(_ =>
      (rnd.nextInt(3).toLong, java.lang.Double.valueOf(
        rnd.nextInt(40) / 100.0 * (if (rnd.nextBoolean()) 1 else -1))))
    compareOn(rows, Seq(0.25, 0.5, 0.75))
  }

  test("degenerate groups: one row, one distinct value, and nulls") {
    val rows: Seq[(Long, java.lang.Double)] = Seq(
      (1L, java.lang.Double.valueOf(3.5)),
      (2L, java.lang.Double.valueOf(-1.0)), (2L, java.lang.Double.valueOf(-1.0)),
      (2L, null),
      (3L, java.lang.Double.valueOf(0.0)), (3L, java.lang.Double.valueOf(1.0)),
      (3L, null), (3L, java.lang.Double.valueOf(2.0)))
    compareOn(rows, Seq(0.0, 0.5, 1.0))
  }

  test("all-null group yields null like the built-in") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Double]), (1L, Option.empty[Double]))
      .toDF("g", "v")
    val f = df.groupBy("g").agg(PercentileFast(col("v"), 0.5).as("p")).head()
    val r = df.groupBy("g").agg(percentile(col("v"), lit(0.5)).as("p")).head()
    assert(f.isNullAt(1) && r.isNullAt(1))
  }

  test("merge across many partitions matches a single-partition run") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 4000).map(_ =>
      (0L, java.lang.Double.valueOf(rnd.nextGaussian() * 100)))
    import spark.implicits._
    val wide = rows.toDF("g", "v").repartition(32)
      .agg(PercentileFast(col("v"), Seq(0.1, 0.5, 0.9)).as("pp"))
      .head().getSeq[Double](0)
    val narrow = rows.toDF("g", "v").coalesce(1)
      .agg(PercentileFast(col("v"), Seq(0.1, 0.5, 0.9)).as("pp"))
      .head().getSeq[Double](0)
    assert(wide === narrow)
  }

  test("non-DOUBLE input fails at analysis, not at execution") {
    import spark.implicits._
    val df = Seq((1L, 2L), (1L, 3L)).toDF("g", "v") // v is BIGINT
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(PercentileFast(col("v"), 0.5).as("p")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double"),
      s"analysis error should name the DOUBLE contract: ${e.getMessage}")
  }
}
