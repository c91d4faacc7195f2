package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[EventOps.zscoreOf]]: on random value
  * streams, the distributed integer cross-multiplied outlier test must
  * agree with a sequential BigInt evaluation of the same inequality
  * (n·x − S1)² > k²·(n·S2 − S1²) over exact hundredths — including tie
  * values sitting exactly on the boundary, where a float z-score
  * threshold could flip either way.
  */
object ZscoreProps extends Properties("EventOps.zscore") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  // Two-decimal doubles, like the fixture's value column; a small value
  // domain plus occasional spikes makes boundary ties likely.
  private val genValues: Gen[List[(String, Double)]] =
    Gen.nonEmptyListOf(for {
      tpe <- Gen.oneOf("click", "view")
      centi <- Gen.frequency(
        8 -> Gen.chooseNum(0L, 500L),
        1 -> Gen.chooseNum(50000L, 100000L))
    } yield (tpe, centi / 100.0))

  private def seqOutliers(xs: Seq[Long], k: Long): Long = {
    val n = BigInt(xs.size)
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    xs.count { x =>
      val lhs = (n * x - s1).pow(2)
      lhs > k * k * (n * s2 - s1 * s1)
    }.toLong
  }

  property("agrees with a sequential BigInt evaluation") =
    Prop.forAllNoShrink(genValues) { values =>
      import spark.implicits._
      val df = values.zipWithIndex
        .map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
      val got = EventOps.zscoreOf(df)
        .select("event_type", "outliers")
        .as[(String, Long)].collect().toMap
      val expected = values.groupBy(_._1).map { case (t, vs) =>
        t -> seqOutliers(vs.map(v => math.round(v._2 * 100)), EventOps.ZScoreK)
      }
      got == expected
    }
}
