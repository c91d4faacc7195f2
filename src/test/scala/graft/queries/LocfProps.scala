package graft.queries

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Random-events drill of the LOCF gap fill: the distributed
  * formulation (struct-max per-hour winner, sequence-densified spine,
  * running `last(ignoreNulls)` carry) must equal a sequential fold on
  * arbitrary layouts — multi-hour silences, several readings in one
  * hour (latest (ts, event_id) wins), single-event users, and values
  * whose cents-floor is negative.
  */
object LocfProps extends Properties("EventOps.locf") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private case class Ev(id: Long, offsetSec: Long, user: Long, value: Double)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(1, 30)
    evs <- Gen.listOfN(n, for {
      off <- Gen.chooseNum(0L, 8L * 3600L)
      // user_id must pass the % 15 slice filter of the query.
      user <- Gen.oneOf(15L, 30L, 45L)
      v <- Gen.chooseNum(-50.0, 50.0)
    } yield (off, user, v))
  } yield evs.zipWithIndex.map { case ((o, u, v), i) => Ev(i + 1L, o, u, v) }

  private val base = Timestamp.valueOf("2024-03-01 00:00:00")
  private val baseSec = base.getTime / 1000L

  private def model(evs: List[Ev]): Seq[(Long, Long, Long, Long)] = {
    evs.groupBy(_.user).toSeq.flatMap { case (user, es) =>
      def hr(e: Ev) = (baseSec + e.offsetSec) / 3600L * 3600L
      val perHour = es.groupBy(hr).map { case (h, hes) =>
        // Latest (ts, event_id) wins; floor() (toward -inf) like both
        // engines' floor, NOT Scala's Long truncation.
        h -> math.floor(hes.maxBy(e => (e.offsetSec, e.id)).value * 100).toLong
      }
      val (lo, hi) = (es.map(hr).min, es.map(hr).max)
      var lastV = 0L
      (lo to hi by 3600L).map { h =>
        val observed = perHour.get(h)
        lastV = observed.getOrElse(lastV)
        (user, h, lastV, if (observed.isEmpty) 1L else 0L)
      }
    }.sortBy(r => (r._1, r._2))
  }

  property("distributed carry equals the sequential fold") =
    Prop.forAll(genEvents) { evs =>
      import spark.implicits._
      val df = evs
        .map(e => (e.id, new Timestamp(base.getTime + e.offsetSec * 1000L),
          e.user, "view", e.value))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = EventOps.locfOf(df)
        .select("user_id", "hr", "v_cents", "carried")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val want = model(evs)
      if (got != want)
        println(s"MISMATCH\n got=$got\n want=$want\n evs=$evs")
      got == want
    }
}
