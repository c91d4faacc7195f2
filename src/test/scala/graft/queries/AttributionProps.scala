package graft.queries

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Random-events drill of the covering-bucket attribution join: the
  * distributed formulation (clicks bucketed by `floor(ts/W)`,
  * purchases exploded to the ≤2 covering buckets, equi join + residual
  * range filter, window-normalized ppm credit) must equal a sequential
  * brute-force model on ARBITRARY event layouts — including clicks
  * exactly on the window edges, simultaneous click/purchase pairs,
  * bucket-boundary straddles (the case a wrong covering-bucket range
  * silently drops), multiple purchases sharing one click, and users
  * with clicks but no purchases.
  */
object AttributionProps extends Properties("EventOps.attribution") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val WUs = EventOps.AttribWindowMin * 60L * 1000000L

  // Events over a ~4-window span so sequences regularly straddle
  // bucket boundaries; second-granularity offsets land edge cases.
  private case class Ev(id: Long, offsetSec: Long, user: Long, typ: String)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(1, 40)
    evs <- Gen.listOfN(n, for {
      off <- Gen.chooseNum(0L, 4L * EventOps.AttribWindowMin * 60L)
      user <- Gen.chooseNum(1L, 4L)
      typ <- Gen.frequency(2 -> Gen.const("click"), 1 -> Gen.const("purchase"),
        1 -> Gen.const("view"))
    } yield (off, user, typ))
  } yield evs.zipWithIndex.map { case ((off, u, t), i) => Ev(i + 1L, off, u, t) }

  /** The sequential truth: per purchase, every same-user click in
    * [pts − W, pts]; each credited `1e6 / n` (truncating).
    */
  private def model(evs: List[Ev]): Map[String, (Long, Long, Long)] = {
    def us(e: Ev) = e.offsetSec * 1000000L
    val clicks = evs.filter(_.typ == "click")
    val credits = for {
      p <- evs.filter(_.typ == "purchase")
      touches = clicks.filter(c =>
        c.user == p.user && us(c) >= us(p) - WUs && us(c) <= us(p))
      c <- touches
    } yield (s"c${c.id % 4}", p.id, 1000000L / touches.size)
    credits.groupBy(_._1).map { case (camp, rows) =>
      camp -> (
        rows.size.toLong,
        rows.map(_._2).distinct.size.toLong,
        rows.map(_._3).sum)
    }
  }

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  property("covering-bucket credit equals the sequential model") =
    Prop.forAll(genEvents) { evs =>
      import spark.implicits._
      val df = evs
        .map(e => (e.id, new Timestamp(base + e.offsetSec * 1000L), e.user, e.typ))
        .toDF("event_id", "ts", "user_id", "event_type")
      val got = EventOps.attributionOf(df)
        .select("campaign", "n_touches", "n_purchases", "credit_ppm")
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = model(evs)
      if (got != want)
        println(s"MISMATCH\n got=$got\n want=$want\n evs=$evs")
      got == want
    }
}
