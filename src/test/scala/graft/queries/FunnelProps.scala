package graft.queries

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Executable specification of [[EventOps.funnelOf]]: on random event
  * streams, the distributed in-array fold must agree with a sequential
  * per-user state machine over the same (ts, event_id) order —
  * including strictly-after transitions and same-timestamp ties.
  */
object FunnelProps extends Properties("EventOps.funnel") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark

  private val types = Seq("view", "click", "purchase", "error")

  private val genEvents: Gen[List[(Long, Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.chooseNum(0L, 5L)
      minute <- Gen.chooseNum(0L, 30L)
      tpe <- Gen.oneOf(types)
    } yield (user, minute, tpe)).map(_.zipWithIndex.map {
      case ((u, m, t), i) => (i.toLong, m, u, t)
    })

  private def seqStage(evs: Seq[(Long, Long, String)]): Long = {
    // (event_id, minute, type) sorted by (minute, event_id) — the same
    // order the Spark side's struct sort yields (event_id is unique).
    var stage = 0L
    var last = -1L
    evs.sortBy(e => (e._2, e._1)).foreach { case (_, m, t) =>
      if (stage == 0 && t == "view") { stage = 1; last = m }
      else if (stage == 1 && t == "click" && m > last) { stage = 2; last = m }
      else if (stage == 2 && t == "purchase" && m > last) { stage = 3; last = m }
    }
    stage
  }

  property("agrees with a sequential per-user state machine") =
    Prop.forAllNoShrink(genEvents) { events =>
      import spark.implicits._
      val df = events.map { case (id, m, u, t) =>
        (id, new Timestamp(3600000L + m * 60000L), u, t)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val got = EventOps.funnelOf(df)
        .as[(Long, Long)].collect().toMap
      val expected = events.groupBy(_._3).values
        .map(evs => seqStage(evs.map(e => (e._1, e._2, e._4))))
        .groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      got == expected
    }
}
