package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EventStream.Ev

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("watermarked hourly counts emit closed windows and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.hourlyCounts(in.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("hourly").outputMode("append")
      .start()
    try {
      in.addData(
        Ev(1, ts("10:05"), 1, "click"),
        Ev(2, ts("10:40"), 2, "click"),
        Ev(3, ts("11:10"), 1, "view"))
      q.processAllAvailable()
      // watermark = 11:10 - 30min = 10:40 < 11:00 → hour 10 not closed yet
      assert(spark.table("hourly").count() === 0)

      in.addData(Ev(4, ts("12:00"), 2, "view"))
      q.processAllAvailable()
      // watermark now 11:30 → hour-10 window closed and emitted
      val closed = spark.table("hourly")
        .as[(Long, String, Long)].collect().toSet
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      assert(closed === Set((h10, "click", 2L)))

      // a straggler behind the watermark is dropped, not re-emitted
      in.addData(Ev(5, ts("10:15"), 3, "click"))
      in.addData(Ev(6, ts("13:30"), 3, "view"))
      q.processAllAvailable()
      val after = spark.table("hourly").as[(Long, String, Long)].collect()
      assert(!after.exists { case (h, t, c) => h == h10 && t == "click" && c != 2L })
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions inline and by timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.sessionize(in.toDS(), gapMinutes = 30, watermark = "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    try {
      in.addData(Ev(1, ts("10:00"), 7, "click"), Ev(2, ts("10:10"), 7, "view"))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "open session must not emit")

      // An event past the gap closes the first session inline.
      in.addData(Ev(3, ts("12:00"), 7, "click"))
      q.processAllAvailable()

      // Advance the watermark past 12:00 + gap via another user, then
      // one more batch so the event-time timeout fires for user 7.
      in.addData(Ev(4, ts("13:30"), 8, "click"))
      q.processAllAvailable()
      in.addData(Ev(5, ts("13:40"), 8, "view"))
      q.processAllAvailable()

      val u7 = spark.table("sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 == 7L)
        .map { case (_, s, e, n) => (s.toString, e.toString, n) }.toSet
      assert(u7 === Set(
        ("2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L),
        ("2024-01-01 12:00:00.0", "2024-01-01 12:00:00.0", 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.runningUserCounts(in.toDS())
      .writeStream.format("memory").queryName("counts").outputMode("update")
      .start()
    try {
      in.addData(Ev(1, ts("10:00"), 7, "click"), Ev(2, ts("10:01"), 7, "view"))
      q.processAllAvailable()
      in.addData(Ev(3, ts("10:02"), 7, "click"), Ev(4, ts("10:03"), 8, "click"))
      q.processAllAvailable()
      val rows = spark.table("counts").as[(Long, Long)].collect()
      // update mode: latest state per key is the last emitted row
      val latest = rows.zipWithIndex.groupBy(_._1._1).map { case (k, v) =>
        k -> v.maxBy(_._2)._1._2
      }
      assert(latest === Map(7L -> 3L, 8L -> 1L))
    } finally q.stop()
  }
}
