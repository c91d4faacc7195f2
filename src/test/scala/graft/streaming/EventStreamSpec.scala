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

  test("native session_window agrees with the custom sessionizer on a golden log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.sessionizeNative(in.toDF(), gapMinutes = 30, watermark = "30 minutes")
      .writeStream.format("memory").queryName("native_sessions").outputMode("append")
      .start()
    try {
      // Same event log as the flatMapGroupsWithState test: user 7 has a
      // two-event session then a singleton; user 8's events only advance
      // the watermark.
      in.addData(Ev(1, ts("10:00"), 7, "click"), Ev(2, ts("10:10"), 7, "view"))
      q.processAllAvailable()
      in.addData(Ev(3, ts("12:00"), 7, "click"))
      q.processAllAvailable()
      in.addData(Ev(4, ts("13:30"), 8, "click"))
      q.processAllAvailable()
      in.addData(Ev(5, ts("13:40"), 8, "view"))
      q.processAllAvailable()
      val u7 = spark.table("native_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 == 7L)
        .map { case (_, s, e, n) => (s.toString, e.toString, n) }.toSet
      // session_window's end is last-event + gap by definition; start and
      // event counts must match the custom sessionizer's boundaries.
      assert(u7 === Set(
        ("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L),
        ("2024-01-01 12:00:00.0", "2024-01-01 12:30:00.0", 1L)))
    } finally q.stop()
  }

  test("session_window merges one session ACROSS micro-batches in state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.sessionizeNative(in.toDF(), gapMinutes = 10, watermark = "0 seconds")
      .writeStream.format("memory").queryName("xbatch_sessions").outputMode("append")
      .start()
    try {
      // Batch 1 leaves user 7's session OPEN in the session store;
      // batch 2 extends it within the gap — the stream_sessionwin
      // cross-batch arm, isolated: the two events must come back as ONE
      // merged session (10:00 → 10:05 + gap), not two.
      in.addData(Ev(1, ts("10:00"), 7, "click"))
      q.processAllAvailable()
      in.addData(Ev(2, ts("10:05"), 7, "view"))
      q.processAllAvailable()
      in.addData(Ev(3, ts("12:00"), 8, "click"))
      q.processAllAvailable()
      val got = spark.table("xbatch_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map { case (u, s, e, n) => (u, s.toString, e.toString, n) }.toSet
      assert(got === Set(
        (7L, "2024-01-01 10:00:00.0", "2024-01-01 10:15:00.0", 2L)))
    } finally q.stop()
  }

  test("zero-delay session_window emits exactly the sessions ended by the last event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    // The stream_sessionwin configuration: gap 10 min, ZERO watermark
    // delay — the final watermark is the global max event time, so the
    // emitted set is exactly "sessions whose end (last + gap) is at or
    // before it" (the oracle's cut), and the tail session stays in
    // state unemitted.
    val q = EventStream.sessionizeNative(in.toDF(), gapMinutes = 10, watermark = "0 seconds")
      .writeStream.format("memory").queryName("zerodelay_sessions").outputMode("append")
      .start()
    try {
      in.addData(Ev(1, ts("10:00"), 7, "click"), Ev(2, ts("10:05"), 7, "view"))
      q.processAllAvailable()
      // 12:00 advances the watermark past 10:15 (user 7's session end);
      // user 8's own session (end 12:10) is the withheld tail.
      in.addData(Ev(3, ts("12:00"), 8, "click"))
      q.processAllAvailable()
      val got = spark.table("zerodelay_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map { case (u, s, e, n) => (u, s.toString, e.toString, n) }.toSet
      assert(got === Set(
        (7L, "2024-01-01 10:00:00.0", "2024-01-01 10:15:00.0", 2L)))
    } finally q.stop()
  }

  test("golden: fixed event log yields exactly the expected closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.hourlyCounts(in.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("golden_hourly").outputMode("append")
      .start()
    try {
      in.addData(
        Ev(1, ts("10:05"), 1, "click"),
        Ev(2, ts("10:15"), 1, "view"),
        Ev(3, ts("10:45"), 2, "click"))
      q.processAllAvailable()
      in.addData(Ev(4, ts("12:00"), 3, "click"))
      q.processAllAvailable()
      in.addData(Ev(5, ts("13:30"), 3, "view"))
      q.processAllAvailable()
      def h(hh: Int): Long = Timestamp.valueOf(f"2024-01-01 $hh%02d:00:00").getTime / 1000
      // The complete output across the run — closed hour-10 windows after
      // the 12:00 event (watermark 11:30), closed hour-12 after 13:30
      // (watermark 13:00); hour-13 stays open and must NOT appear.
      assert(spark.table("golden_hourly").as[(Long, String, Long)].collect().toSet ===
        Set((h(10), "click", 2L), (h(10), "view", 1L), (h(12), "click", 1L)))
    } finally q.stop()
  }

  test("idempotent batch sink: replaying a batch does not duplicate output") {
    import spark.implicits._
    val root = graft.Scratch.dir("batchsink_spec")
    val b0 = Seq((1L, "click", 3L), (2L, "view", 1L)).toDF("w", "event_type", "cnt")
    val b1 = Seq((3L, "click", 5L)).toDF("w", "event_type", "cnt")
    EventStream.writeBatch(b0, 0L, root)
    EventStream.writeBatch(b1, 1L, root)
    // at-least-once delivery: batch 1 is retried after a simulated
    // sink failure — dynamic overwrite must replace, not append
    EventStream.writeBatch(b1, 1L, root)
    val got = spark.read.parquet(root)
      .select("batch_id", "w", "event_type", "cnt")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got === Set(
      (0L, 1L, "click", 3L), (0L, 2L, "view", 1L), (1L, 3L, "click", 5L)))
  }

  test("golden: the idempotent hourly sink lands exactly the closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = graft.Scratch.dir("hourlysink_spec")
    val in = MemoryStream[Ev]
    val q = EventStream.idempotentHourlySink(
      in.toDF(), s"$root/out", s"$root/ckpt", watermark = "30 minutes").start()
    try {
      in.addData(
        Ev(1, ts("10:05"), 1, "click"),
        Ev(2, ts("10:15"), 1, "view"),
        Ev(3, ts("10:45"), 2, "click"))
      q.processAllAvailable()
      in.addData(Ev(4, ts("12:00"), 3, "click"))
      q.processAllAvailable()
      in.addData(Ev(5, ts("13:30"), 3, "view"))
      q.processAllAvailable()
      def h(hh: Int): Long = Timestamp.valueOf(f"2024-01-01 $hh%02d:00:00").getTime / 1000
      // Same closed-window contract as the memory-sink golden test, but
      // read back from the parquet the foreachBatch sink wrote.
      val got = spark.read.parquet(s"$root/out")
        .select("hour_start", "event_type", "cnt")
        .as[(Long, String, Long)].collect().toSet
      assert(got === Set((h(10), "click", 2L), (h(10), "view", 1L), (h(12), "click", 1L)))
    } finally q.stop()
  }

  test("golden: fixed event log yields exactly the expected sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.sessionize(in.toDS(), gapMinutes = 30, watermark = "30 minutes")
      .writeStream.format("memory").queryName("golden_sessions").outputMode("append")
      .start()
    try {
      // Two users session in parallel; later events close both inline.
      in.addData(
        Ev(1, ts("10:00"), 1, "click"),
        Ev(2, ts("10:10"), 1, "view"),
        Ev(3, ts("10:20"), 1, "click"),
        Ev(4, ts("10:05"), 2, "click"))
      q.processAllAvailable()
      in.addData(Ev(5, ts("11:30"), 1, "click"), Ev(6, ts("11:00"), 2, "view"))
      q.processAllAvailable()
      // A third user advances the watermark to 13:30, then one more
      // batch fires the event-time timeouts for users 1 and 2.
      in.addData(Ev(7, ts("14:00"), 3, "click"))
      q.processAllAvailable()
      in.addData(Ev(8, ts("14:05"), 3, "view"))
      q.processAllAvailable()
      val got = spark.table("golden_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map { case (u, s, e, n) => (u, s.toString, e.toString, n) }.toSet
      // The complete session set: user 3's 14:00 session is still open
      // and must NOT appear.
      assert(got === Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0", 3L),
        (2L, "2024-01-01 10:05:00.0", "2024-01-01 10:05:00.0", 1L),
        (1L, "2024-01-01 11:30:00.0", "2024-01-01 11:30:00.0", 1L),
        (2L, "2024-01-01 11:00:00.0", "2024-01-01 11:00:00.0", 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.dedupEvents(in.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("deduped").outputMode("append")
      .start()
    try {
      in.addData(Ev(1, ts("10:00"), 7, "click"), Ev(2, ts("10:05"), 7, "view"))
      q.processAllAvailable()
      // The source replays event 1 (at-least-once delivery) and adds a
      // fresh event in the same batch.
      in.addData(Ev(1, ts("10:00"), 7, "click"), Ev(3, ts("10:10"), 8, "click"))
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L), "replayed id 1 must appear exactly once")
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

  test("stream-stream interval join attributes clicks within the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = EventStream
      .attributeClicks(views.toDF(), clicks.toDF(), horizonMinutes = 10)
      .writeStream.format("memory").queryName("attributed").outputMode("append")
      .start()
    try {
      views.addData(Ev(100, ts("10:00"), 1, "view"), Ev(101, ts("10:00"), 2, "view"))
      clicks.addData(
        Ev(200, ts("10:05"), 1, "click"), // same user, inside horizon → match
        Ev(201, ts("10:20"), 1, "click"), // same user, past horizon → no match
        Ev(202, ts("10:05"), 3, "click")) // different user → no match
      q.processAllAvailable()
      // advance both watermarks so buffered state flushes deterministically
      views.addData(Ev(102, ts("12:00"), 9, "view"))
      clicks.addData(Ev(203, ts("12:00"), 9, "click"))
      q.processAllAvailable()
      val got = spark.table("attributed")
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 100L, 200L), (9L, 102L, 203L)))
    } finally q.stop()
  }

  test("left-outer interval join: null emission exactly at the strict eviction boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = EventStream.attributeClicks(views.toDF(), clicks.toDF(),
        horizonMinutes = 10, watermark = "30 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("outer_join").outputMode("append")
      .start()
    def unmatched(): Set[Long] = spark.table("outer_join")
      .filter("click_id IS NULL").select("view_id").as[Long].collect().toSet
    try {
      // view 100 never gets a click; its horizon closes at 10:10.
      views.addData(Ev(100, ts("10:00"), 1, "view"))
      clicks.addData(Ev(200, ts("10:00"), 99, "click"))
      q.processAllAvailable()
      assert(unmatched() === Set.empty, "watermark still below the horizon close")
      // Advance BOTH legs so the min watermark is exactly 10:10 —
      // equal to view 100's horizon close. Spark's eviction is
      // STRICT (<): the view must still be buffered, not emitted.
      views.addData(Ev(101, ts("10:40"), 9, "view"))
      clicks.addData(Ev(201, ts("10:40"), 9, "click"))
      q.processAllAvailable()
      assert(unmatched() === Set.empty,
        "a view whose horizon ends exactly AT the watermark is still buffered")
      // One millisecond past the boundary: evicted and emitted null-padded.
      val t = new Timestamp(ts("10:40").getTime + 1)
      views.addData(Ev(102, t, 8, "view"))
      clicks.addData(Ev(202, t, 8, "click"))
      q.processAllAvailable()
      assert(unmatched() === Set(100L),
        "1 ms past the boundary the unmatched view must flush")
      // In-horizon tails at end-of-stream stay correctly unemitted
      // (views 101/102 matched; the new pair matches immediately too).
      views.addData(Ev(103, ts("15:00"), 7, "view"))
      clicks.addData(Ev(203, ts("15:00"), 7, "click"))
      q.processAllAvailable()
      assert(unmatched() === Set(100L))
      val matchedIds = spark.table("outer_join")
        .filter("click_id IS NOT NULL").select("view_id").as[Long].collect().toSet
      assert(matchedIds === Set(101L, 102L, 103L))
    } finally q.stop()
  }

  test("golden: stream-static enrichment joins the dim and closes windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Ev]
    val q = EventStream.enrichedHourlyCounts(in.toDF(), users, watermark = "30 minutes")
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .start()
    try {
      in.addData(
        Ev(1, ts("10:05"), 1, "click"),
        Ev(2, ts("10:10"), 1, "view"),
        Ev(3, ts("10:20"), 2, "click"),
        // user 5 has no dim row → the left join must keep it as "unknown"
        Ev(4, ts("10:25"), 5, "click"))
      q.processAllAvailable()
      in.addData(Ev(5, ts("12:00"), 2, "view"))
      q.processAllAvailable()
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      assert(spark.table("enriched").as[(Long, String, Long)].collect().toSet ===
        Set((h10, "gold", 2L), (h10, "basic", 1L), (h10, "unknown", 1L)))
    } finally q.stop()
  }

  test("golden: streaming funnel fires once per completed journey, resets after") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel_stream").outputMode("append")
      .start()
    try {
      // user 1 mid-funnel, user 2 wrong order (click before view counts
      // nothing), user 3 simultaneous click (not strictly later — no
      // advance).
      in.addData(
        Ev(1, ts("10:00"), 1, "view"),
        Ev(2, ts("10:05"), 1, "click"),
        Ev(3, ts("10:01"), 2, "click"),
        Ev(4, ts("10:02"), 2, "view"),
        Ev(5, ts("10:03"), 3, "view"),
        Ev(6, ts("10:03"), 3, "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").count() === 0)
      // user 1 completes across batches; then converts a SECOND time.
      in.addData(
        Ev(7, ts("10:10"), 1, "purchase"),
        Ev(8, ts("10:20"), 1, "view"),
        Ev(9, ts("10:25"), 1, "click"),
        Ev(10, ts("10:30"), 1, "purchase"),
        Ev(11, ts("10:06"), 2, "click"))
      q.processAllAvailable()
      val got = spark.table("funnel_stream")
        .as[(Long, Timestamp, Timestamp)].collect()
        .map { case (u, s, c) => (u, s.toString, c.toString) }.toSet
      assert(got === Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0"),
        (1L, "2024-01-01 10:20:00.0", "2024-01-01 10:30:00.0")))
      // user 2 (view@10:02 → click@10:06) is mid-funnel, not emitted.
    } finally q.stop()
  }

  test("restart from checkpoint resumes aggregation state, no loss or duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The memory sink cannot recover from a checkpoint; the idempotent
    // foreachBatch parquet sink is the production path and CAN — so the
    // restart drill runs through it end to end.
    val ckpt = graft.Scratch.dir("ckpt_restart_hourly")
    val out = graft.Scratch.dir("restart_hourly_out")
    val in = MemoryStream[Ev]
    def start() =
      EventStream.idempotentHourlySink(in.toDF(), out, ckpt,
        watermark = "30 minutes").start()

    val q1 = start()
    try {
      in.addData(
        Ev(1, ts("10:05"), 1, "click"),
        Ev(2, ts("10:40"), 2, "click"),
        Ev(3, ts("11:10"), 1, "view"))
      q1.processAllAvailable()
    } finally q1.stop()

    // New query, same checkpoint: committed offsets skip the consumed
    // batch; the hour-10 partial counts and the watermark live in the
    // STATE STORE and must survive the restart.
    val q2 = start()
    try {
      in.addData(Ev(4, ts("12:00"), 2, "view"))
      q2.processAllAvailable()
      val closed = spark.read.parquet(out)
        .select("hour_start", "event_type", "cnt")
        .as[(Long, String, Long)].collect().toSet
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      assert(closed === Set((h10, "click", 2L)),
        "pre-restart counts must close exactly once after the restart")
    } finally q2.stop()
  }

  test("restart from checkpoint resumes flatMapGroupsWithState user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // scd2Stream through a foreachBatch parquet sink (recoverable,
    // unlike the memory sink): the OPEN interval lives in the custom
    // per-user state and must survive the restart to close correctly.
    val ckpt = graft.Scratch.dir("ckpt_restart_scd2")
    val out = graft.Scratch.dir("restart_scd2_out")
    val in = MemoryStream[Ev]
    def start() = EventStream.scd2Stream(in.toDS()).toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        EventStream.writeBatch(batch.toDF(), id, out))
      .start()

    val q1 = start()
    try {
      in.addData(Ev(1, ts("10:00"), 1, "view"))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      in.addData(Ev(2, ts("10:30"), 1, "click"))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select("user_id", "state", "valid_from", "valid_to")
        .as[(Long, String, Timestamp, Timestamp)].collect().toSeq
      assert(rows.map(r => (r._1, r._2, r._3.toString, r._4.toString)) ===
        Seq((1L, "view", "2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0")),
        "the open interval must survive the restart and close exactly once")
    } finally q2.stop()
  }

  test("funnel and SCD2 state machines advance on sub-millisecond separations") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def us(base: String, micros: Int): Timestamp = {
      val t = Timestamp.valueOf(s"2024-01-01 $base:00")
      t.setNanos(micros * 1000)
      t
    }
    // view/click/purchase inside ONE millisecond: at ms precision the
    // strict > would reject every advance; at µs they are ordered.
    val in = MemoryStream[Ev]
    val q = EventStream.funnelStream(in.toDS())
      .writeStream.format("memory").queryName("funnel_us").outputMode("append")
      .start()
    try {
      in.addData(
        Ev(1, us("10:00", 100), 1, "view"),
        Ev(2, us("10:00", 500), 1, "click"),
        Ev(3, us("10:00", 900), 1, "purchase"))
      q.processAllAvailable()
      val hits = spark.table("funnel_us")
        .as[(Long, Timestamp, Timestamp)].collect()
      assert(hits.length === 1, "sub-ms-separated stages must advance")
      // Emitted timestamps keep their microseconds.
      assert(hits.head._2.getNanos === 100000 && hits.head._3.getNanos === 900000)
    } finally q.stop()

    val in2 = MemoryStream[Ev]
    val q2 = EventStream.scd2Stream(in2.toDS())
      .writeStream.format("memory").queryName("scd2_us").outputMode("append")
      .start()
    try {
      in2.addData(
        Ev(1, us("10:00", 100), 1, "view"),
        Ev(2, us("10:00", 900), 1, "click"))
      q2.processAllAvailable()
      val rows = spark.table("scd2_us")
        .as[(Long, String, Timestamp, Timestamp)].collect()
      assert(rows.length === 1)
      val (_, state, f, t) = rows.head
      assert(state === "view" && f.getNanos === 100000 && t.getNanos === 900000,
        "closed interval must carry the µs the batch rows do")
    } finally q2.stop()
  }

  test("golden: streaming SCD2 emits the batch form's closed intervals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val log = Seq(
      Ev(1, ts("10:00"), 1, "view"),
      Ev(2, ts("10:10"), 1, "view"),   // same state — interval continues
      Ev(3, ts("10:20"), 1, "click"),  // closes view@10:00
      Ev(4, ts("10:05"), 2, "view"),
      Ev(5, ts("11:00"), 1, "view"),   // closes click@10:20 (next batch)
      Ev(6, ts("11:30"), 2, "purchase")) // closes view@10:05 (next batch)
    val in = MemoryStream[Ev]
    val q = EventStream.scd2Stream(in.toDS())
      .writeStream.format("memory").queryName("scd2_stream").outputMode("append")
      .start()
    try {
      in.addData(log.take(4): _*)
      q.processAllAvailable()
      in.addData(log.drop(4): _*)
      q.processAllAvailable()
      val got = spark.table("scd2_stream")
        .as[(Long, String, Timestamp, Timestamp)].collect()
        .map { case (u, s, f, t) => (u, s, f.toString, t.toString) }.toSet
      // Exactly the CLOSED intervals the batch scd2 build derives from
      // the same log; the open view@11:00 / purchase@11:30 intervals
      // stay in state and must not appear.
      assert(got === Set(
        (1L, "view", "2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0"),
        (1L, "click", "2024-01-01 10:20:00.0", "2024-01-01 11:00:00.0"),
        (2L, "view", "2024-01-01 10:05:00.0", "2024-01-01 11:30:00.0")))
      // Cross-check against the batch builder on the identical log: the
      // streaming output must equal the batch rows with is_current = 0.
      val batch = graft.queries.EventOps.scd2Of(
          log.toDF("event_id", "ts", "user_id", "event_type"))
        .filter($"is_current" === 0L)
        .as[(Long, String, Long, Long, Long)].collect()
        .map { case (u, s, f, t, _) =>
          (u, s, new Timestamp(f / 1000).toString, new Timestamp(t / 1000).toString) }
        .toSet
      assert(got === batch)
    } finally q.stop()
  }
}
