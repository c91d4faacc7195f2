package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge semantics of the as-of join construction (union + running
  * last(ignoreNulls)) that the sf-level oracle data may not cover:
  * exact-timestamp ties, purchases before any view, and equal-ts view
  * dedup. Exercised through the same windowing shape as
  * [[EventOps.asofViewBeforePurchase]] over planted rows.
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $s")

  /** The same construction as EventOps.asofViewBeforePurchase, over an
    * explicit events relation (event_id, ts, user_id, event_type).
    */
  private def asof(events: DataFrame): Map[Long, Option[Long]] = {
    val views = events.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
      .select(col("user_id"), col("ts"), col("view_id"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("view_id"),
        lit(1).as("kind"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("last_view", last("view_id", ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("last_view"))
      .as[(Long, Option[Long])].collect().toMap
  }

  test("purchase at the exact view timestamp sees that view (ASOF >=)") {
    val out = asof(Seq(
      (1L, ts("10:00:00"), 7L, "view"),
      (2L, ts("10:00:00"), 7L, "purchase")).toDF("event_id", "ts", "user_id", "event_type"))
    assert(out === Map(2L -> Some(1L)))
  }

  test("purchase before any view matches nothing") {
    val out = asof(Seq(
      (1L, ts("09:00:00"), 7L, "purchase"),
      (2L, ts("10:00:00"), 7L, "view"),
      (3L, ts("11:00:00"), 7L, "purchase")).toDF("event_id", "ts", "user_id", "event_type"))
    assert(out === Map(1L -> None, 3L -> Some(2L)))
  }

  test("multiple views at one timestamp resolve to max event_id") {
    val out = asof(Seq(
      (5L, ts("10:00:00"), 7L, "view"),
      (9L, ts("10:00:00"), 7L, "view"),
      (6L, ts("10:30:00"), 7L, "purchase")).toDF("event_id", "ts", "user_id", "event_type"))
    assert(out === Map(6L -> Some(9L)))
  }

  test("views never leak across users") {
    val out = asof(Seq(
      (1L, ts("10:00:00"), 7L, "view"),
      (2L, ts("11:00:00"), 8L, "purchase")).toDF("event_id", "ts", "user_id", "event_type"))
    assert(out === Map(2L -> None))
  }

  test("scd2 collapses duplicate states and chains validity intervals") {
    // user 1: x@10:00, x@10:05 (dup, collapsed), y@10:10, x@10:20 —
    // history (x, 10:00→10:10), (y, 10:10→10:20), (x, 10:20→open).
    val ev = Seq(
      (1L, ts("10:00:00"), 1L, "x"),
      (2L, ts("10:05:00"), 1L, "x"),
      (3L, ts("10:10:00"), 1L, "y"),
      (4L, ts("10:20:00"), 1L, "x"),
      (5L, ts("09:00:00"), 2L, "z"))
      .toDF("event_id", "ts", "user_id", "event_type")
    def us(s: String): Long = ts(s).getTime * 1000L
    val got = EventOps.scd2Of(ev)
      .as[(Long, String, Long, Option[Long], Long)].collect().toSeq
    assert(got === Seq(
      (1L, "x", us("10:00:00"), Some(us("10:10:00")), 0L),
      (1L, "y", us("10:10:00"), Some(us("10:20:00")), 0L),
      (1L, "x", us("10:20:00"), None, 1L),
      (2L, "z", us("09:00:00"), None, 1L)))
  }

  test("scd2 intervals chain gaplessly with exactly one open row per user") {
    val rows = EventOps.scd2(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Option[Long], Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, history) =>
      val h = history.sortBy(_._3)
      // valid_to of each closed row is the next row's valid_from
      h.zip(h.tail).foreach { case (cur, next) =>
        assert(cur._4.contains(next._3), s"user $user interval gap")
        assert(cur._5 === 0L, s"user $user non-final row flagged current")
        assert(cur._2 !== next._2, s"user $user consecutive dup state survived")
      }
      assert(h.last._4.isEmpty && h.last._5 === 1L,
        s"user $user must end with one open current row")
    }
  }

  test("funnel stages: ordered journey counts, out-of-order does not") {
    val events = Seq(
      // user 1: full ordered funnel → stage 3
      (1L, ts("10:00:00"), 1L, "view"),
      (2L, ts("10:05:00"), 1L, "click"),
      (3L, ts("10:10:00"), 1L, "purchase"),
      // user 2: purchase BEFORE click → stops at stage 2
      (4L, ts("10:00:00"), 2L, "view"),
      (5L, ts("10:02:00"), 2L, "purchase"),
      (6L, ts("10:05:00"), 2L, "click"),
      // user 3: view only → stage 1
      (7L, ts("10:00:00"), 3L, "view"),
      // user 4: click with no view → stage 0
      (8L, ts("10:00:00"), 4L, "click"),
      // user 5: click at the SAME ts as view — not strictly later → stage 1
      (9L, ts("10:00:00"), 5L, "view"),
      (10L, ts("10:00:00"), 5L, "click"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.funnelOf(events)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 1L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("attribution: window edges inclusive, credit splits by integer div") {
    // Purchase at 11:00, window 60 min → clicks in [10:00, 11:00].
    // c at 10:00:00 exactly on the trailing edge — IN.
    // c at 09:59:59 one second earlier — OUT.
    // c at 11:00:00 simultaneous with the purchase — IN.
    // Three in-window touches → each gets 1000000 div 3 = 333333 ppm.
    val events = Seq(
      (4L, ts("09:59:59"), 1L, "click"),   // campaign c0, out of window
      (5L, ts("10:00:00"), 1L, "click"),   // c1, edge-in
      (6L, ts("10:30:00"), 1L, "click"),   // c2
      (7L, ts("11:00:00"), 1L, "click"),   // c3, simultaneous
      (8L, ts("11:00:00"), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.attributionOf(events)
      .select("campaign", "n_touches", "n_purchases", "credit_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("c1", 1L, 1L, 333333L),
      ("c2", 1L, 1L, 333333L),
      ("c3", 1L, 1L, 333333L)))
  }

  test("attribution: clicks never cross users; purchase with no touch emits nothing") {
    val events = Seq(
      (1L, ts("10:30:00"), 1L, "click"),     // user 1's click, campaign c1
      (2L, ts("11:00:00"), 2L, "purchase"),  // user 2: no own clicks
      (3L, ts("10:40:00"), 1L, "purchase"))  // user 1: one touch, full credit
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.attributionOf(events)
      .select("campaign", "n_touches", "n_purchases", "credit_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("c1", 1L, 1L, 1000000L)))
  }

  test("attribution: one click credits every purchase it precedes in window") {
    // A single click followed by two purchases inside the hour: linear
    // attribution credits the click's campaign once per conversion.
    val events = Seq(
      (8L, ts("10:00:00"), 1L, "click"),     // campaign c0
      (2L, ts("10:20:00"), 1L, "purchase"),
      (3L, ts("10:50:00"), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.attributionOf(events)
      .select("campaign", "n_touches", "n_purchases", "credit_ppm")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("c0", 2L, 2L, 2000000L)))
  }

  test("locf carries the last reading across silent hours and flags the fills") {
    // user 15 (passes the % 15 slice): reading 12.34 at 10:00, silence
    // for two hours, reading 56.78 at 13:00. Hours 11 and 12 must carry
    // 1234 cents with carried=1; observed hours flag 0.
    val events = Seq(
      (1L, ts("10:15:00"), 15L, "view", 12.34),
      (2L, ts("13:05:00"), 15L, "view", 56.78),
      // Two readings in one hour: the later one (max ts) wins.
      (3L, ts("13:40:00"), 15L, "view", 99.99),
      // user 7: filtered out by the % 15 slice entirely.
      (4L, ts("10:00:00"), 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.locfOf(events)
      .select("user_id", "hr", "v_cents", "carried")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val h10 = ts("10:15:00").getTime / 1000 / 3600 * 3600
    assert(got === Seq(
      (15L, h10, 1234L, 0L),
      (15L, h10 + 3600, 1234L, 1L),
      (15L, h10 + 7200, 1234L, 1L),
      (15L, h10 + 10800, 9999L, 0L)))
  }

  test("zscore flags exactly the planted outlier, none among uniform values") {
    // 20 values at 10.00 and one at 1000.00: the spike is far beyond
    // 3σ; the uniform rows sit well inside. A float-threshold
    // formulation could flip rows near the boundary — the integer
    // cross-multiplied form cannot.
    val events = ((1 to 20).map(i => (i.toLong, "click", 10.00)) :+
        (21L, "click", 1000.00))
      .toDF("event_id", "event_type", "value")
    val got = EventOps.zscoreOf(events)
      .select("event_type", "n", "outliers")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("click", 21L, 1L)))
  }

  test("zscore of a constant series has zero outliers (zero variance)") {
    val events = (1 to 5).map(i => (i.toLong, "view", 7.25))
      .toDF("event_id", "event_type", "value")
    val got = EventOps.zscoreOf(events)
      .select("outliers").as[Long].collect().toSeq
    assert(got === Seq(0L))
  }

  test("gapfill densifies a planted multi-hour silence with zero rows") {
    // user 15 (passes the %15 sample): events at hours 0, 1, and 4 —
    // hours 2 and 3 must appear as explicit zeros; hour 5+ must not
    // (the span ends at the last observed hour).
    val events = Seq(
      (1L, ts("00:10:00"), 15L),
      (2L, ts("01:20:00"), 15L),
      (3L, ts("01:40:00"), 15L),
      (4L, ts("04:59:00"), 15L),
      // user 7 fails the sample predicate and must not appear at all.
      (5L, ts("00:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val base = ts("00:00:00").getTime / 1000L
    val got = EventOps.gapfillOf(events)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (15L, base, 1L), (15L, base + 3600, 2L), (15L, base + 7200, 0L),
      (15L, base + 10800, 0L), (15L, base + 14400, 1L)))
  }

  test("cdc merge covers all five outcomes with last-writer-wins op selection") {
    def t(day: String, hhmm: String) = Timestamp.valueOf(s"2024-$day $hhmm:00")
    // Snapshot side is any day < MergeSplitDay (2024-01-01 qualifies),
    // delta side any day >= it (2024-02-01). One user per outcome; user
    // 2's delta holds a purchase FOLLOWED by a view, so last-writer-wins
    // must pick the view (update), not the tombstone.
    val events = Seq(
      (1L, t("01-01", "10:00"), 1L, "click"), // kept: no delta
      (2L, t("01-01", "10:00"), 2L, "click"), // updated
      (2L, t("02-01", "10:00"), 3L, "purchase"),
      (2L, t("02-01", "11:00"), 4L, "view"),
      (3L, t("02-01", "10:00"), 5L, "view"),  // inserted: no snapshot
      (4L, t("01-01", "10:00"), 6L, "click"), // deleted: delta ends in purchase
      (4L, t("02-01", "10:00"), 7L, "purchase"),
      (5L, t("02-01", "10:00"), 8L, "purchase")) // noop: delete of absent key
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.cdcMergeOf(events)
      .as[(String, Long)].collect().toMap
    assert(got === Map("kept" -> 1L, "updated" -> 1L, "inserted" -> 1L,
      "deleted" -> 1L, "noop" -> 1L))
  }

  test("session_window boundary matches the island form: exactly-gap merges, past-gap splits") {
    // session_window merges when new.start <= current session end, so an
    // event exactly gap after its predecessor stays in the session —
    // identical to events_sessions' strict `> gap` split test. This is
    // what licenses the two queries sharing one oracle.
    val df = Seq(
      (1L, ts("10:00:00")),
      (1L, ts("10:10:00")),        // exactly 10 min later → merges
      (1L, ts("10:15:00")),        // 5 min later → merges
      (2L, ts("10:00:00")),
      (2L, ts("10:10:00.000001"))  // 1 µs past the gap → new session
    ).toDF("user_id", "ts")
    val got = df
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select("user_id", "cnt").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 3L), (2L, 1L), (2L, 1L)))
  }

  test("scd2 lookup attributes every purchase to exactly one prior state") {
    val dir = "/root/testdata/sf0.001"
    val rows = EventOps.scd2Lookup(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // Validity intervals partition each user's timeline, so the left
    // join is match-unique and the attribution must cover every
    // purchase exactly once.
    val purchases = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum === purchases)
    val types = graft.Tables.events(spark, dir)
      .select("event_type").distinct().as[String].collect().toSet + "none"
    rows.foreach { case (s, c) =>
      assert(types.contains(s), s"unknown prior state $s")
      assert(c > 0L)
    }
  }

  test("variant path agrees with the json-string path and audits absent fields") {
    val dir = "/root/testdata/sf0.001"
    val js = EventOps.jsonProps(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val vr = EventOps.variantProps(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(vr.nonEmpty)
    vr.foreach { case (t, cnt, kSum, kMin, kMax, missingTag) =>
      assert(js(t) === ((kSum, cnt)), s"variant k_sum/cnt must equal json path for $t")
      assert(kMin <= kMax)
      assert(missingTag === cnt, "fixture payloads carry no $.tag field")
    }
  }

  test("transition matrix rows normalize to ~1e6 ppm and count every adjacency") {
    val dir = "/root/testdata/sf0.001"
    val rows = EventOps.transitions(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // Per from_type, the conditional ppm sum is 1e6 minus floor loss.
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val s = ts.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - ts.length,
        s"$from row ppm sum $s")
    }
    // Total transitions = total events minus one per active user.
    val ev = graft.Tables.events(spark, dir)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === want)
  }

  test("trajectory search ranks the behavioral near-dup above the unrelated user") {
    val tmp = graft.Scratch.dir("trajectory_events")
    // User 1 (most events → query user) walks a distinctive 8-step
    // funnel; user 2 walks the same funnel with one extra step; user 3
    // does something entirely different.
    val funnel = Seq("view", "search", "view", "cart", "view", "pay", "ship", "rate")
    def row(id: Long, user: Long, i: Int, t: String) =
      (id, ts(f"10:${i}%02d:00"), user, t, 1.0, "{}")
    val rows =
      funnel.zipWithIndex.map { case (t, i) => row(100 + i, 1L, i, t) } ++
        Seq(row(50L, 1L, 40, "idle")) ++ // the extra event making user 1 most active
        ("search" +: funnel).zipWithIndex.map { case (t, i) => row(200 + i, 2L, i, t) } ++
        Seq("login", "logout", "login", "logout", "login").zipWithIndex
          .map { case (t, i) => row(300 + i, 3L, i, t) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")
    val out = EventOps.trajectorySimilarity(spark, tmp)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).contains(2L), "the shared-funnel user must surface")
    assert(!out.map(_._1).contains(1L), "the query user never matches itself")
    assert(!out.map(_._1).contains(3L),
      "the unrelated user shares no 3-gram and must not appear")
    val (_, inter, jppm) = out.find(_._1 == 2L).get
    // User 1 has 6 distinct funnel 3-grams + none from the idle gap;
    // user 2's shifted funnel shares all 6 of them.
    assert(inter === 6L)
    assert(jppm > 500000L, s"near-identical trajectories score high, got $jppm")
  }

  test("ohlc buckets are internally consistent and agree with hourly counts") {
    val dir = "/root/testdata/sf0.001"
    val rows = EventOps.ohlc(spark, dir)
      .as[(Long, String, Double, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, open, high, low, close, cnt) =>
      assert(low <= high && cnt >= 1L)
      assert(low <= open && open <= high, "open inside the extremes")
      assert(low <= close && close <= high, "close inside the extremes")
      if (cnt == 1L) assert(open == close && open == high && high == low,
        "a single-event bucket collapses to one value")
    }
    // Same bucketing as events_hourly: identical (bucket, type, cnt) sets.
    val hourly = EventOps.hourly(spark, dir)
      .select("hour_start", "event_type", "cnt")
      .as[(Long, String, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2, r._7)).toSet === hourly)
  }
}
