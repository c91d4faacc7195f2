package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured Streaming rendition of the event analytics (SURVEY.md §2.3
  * streaming row — demonstrative; the reference is batch-only). The
  * transforms are source-agnostic: the same code runs on
  * `spark.readStream` file/Kafka sources in production and on a
  * MemoryStream in tests, because a streaming DataFrame is just a
  * DataFrame.
  *
  * File-source caveat (verified against the harness events table): a
  * parquet stream cannot re-infer schema per batch, so nanosecond
  * timestamps need `spark.sql.legacy.parquet.nanosAsLong=true` plus an
  * explicit `timestamp_micros(ts div 1000)` conversion before these
  * transforms — the batch-side auto-retry in `graft.Tables.events` does
  * not apply to streams — and the source path must be a directory.
  *
  * Scale posture: both operators are keyed state over the shuffle —
  * watermarking bounds the window state, and `mapGroupsWithState` keeps
  * one counter per user; state lives in the executor state store
  * (RocksDB at scale), never on the driver.
  */
object EventStream {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  case class UserCount(user_id: Long, events: Long)

  /** Hourly tumbling counts per event type with a watermark: late events
    * beyond `watermark` are dropped and closed windows are emitted
    * exactly once in append mode — the streaming twin of
    * `EventOps.hourly`.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("event_type"), col("cnt"))

  /** Running per-user event counts via mapGroupsWithState — the custom
    * stateful-operator surface (the streaming analog of the reference's
    * per-key Reduce, but incremental).
    */
  def runningUserCounts(events: Dataset[Ev]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          UserCount(uid, total)
      }
  }
}
