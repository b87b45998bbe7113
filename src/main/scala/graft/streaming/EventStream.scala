package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference has no streaming (SURVEY §2.11) — its time axis is a
  * batch dimension. This module adds the streaming capabilities a
  * training-data pipeline needs on the same `events` schema: watermarked
  * windowed aggregation and custom per-key state. The transforms are
  * source-agnostic `DataFrame => DataFrame`, so the same code serves
  * `readStream` (production) and MemoryStream (tests).
  */
object EventStream {

  /** Watermarked tumbling-window counts per event type. State is bounded
    * by the watermark — late events beyond 10 minutes are dropped, so
    * state size is O(types × windows-in-flight), cluster-safe. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserSession(user_id: Long, n_events: Long, total_value: Double)

  /** Custom per-key state via mapGroupsWithState: running per-user totals
    * (KeyValueGroupedDataset path). NoTimeout keeps micro-batch scheduling
    * purely data-driven; with a processing-time timeout the engine
    * triggers batches continuously, which also breaks deterministic
    * test drains. */
  def userTotals(events: Dataset[UserEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserSession]) =>
          val prev = state.getOption.getOrElse(UserSession(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserSession(uid, n, tot)
          state.update(next)
          next
      }
  }
}
