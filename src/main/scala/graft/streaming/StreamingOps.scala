package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the event operators. The batch queries in
  * graft.ops.EventsOps define the semantics (and are what the driver
  * hash-checks); these transforms run the same logic incrementally on an
  * unbounded source: `spark.readStream... → transform → writeStream` with
  * event-time watermarks bounding state.
  *
  * At 100 TB/day these are the shapes that matter: watermark + tumbling
  * window keeps per-key state O(windows in flight); dropDuplicates with a
  * watermark bounds the dedup state the same way a TTL'd key-value store
  * would; session_window merges gap-contiguous state per user.
  */
object StreamingOps {

  /** 1-day tumbling counts/sums per event_type with a 1h late-data bound. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_val"))
      .select(col("w.start").as("day_start"), col("event_type"), col("cnt"), col("sum_val"))

  /** Gap-based sessions via the native session_window (30 min gap) — the
    * streaming equivalent of q_events_sessionize's islands-and-gaps. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start_ts"), col("w.end").as("end_ts"),
        col("n_events"))

  /** Late-arrival dedup: first occurrence per (user_id, event_id) within the
    * watermark horizon — streaming form of q_events_late_dedup. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_id")
}
