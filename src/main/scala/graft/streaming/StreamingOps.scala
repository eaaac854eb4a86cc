package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

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

  // ---- custom state: flatMapGroupsWithState ----

  case class FunnelProgress(user_id: Long, first_view: Option[Timestamp],
      first_click: Option[Timestamp], first_purchase: Option[Timestamp]) {
    def stage: Int =
      1 + (if (first_click.isDefined) 1 else 0) + (if (first_purchase.isDefined) 1 else 0)
  }

  /** Streaming form of EventsOps.q_events_funnel: per-user ordered-sequence
    * (view → click → purchase) progress as flatMapGroupsWithState. State is
    * three optional timestamps per user — O(1), never a buffered event
    * list. Each micro-batch folds its rows in event-time order, ratcheting
    * the stage monotonically and emitting the user's progress whenever it
    * advances. With in-order delivery (or any out-of-orderness that does
    * not straddle a stage boundary) the final emission per user equals the
    * batch query exactly — StreamingSpec asserts that; an event arriving
    * late enough to rewrite an already-passed stage would need the batch
    * recompute, the standard streaming/batch funnel trade-off. */
  def funnelStages(events: Dataset[(Long, Timestamp, String)])
      : Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (user: Long, rows: Iterator[(Long, Timestamp, String)],
            state: GroupState[FunnelProgress]) => {
          val start = state.getOption.getOrElse(FunnelProgress(user, None, None, None))
          val next = rows.toSeq.sortBy(_._2.getTime).foldLeft(start) { (st, ev) =>
            val (_, ts, typ) = ev
            typ match {
              case "view" if st.first_view.isEmpty =>
                st.copy(first_view = Some(ts))
              case "click" if st.first_click.isEmpty &&
                  st.first_view.exists(v => ts.after(v)) =>
                st.copy(first_click = Some(ts))
              case "purchase" if st.first_purchase.isEmpty &&
                  st.first_click.exists(c => ts.after(c)) =>
                st.copy(first_purchase = Some(ts))
              case _ => st
            }
          }
          if (next != start) {
            state.update(next)
            Iterator.single(next)
          } else Iterator.empty
        })
  }

  case class UserRunning(user_id: Long, n_events: Long, total_value: Double,
      last_ts: Timestamp)

  /** Custom per-key state via flatMapGroupsWithState: a running per-user
    * profile (event count, value total, last seen) emitted on every
    * micro-batch update and expired after an hour idle — the arbitrary-
    * stateful-processing surface that windowed aggregation can't express
    * (cross-window running state with TTL). State per key is O(1); the
    * processing-time timeout bounds the state store exactly like a TTL'd
    * key-value table at 100 TB/day event volume. */
  def runningProfile(events: Dataset[(Long, Timestamp, Double)],
      ttl: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val useTtl = ttl == GroupStateTimeout.ProcessingTimeTimeout()
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), ttl)(
        (user: Long, rows: Iterator[(Long, Timestamp, Double)],
            state: GroupState[UserRunning]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0, new Timestamp(0L)))
            val batch = rows.toSeq
            val next = UserRunning(
              user,
              prev.n_events + batch.size,
              prev.total_value + batch.map(_._3).sum,
              batch.map(_._2).maxByOption(_.getTime).getOrElse(prev.last_ts))
            state.update(next)
            if (useTtl) state.setTimeoutDuration("1 hour")
            Iterator.single(next)
          }
        })
  }

  // ---- stream-stream and stream-static joins ----

  /** Watermarked stream-stream interval join — click-to-view attribution:
    * each click pairs with the same user's views in the preceding hour.
    * Both sides carry watermarks and the join predicate bounds event time
    * on BOTH ends, so Spark can expire buffered rows: a view older than
    * (click watermark − 1h) can never match again and is dropped from
    * state. Without the time bound the view buffer would grow forever —
    * the state-bloat failure mode of unconstrained stream joins at
    * 100 TB/day. Append-mode output: a pair is emitted once, when both
    * sides have arrived. */
  def attribution(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    c.join(v,
      expr("""c_user = v_user AND
              view_ts <= click_ts AND
              view_ts >= click_ts - INTERVAL 1 HOUR"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Stream-static enrichment: the event stream joined to a dimension
    * DataFrame. The static side re-plans per micro-batch and broadcasts
    * when small — the standard slowly-changing-dimension lookup; no state
    * store is involved at all. */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")
}
