package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Streaming-semantics operators expressed in batch over the `events` table:
  * tumbling/sliding windows, gap sessionization, and late-arrival dedup.
  * The same transforms run verbatim under Structured Streaming (`readStream`
  * + watermark); graft.streaming.StreamingOps wires that path and the tests
  * exercise it on a MemoryStream. Timestamps are handled in microseconds
  * (unix_micros / epoch_us) so Spark and DuckDB agree exactly.
  */
object EventsOps {

  /** 1-day tumbling window via `window()` — the Structured Streaming
    * grouping primitive — projected to a DATE key for the oracle. */
  def q_events_tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_val"))
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("cnt"), col("sum_val"))
      .orderBy("day", "event_type")

  /** 1h window sliding every 30min — each event lands in exactly two
    * windows (duplicate-assignment semantics). Oracle-checked: the DuckDB
    * mirror materializes both window memberships per event via UNION ALL
    * of the event's 30-min bucket and the bucket 30 min earlier. */
  def q_events_sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("win_start"), col("cnt"))
      .orderBy("win_start")
      .limit(3000)

  /** Gap-based sessionization (30 min), the islands-and-gaps form of
    * `session_window`: lag → is_new flag → running sum = session id. */
  def q_events_sessionize(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val us = unix_micros(col("ts").cast("timestamp"))
    val gapUs = 1800L * 1000000L
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(lag(us, 1).over(w).isNull || (us - lag(us, 1).over(w)) > gapUs, 1)
          .otherwise(0).as("is_new"))
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        (max(unix_micros(col("ts").cast("timestamp"))) -
          min(unix_micros(col("ts").cast("timestamp")))).as("dur_us"))
      .orderBy("user_id", "session_id")
      .limit(5000)
  }

  /** Ordered-sequence (funnel) detection: per user, the earliest
    * view → first click strictly after it → first purchase strictly after
    * that — the MATCH_RECOGNIZE / CEP pattern expressed as three chained
    * conditional-min aggregations. `stage` = how far the user got (0-3).
    *
    * Scale: three user-keyed groupBys + two user-keyed joins — all ride ONE
    * hash partitioning on user_id (Exchange reuse keeps it to a single
    * shuffle of the events scan per pass); no window-over-everything, no
    * per-user arrays. At 100 TB this is the standard funnel shape: shuffle
    * by user once, conditional mins are partial-agg friendly. */
  def q_events_funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("first_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .filter(col("ts") > col("first_view"))
      .groupBy("user_id").agg(min(col("ts")).as("first_click"))
    val buys = ev.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("ts") > col("first_click"))
      .groupBy("user_id").agg(min(col("ts")).as("first_purchase"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(buys, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view"), col("first_click"), col("first_purchase"),
        (lit(1) + when(col("first_click").isNotNull, 1).otherwise(0)
          + when(col("first_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy("user_id")
      .limit(5000)
  }

  /** Watermark-dedup analog: first row per (user_id, event_id) by ts. */
  def q_events_late_dedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_id")
      .orderBy(col("ts").asc, col("event_type").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "ts", "event_type")
      .orderBy("user_id", "event_id")
      .limit(2000)
  }

  /** Cohort retention — the product-analytics staple: users are cohorted
    * by their first-seen day, and each (cohort_day, day_offset) cell
    * counts the distinct users from that cohort active offset days later.
    *
    * Scale stance: first-seen is a groupBy(user) min — partial-agg
    * friendly; the join back to events is keyed on user_id (co-partitioned
    * with the event stream's natural key); the cell agg shuffles only
    * (cohort_day, offset, user) distinct triples, already collapsed
    * map-side. No windows, nothing global; a 100 TB event log distributes
    * on user_id end-to-end. */
  def q_events_retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Activity streaks — the gaps-and-islands pattern: per user, consecutive
    * active days collapse to one island via the `day − row_number` anchor
    * (constant within a run of consecutive dates, distinct across runs).
    * Reported per user: longest streak, number of distinct streaks, total
    * active days — all order-insensitive aggregates, so no tiebreak rules
    * are needed for determinism.
    *
    * Scale stance: the window partitions by user_id (never global), over
    * the DISTINCT (user, day) relation — at most ~365 rows per user-year
    * regardless of event volume, collapsed map-side by the distinct. Both
    * groupBys ride the same user_id hash partitioning. */
  def q_events_streak(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("day").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy("user_id")
  }

  /** DAU / WAU / stickiness — the product-analytics vital signs: per day,
    * the distinct active users that day, the distinct users active in the
    * trailing 7 days, and their ratio. The trailing window is built by
    * CONTRIBUTION, not by a range scan: each active (user, day) fans out
    * to the 7 anchor days it counts toward (a bounded 7× explode), and
    * WAU is then one distinct-count per anchor — the formulation that
    * sidesteps COUNT(DISTINCT) OVER RANGE, which SQL engines don't
    * support and a self-join would quadratically re-derive.
    *
    * Scale stance: everything runs on the distinct (user, day) relation
    * (collapsed map-side from the raw event volume); the 7× fan-out is a
    * constant; both counts are partial-agg shuffles keyed by day. */
  def q_events_dau_wau(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val dau = days.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    val wau = days
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("off"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  /** Daily OHLC bars per event type — first/last/extreme values, the
    * time-series summarization every metrics store runs. First/last are
    * picked by a (ts, event_id)-ordered struct min/max — deterministic
    * under duplicate timestamps — and the volume sum goes through DECIMAL
    * so both engines add exactly.
    *
    * Scale stance: one groupBy(day, type) with map-side partial min/max
    * of tiny structs; no windows, no sorts before the final bounded
    * ORDER BY. */
  def q_events_ohlc(s: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    Tables.events(s, d)
      .select(col("ts").cast("date").as("day"), col("event_type"),
        struct(us.as("us"), col("event_id"), col("value")).as("k"),
        col("value"))
      .groupBy("day", "event_type")
      .agg(
        min(col("k")).getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(col("k")).getField("value").as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("day", "event_type")
  }

  /** Event-type transition matrix — the user-journey Markov model: for
    * each (prev_type → next_type) pair, how many transitions occur across
    * all per-user event sequences, and the row-normalized transition
    * probability. The lag window orders by (ts, event_id) so duplicate
    * timestamps are deterministic.
    *
    * Scale stance: the window partitions by user_id (bounded per-user
    * sequences, never global); the transition agg collapses to at most
    * |types|² rows map-side; the row-normalizing window runs over that
    * tiny matrix. */
  def q_events_transition(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val wRow = Window.partitionBy("prev_type")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(wRow), 6).as("p"))
      .orderBy("prev_type", "next_type")
  }

  /** Top 3-step event-type paths — the product-analytics "common journeys"
    * query (the k=3 generalization of [[q_events_transition]]'s Markov
    * edges): consecutive per-user event-type triples, counted globally,
    * top 20 by (count desc, path asc — the rounded-tie rule).
    *
    * Scale stance: the triple extraction is one user-partitioned window
    * (millions of small per-user sorts distribute; never unpartitioned);
    * the count is a partial-agg groupBy over a key space bounded by
    * |event types|³, not by events; top-20 is a distributed TakeOrdered,
    * not a global sort. */
  def q_events_top_paths(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"),
        lag(col("event_type"), 2).over(w).as("e1"),
        lag(col("event_type"), 1).over(w).as("e2"),
        col("event_type").as("e3"))
      // All three legs null-filtered (oracle filters identically): with
      // concat_ws a NULL event_type would yield 'a>b' in Spark while the
      // oracle's e1||'>'||e2||'>'||e3 yields NULL — the engines must agree
      // by construction, not by the synthetic data happening to be non-null.
      .filter(col("e1").isNotNull && col("e2").isNotNull && col("e3").isNotNull)
      .select(concat(col("e1"), lit(">"), col("e2"), lit(">"), col("e3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** Batch LAST-TOUCH attribution — the marketing-analytics staple the
    * streaming interval join ([[graft.streaming.StreamingOps.attribution]])
    * doesn't answer: each 'purchase' attributes to the SAME user's most
    * recent PRIOR 'click' or 'view' within 7 days (ordering (ts, event_id)
    * — the full deterministic order both engines share), rolled up per
    * attributed touch type with exact purchase counts and the mean
    * touch-to-purchase gap. Gaps ride the unix_micros/epoch_us convention,
    * and the mean is an exact INTEGER floor-average (sum div count over
    * exact micro sums): at gap magnitudes ~1e11 µs a double's ulp exceeds
    * the 1e-6 rounding grid, so round(avg(double), 6) is NOT cross-engine
    * stable there — integer division is (found by the sf0.01 oracle).
    *
    * Scale stance: ONE user-partitioned window pass (running last over
    * touch rows — no self-join, no interval pair explosion, the reason
    * last-touch is THE batch shape at 100 TB) into a bounded-key groupBy
    * (|touch types| + 1 rows). */
  def q_events_attribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    val us = unix_micros(col("ts").cast("timestamp"))
    val winUs = 7L * 86400L * 1000000L
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("lt_us", last(when(isTouch, us), ignoreNulls = true).over(w))
      .withColumn("lt_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("gap_us", us - col("lt_us"))
      .withColumn("attr_type",
        when(col("lt_us").isNull || col("gap_us") > winUs, lit("none"))
          .otherwise(col("lt_type")))
      .groupBy("attr_type")
      // sum in DECIMAL(38,0) (the q_events_anomaly exact-decimal
      // convention): the oracle sums in HUGEINT, and a BIGINT sum of
      // ~6e11-µs gaps can overflow at very large purchase counts where
      // the oracle stays exact; `div` on DECIMAL yields BIGINT like //
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attr_type") =!= "none",
          col("gap_us").cast("decimal(38,0)"))).as("sg"))
      .select(col("attr_type"), col("n_purchases"),
        coalesce(expr("sg div n_purchases"), lit(-1L)).as("avg_gap_us"))
      .orderBy("attr_type")
  }

  /** Per-user outlier events by z-score — the monitoring / data-quality
    * staple. Determinism across engines is engineered, not hoped for: the
    * per-user moments come from EXACT decimal sums (sum v, sum v², n), and
    * every double op after that (mean, variance, sqrt, the z division) is
    * a correctly-rounded IEEE-754 operation on identical inputs — so Spark
    * and DuckDB produce bit-identical z values. Population variance (÷n)
    * avoids the n=1 division-by-zero edge.
    *
    * Scale stance: moments are one partial-agg-friendly groupBy(user);
    * the join back to events is user-keyed (broadcastable — one row per
    * user); no windows. 100 TB of events distributes on user_id. */
  def q_events_anomaly(s: SparkSession, d: String): DataFrame = {
    val dec = col("value").cast("decimal(18,6)")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"), dec.as("dv"))
    val moments = ev.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(col("dv")).as("s"),
      sum((col("dv") * col("dv")).cast("decimal(38,12)")).as("sq"))
    val mean = moments("s").cast("double") / col("n")
    val variance = (moments("sq").cast("double") -
      moments("s").cast("double") * moments("s").cast("double") / col("n")) / col("n")
    ev.join(moments.select(col("user_id"), mean.as("mean"), variance.as("variance")),
        Seq("user_id"))
      // variance guard: an all-equal user has true variance 0 but the
      // double residual can land a hair either side of it — sqrt(−ε) is
      // NaN and ±tiny/0 is ±Inf, both garbage. 1e-12 cuts that off
      // identically in both engines.
      .filter(col("variance") > 1e-12)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        ((col("value").cast("decimal(18,6)").cast("double") - col("mean")) /
          sqrt(col("variance"))).as("z"))
      .filter(abs(col("z")) > 3.0)
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value"), 6).as("value"), round(col("z"), 6).as("z"))
      // ts in the sort: events carries duplicate (user_id, event_id) rows
      // by design (the late-dedup premise), so without it a LIMIT cut
      // inside a tie group could differ between engines
      .orderBy("user_id", "event_id", "ts")
      .limit(5000)
  }
}
