package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function surface. Every window ORDER BY ends in a unique tiebreak
  * column so rank/lag/frame results are deterministic; running sums go
  * through DECIMAL so the incremental and segment-tree evaluation orders of
  * Spark and DuckDB produce identical bits.
  *
  * At scale these are single hash-partitioned shuffles on the PARTITION BY
  * key; none of them requires a global sort except the final presentation
  * ORDER BY (bounded by LIMIT → TakeOrdered, no full sort).
  */
object Windows {

  def q_win_rank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy("o_custkey", "o_orderkey")
      .limit(2000)
  }

  def q_win_rownum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .orderBy("o_custkey", "rn")
      .limit(2000)
  }

  def q_win_running(s: SparkSession, d: String): DataFrame = {
    val base = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val wRun = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = base.rowsBetween(-2, Window.currentRow)
    val dv = col("value").cast("decimal(18,6)")
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(dv).over(wRun).cast("double").as("run_sum"),
        round(sum(dv).over(wMov).cast("double") / count(lit(1)).over(wMov), 6).as("mov_avg"))
      .orderBy("user_id", "ts", "event_id")
      .limit(2000)
  }

  def q_win_lag_lead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1, -1.0).over(w).as("prev_val"),
        lead(col("value"), 1, -1.0).over(w).as("next_val"))
      .orderBy("user_id", "event_id")
      .limit(2000)
  }

  def q_win_distribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("c_custkey")).over(w).as("poorest"))
      .orderBy("c_mktsegment", "c_custkey")
      .limit(2000)
  }

  /** RANGE interval frame — the value-based frame form (vs the ROWS frames
    * above): per user, the sum of event values in the trailing hour of
    * EVENT TIME, however many rows that is. The frame key is epoch
    * microseconds (exact integer on both engines) and the frame sum rides
    * DECIMAL, so Spark's incremental frame evaluation and DuckDB's
    * segment tree agree bit-for-bit. ts microsecond ties are resolved by
    * the range semantics themselves (peers share a frame — no tiebreak
    * column is legal in RANGE mode). */
  def q_win_range_frame(s: SparkSession, d: String): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val wHour = Window.partitionBy("user_id").orderBy(col("us").asc)
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), us.as("us"),
        col("value").cast("decimal(18,6)").as("dv"))
      .select(col("user_id"), col("event_id"), col("ts"),
        sum(col("dv")).over(wHour).cast("double").as("hour_sum"),
        count(lit(1)).over(wHour).as("hour_n"))
      // ts in the final sort: events carries duplicate (user_id, event_id)
      // rows by design (the late-dedup premise), and rows tied on the sort
      // key but differing in hour_sum could be cut differently at the LIMIT
      // boundary between engines — ts makes the cut deterministic
      .orderBy("user_id", "event_id", "ts")
      .limit(2000)
  }

  def q_win_ntile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), ntile(4).over(w).as("tile"))
      .orderBy("c_mktsegment", "tile", "c_custkey")
      .limit(2000)
  }
}
