package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.StreamingOps

/** True Structured Streaming smoke: the StreamingOps transforms run on a
  * MemoryStream and produce the same aggregates the batch forms would.
  */
class StreamingSpec extends AnyFunSuite {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window aggregation over a MemoryStream") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, t("2024-01-01 01:00:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 02:00:00"), 1, "click", 2.0),
      Ev(3, t("2024-01-02 01:00:00"), 2, "view", 3.0))
    val q = StreamingOps.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM tumbling_out ORDER BY day_start, event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("cnt") == 2 && rows(0).getAs[Double]("sum_val") == 3.0)
      assert(rows(1).getAs[Long]("cnt") == 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps a running per-user profile across batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamingOps.runningProfile(mem.toDS(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("profile_out")
      .outputMode("update").start()
    try {
      mem.addData((1L, t("2024-01-01 01:00:00"), 2.0), (1L, t("2024-01-01 01:05:00"), 3.0))
      q.processAllAvailable()
      mem.addData((1L, t("2024-01-01 01:10:00"), 5.0), (2L, t("2024-01-01 01:11:00"), 7.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM profile_out ORDER BY user_id, n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // user 1: first batch (2 events, 5.0), second batch accumulates (3, 10.0)
      assert(rows.contains((1L, 2L, 5.0)))
      assert(rows.contains((1L, 3L, 10.0)))
      assert(rows.contains((2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("stateful funnel ratchets view -> click -> purchase across batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingOps.funnelStages(mem.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      // batch 1: user 1 views+clicks; user 2's click PRECEDES any view
      // (must be ignored); user 3's rows arrive out of ts order in one
      // batch (fold sorts them)
      mem.addData(
        (1L, t("2024-01-01 01:00:00"), "view"),
        (1L, t("2024-01-01 01:10:00"), "click"),
        (2L, t("2024-01-01 01:00:00"), "click"),
        (2L, t("2024-01-01 01:05:00"), "view"),
        (3L, t("2024-01-01 00:45:00"), "click"),
        (3L, t("2024-01-01 00:30:00"), "view"))
      q.processAllAvailable()
      // batch 2: user 1 purchases (stage 3); user 2 purchases WITHOUT a
      // post-view click (stays stage 1); a second view for 3 is a no-op
      mem.addData(
        (1L, t("2024-01-01 01:20:00"), "purchase"),
        (2L, t("2024-01-01 01:06:00"), "purchase"),
        (3L, t("2024-01-01 02:00:00"), "view"))
      q.processAllAvailable()
      val last = spark.sql(
        """SELECT user_id, first_view, first_click, first_purchase FROM funnel_out""")
        .collect()
        .map(r => r.getLong(0) ->
          (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
        .groupBy(_._1)
        // update-mode sink accumulates every emission; the monotone ratchet
        // means the most-advanced emission per user is the final state
        .map { case (u, rows) => u -> rows.map(_._2).maxBy(s => s.productIterator.count(_ != None)) }
      assert(last(1L) == (Some(t("2024-01-01 01:00:00")),
        Some(t("2024-01-01 01:10:00")), Some(t("2024-01-01 01:20:00"))))
      assert(last(2L) == (Some(t("2024-01-01 01:05:00")), None, None))
      assert(last(3L) == (Some(t("2024-01-01 00:30:00")),
        Some(t("2024-01-01 00:45:00")), None))
    } finally q.stop()
  }

  test("streaming dedup drops the late duplicate") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, t("2024-01-01 01:00:00"), 1, "click", 1.0),
      Ev(1, t("2024-01-01 01:05:00"), 1, "click", 1.0), // duplicate (user_id, event_id)
      Ev(2, t("2024-01-01 01:10:00"), 1, "view", 2.0))
    val q = StreamingOps.dedup(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM dedup_out").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to in-window views") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    views.addData(
      Ev(10, t("2024-01-01 01:00:00"), 1, "view", 0.0),
      Ev(11, t("2024-01-01 03:00:00"), 1, "view", 0.0),  // > 1h before any click: no match
      Ev(12, t("2024-01-01 01:10:00"), 2, "view", 0.0))
    clicks.addData(
      Ev(20, t("2024-01-01 01:30:00"), 1, "click", 0.0), // matches view 10 only
      Ev(21, t("2024-01-01 01:40:00"), 2, "click", 0.0), // matches view 12
      Ev(22, t("2024-01-01 01:05:00"), 3, "click", 0.0)) // no view at all
    val q = StreamingOps.attribution(views.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val pairs = spark.sql("SELECT click_id, view_id FROM attr_out ORDER BY click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs == Seq((20L, 10L), (21L, 12L)))
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension per micro-batch") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, t("2024-01-01 01:00:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 01:05:00"), 2, "view", 2.0),
      Ev(3, t("2024-01-01 01:10:00"), 9, "view", 3.0))  // no dim row: left join keeps it
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = StreamingOps.enrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, tier FROM enrich_out ORDER BY event_id")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
      assert(rows == Seq((1L, Some("gold")), (2L, Some("silver")), (3L, None)))
    } finally q.stop()
  }
}
