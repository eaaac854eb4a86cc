package graft

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import graft.streaming.StreamingOps

/** Structured Streaming throughput at scale: the StreamingOps transforms
  * run over a real file-source stream of the (ScaleEvents-replicated)
  * events table, chunked into micro-batches with maxFilesPerTrigger — the
  * ingest shape of a production backfill. Reports per-query batches,
  * rows, wall time and rows/sec.
  *
  * Row totals come from a StreamingQueryListener accumulating every
  * QueryProgressEvent — NOT from `q.recentProgress`, which is a ring
  * buffer capped at spark.sql.streaming.numRecentProgressUpdates
  * (default 100): a long run (100M rows at maxFilesPerTrigger=4 is
  * hundreds of micro-batches) silently undercounts rows there and
  * misreports rows/s.
  *
  *   runMain graft.RunStreamScale <eventsDir> [filesPerTrigger=4]
  *
  * eventsDir must contain events.parquet (e.g. a ScaleEvents output).
  */
object RunStreamScale {

  /** Per-query (rows, batches) totals fed by every progress event. */
  private final class ProgressTotals extends StreamingQueryListener {
    val rows = new ConcurrentHashMap[UUID, Long]()
    val batches = new ConcurrentHashMap[UUID, Long]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      rows.merge(e.progress.id, e.progress.numInputRows, (a, b) => a + b)
      batches.merge(e.progress.id, 1L, (a, b) => a + b)
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunStreamScale <eventsDir> [filesPerTrigger]")
    val dir = args(0)
    val fpt = args.lift(1).map(_.toInt).getOrElse(4)
    val only = args.drop(2).toSet
    def wanted(n: String) = only.isEmpty || only(n)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val totals = new ProgressTotals
    spark.streams.addListener(totals)
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema

    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", fpt).parquet(path)
      // watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
      // cast is value-identical
      .withColumn("ts", col("ts").cast("timestamp"))

    def report(name: String, q: StreamingQuery, t0: Long): Unit = {
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      // the listener feed rides the async event bus with no public flush:
      // poll until the totals are quiescent before reading them
      var prev = (-1L, -1L)
      var cur = (totals.rows.getOrDefault(q.id, 0L), totals.batches.getOrDefault(q.id, 0L))
      while (cur != prev) {
        prev = cur
        Thread.sleep(250)
        cur = (totals.rows.getOrDefault(q.id, 0L), totals.batches.getOrDefault(q.id, 0L))
      }
      val (rows, nb) = cur
      println(f"[streamscale] $name%-12s $nb%4d batches  " +
        f"$rows%9d rows  $secs%6.1f s  ${rows / secs}%,.0f rows/s")
    }

    def drive(name: String, mode: String)(
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val q = mk(stream()).writeStream.format("noop").outputMode(mode)
        .queryName(name).start()
      report(name, q, t0)
    }

    if (wanted("tumbling")) drive("tumbling", "update")(StreamingOps.tumbling)
    if (wanted("sessionize")) drive("sessionize", "append")(StreamingOps.sessionize)
    if (wanted("dedup")) drive("dedup", "append")(StreamingOps.dedup)

    // stream-stream interval join: views and clicks as two independent
    // file-source streams over the same table (filtered by type), joined
    // with event-time bounds — the watermark expires view state as the
    // click watermark advances
    if (wanted("attribution")) {
      def side(t: String) = stream().filter(col("event_type") === t)
      val t0 = System.nanoTime()
      val q = StreamingOps.attribution(side("view"), side("click"))
        .writeStream.format("noop").outputMode("append")
        .queryName("attribution").start()
      report("attribution", q, t0)
    }

    // arbitrary per-key state (flatMapGroupsWithState): the running
    // per-user profile across every micro-batch — NoTimeout so the state
    // store carries every user key to the end
    if (wanted("profile")) {
      import spark.implicits._
      import org.apache.spark.sql.streaming.GroupStateTimeout
      val s = stream()
        .select(col("user_id"), col("ts"), col("value"))
        .as[(Long, java.sql.Timestamp, Double)]
      val t0 = System.nanoTime()
      val q = StreamingOps.runningProfile(s, GroupStateTimeout.NoTimeout())
        .toDF().writeStream.format("noop").outputMode("update")
        .queryName("profile").start()
      report("profile", q, t0)
    }
    spark.stop()
  }
}
