package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Structured Streaming throughput at scale: the StreamingOps transforms
  * run over a real file-source stream of the (ScaleEvents-replicated)
  * events table, chunked into micro-batches with maxFilesPerTrigger — the
  * ingest shape of a production backfill. Reports per-query batches,
  * rows, wall time and rows/sec from the StreamingQueryProgress feed.
  *
  *   runMain graft.RunStreamScale <eventsDir> [filesPerTrigger=4]
  *
  * eventsDir must contain events.parquet (e.g. a ScaleEvents output).
  */
object RunStreamScale {
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
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema

    def drive(name: String, mode: String)(
        mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      // watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
      // cast is value-identical
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", fpt).parquet(path)
        .withColumn("ts", col("ts").cast("timestamp"))
      val t0 = System.nanoTime()
      val q = mk(stream).writeStream.format("noop").outputMode(mode)
        .queryName(name).start()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress
      val rows = progress.map(_.numInputRows).sum
      q.stop()
      println(f"[streamscale] $name%-12s ${progress.length}%3d batches  " +
        f"$rows%9d rows  $secs%6.1f s  ${rows / secs}%,.0f rows/s")
    }

    if (wanted("tumbling")) drive("tumbling", "update")(StreamingOps.tumbling)
    if (wanted("sessionize")) drive("sessionize", "append")(StreamingOps.sessionize)
    if (wanted("dedup")) drive("dedup", "append")(StreamingOps.dedup)

    // stream-stream interval join: views and clicks as two independent
    // file-source streams over the same table (filtered by type), joined
    // with event-time bounds — the watermark expires view state as the
    // click watermark advances
    if (wanted("attribution")) {
      def side(t: String) = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", fpt).parquet(path)
        .withColumn("ts", col("ts").cast("timestamp"))
        .filter(col("event_type") === t)
      val t0 = System.nanoTime()
      val q = StreamingOps.attribution(side("view"), side("click"))
        .writeStream.format("noop").outputMode("append")
        .queryName("attribution").start()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = q.recentProgress.map(_.numInputRows).sum
      q.stop()
      println(f"[streamscale] attribution  ${q.recentProgress.length}%3d batches  " +
        f"$rows%9d rows  $secs%6.1f s  ${rows / secs}%,.0f rows/s")
    }

    // arbitrary per-key state (flatMapGroupsWithState): the running
    // per-user profile across every micro-batch — NoTimeout so the state
    // store carries every user key to the end
    if (wanted("profile")) {
      import spark.implicits._
      import org.apache.spark.sql.streaming.GroupStateTimeout
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", fpt).parquet(path)
        .withColumn("ts", col("ts").cast("timestamp"))
        .select(col("user_id"), col("ts"), col("value"))
        .as[(Long, java.sql.Timestamp, Double)]
      val t0 = System.nanoTime()
      val q = StreamingOps.runningProfile(stream, GroupStateTimeout.NoTimeout())
        .toDF().writeStream.format("noop").outputMode("update")
        .queryName("profile").start()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = q.recentProgress.map(_.numInputRows).sum
      q.stop()
      println(f"[streamscale] profile      ${q.recentProgress.length}%3d batches  " +
        f"$rows%9d rows  $secs%6.1f s  ${rows / secs}%,.0f rows/s")
    }
    spark.stop()
  }
}
