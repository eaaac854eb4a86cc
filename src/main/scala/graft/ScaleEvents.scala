package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic event-stream scale-up for the events-family stress runs:
  * replicate every event R×, writing `<outDir>/events.parquet`. Replica i
  * keeps the timestamp (so the day/window/session structure is preserved)
  * and shifts user_id by i·1e6 and event_id by i·1e9 — R independent
  * copies of the user population, which multiplies per-day user counts and
  * per-user sequences without changing any per-user distribution. The
  * expansion is a `posexplode(sequence)` that distributes with the scan —
  * no driver loop, no RNG.
  *
  *   runMain graft.ScaleEvents <srcSfDir> <outDir> <R>
  */
object ScaleEvents {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: runMain graft.ScaleEvents <srcSfDir> <outDir> <R>")
    val Array(src, out, rStr) = args.take(3)
    val r = rStr.toInt
    require(r >= 1, s"R must be >= 1, got $r")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, src)
    // the replica shifts assume ids fit under the shift bases: a source with
    // user_id >= 1e6 or event_id >= 1e9 (e.g. re-scaling an already-scaled
    // output) would silently collide replicas and corrupt the "R independent
    // copies" invariant every scale benchmark relies on — fail instead
    val mx = ev.agg(max(col("user_id")).as("mu"), max(col("event_id")).as("me")).collect()(0)
    require(mx.isNullAt(0) || mx.getLong(0) < 1000000L,
      s"ScaleEvents: source user_id max ${mx.get(0)} >= 1e6 would collide replica shifts " +
        "(is the source already a scaled output?)")
    require(mx.isNullAt(1) || mx.getLong(1) < 1000000000L,
      s"ScaleEvents: source event_id max ${mx.get(1)} >= 1e9 would collide replica shifts " +
        "(is the source already a scaled output?)")
    val cols = ev.columns
    val scaled = ev
      .select(col("*"), posexplode(sequence(lit(0), lit(r - 1))).as(Seq("i", "unused")))
      .withColumn("new_user", col("user_id") + col("i") * 1000000L)
      .withColumn("new_event", col("event_id") + col("i") * 1000000000L)
      .drop("user_id", "event_id", "unused", "i")
      .withColumnRenamed("new_user", "user_id")
      .withColumnRenamed("new_event", "event_id")
      .select(cols.map(col): _*)
    scaled.write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"[scale-events] wrote ${spark.read.parquet(s"$out/events.parquet").count()} " +
      s"events (R=$r) to $out")
    spark.stop()
  }
}
