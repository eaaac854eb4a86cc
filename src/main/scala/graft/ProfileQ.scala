package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement harness (guide §1): runs declared queries
  * through the same noop sink as Bench, but with a SparkListener attached so
  * each query reports its JOB / STAGE / TASK counts and summed task time next
  * to wall time. The gap between wall time and task time is scheduler/driver
  * overhead — for the iterative operators (CC, BFS, k-core, Lloyd) the job
  * count is the metric that matters: every localCheckpoint and every loop
  * witness is one more driver round-trip.
  *
  * Usage: tools/run_main.sh graft.ProfileQ <sfDir> [reps] [query ...]
  * Prints one line per (rep, query): wall s, jobs, stages, tasks, task-sec.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 1
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // ad-hoc conf experiments: GRAFT_PROFILE_CONF="k=v;k=v"
    sys.env.get("GRAFT_PROFILE_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = sys.env.get("GRAFT_PROFILE_STAGES").contains("1")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val info = s.stageInfo
          stageLog.add((info.name.takeWhile(_ != '\n').take(90),
            info.numTasks, info.taskMetrics.executorRunTime))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    for (rep <- 1 to reps; (name, fn) <- qlist) {
      // settle listener counters from the previous query's stragglers
      Thread.sleep(150)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L); stageLog.clear()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"PROFILE FAIL $name: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"PROFILE rep=$rep%d q=$name%-34s wall=$wall%7.3f jobs=${jobs.get}%4d stages=${stages.get}%5d tasks=${tasks.get}%6d task_s=${taskMs.get / 1000.0}%8.2f")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        stageLog.asScala.toSeq.sortBy(-_._3).take(12).foreach { case (n, nt, ms) =>
          println(f"  STAGE run_s=${ms / 1000.0}%7.2f tasks=$nt%4d $n%s")
        }
      }
    }
    spark.stop()
  }
}
