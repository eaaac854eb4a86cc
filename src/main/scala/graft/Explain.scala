package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints `explain("formatted")` for declared queries so scan
  * pruning (ReadSchema/PushedFilters), join strategies (BroadcastHashJoin
  * vs SortMergeJoin vs BNLJ) and WholeStageCodegen coverage can be reviewed.
  * Usage: runMain graft.Explain [-exec] <sfDir> [query ...]  (default: all).
  * With -exec the query is executed first and the FINAL adaptive plan is
  * printed — the only way to see AQE's runtime decisions (ReusedExchange /
  * shuffle-stage dedup, skew splits, runtime join strategy changes).
  */
object Explain {
  def main(args0: Array[String]): Unit = {
    val exec = args0.contains("-exec")
    val args = args0.filterNot(_ == "-exec")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try {
          val df = fn(spark, sfDir)
          if (exec) {
            df.collect()
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        } catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
