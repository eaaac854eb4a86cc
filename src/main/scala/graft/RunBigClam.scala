package graft

import org.apache.spark.sql.SparkSession
import graft.graph.GraphOps
import graft.bigclam.BigClam

/** End-to-end BigCLAM on an edge-list text file — the reference's whole
  * pipeline (load → symmetrize → conductance-seeded init → projected
  * gradient ascent with Armijo line search → threshold/argmax communities)
  * as one command:
  *
  *   runMain graft.RunBigClam <edgeListPath> <K> <iterations> <outDir> [dense|sparse|sparse:<m>] [stableTol] [llhTol] [ego|egosplit|auto]
  *
  * e.g. the graph bundled with the reference:
  *   runMain graft.RunBigClam /root/reference/data/facebook_combined.txt 8 3 /tmp/fb_out
  * `sparse` runs the v3 large-K path (fitSparse) — same math, sparse rows.
  * `sparse:<m>` adds the per-row support cap (keep the m largest entries) —
  * the bounded-cost configuration for K in the thousands.
  * `stableTol` (sparse modes only) stops early once the per-iteration argmax
  * membership churn drops below the tolerance, making `iterations` a cap.
  * `llhTol` (sparse modes only; 0 disables) stops at the reference's relative
  * LLH rule. `initMode` (sparse modes only) picks the cold-start init:
  * `ego` (default, conductance whole-ego + padding) or `egosplit` (spread
  * seeds + LPA personas + no padding — the dense-cover fix).
  */
object RunBigClam {
  def main(args: Array[String]): Unit = {
    val Array(path, kStr, itStr, outDir) = args.take(4)
    val mode = args.lift(4).getOrElse("dense")
    val sparse = mode.startsWith("sparse")
    val supportCap = if (mode.startsWith("sparse:")) Some(mode.drop(7).toInt) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val edges = GraphOps.symEdges(GraphOps.loadEdgeList(spark, path)).cache()
    val nEdges = edges.count()
    val p = BigClam.Params(k = kStr.toInt)
    // sparse mode scores through communitiesSparse (pair-identical to the
    // dense rule on fitted models, BigClamSpec) — at the v3 magnitude
    // (K=8000 × 1M nodes) the old toDenseF here materialized 64 GB of
    // factor rows just to threshold them
    val (com, history) =
      if (sparse) {
        val (fs, h) = BigClam.fitSparse(edges, p, iterations = itStr.toInt,
          supportCap = supportCap,
          stableTol = args.lift(5).map(_.toDouble).filter(_ > 0),
          llhTol = args.lift(6).map(_.toDouble).filter(_ > 0),
          initMode = args.lift(7).getOrElse("ego"))
        (BigClam.communitiesSparse(fs, edges, p), h)
      } else {
        val (f, h) = BigClam.fit(edges, p, iterations = itStr.toInt)
        (BigClam.communities(f, edges, p), h)
      }
    com.write.mode("overwrite").parquet(outDir)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[bigclam] $path: ${nEdges} directed edges, K=${p.k} " +
      f"($mode), ${itStr} iterations in $secs%.1f s")
    println(s"[bigclam] LLH history: ${history.map(v => f"$v%.2f").mkString(" -> ")}")
    println(s"[bigclam] memberships written to $outDir")
    spark.stop()
  }
}
