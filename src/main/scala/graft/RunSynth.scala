package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.{GraphGen, GraphOps}
import graft.bigclam.BigClam

/** v3-scale synthetic run — the reference's largest configuration re-created
  * offline: its v3 dataset is com-youtube (~1.13M nodes / 2.99M undirected
  * edges, bigclamv3-7.scala:14-15,26) fit with sparse large-K factors. The
  * container has no network, so the graph is a deterministic power-law
  * synthetic of the same shape (GraphGen.powerLawEdges) and the fit is the
  * v3 path: fitSparse with a support cap.
  *
  *   runMain graft.RunSynth <nNodes> <nEdges> <K> <iterations> <supportCap> [hotDegCap]
  *
  * e.g. the com-youtube-shaped run:
  *   runMain graft.RunSynth 1000000 3000000 1000 2 32
  *
  * `hotDegCap` (default 200) truncates hub egos inside conductance seeding —
  * on a power-law graph an uncapped hub ego expands deg² rows, which is the
  * one quadratic hazard in the seeding pipeline.
  */
object RunSynth {
  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println(
        "usage: RunSynth <nNodes> <nEdges> <K> <maxIterations> <supportCap> " +
          "[hotDegCap=200] [stableTol — e.g. 0.01 stops at <1% argmax churn] " +
          "[initMode=ego|egosplit|auto] [llhTol=0 — 0 disables]")
      sys.exit(2)
    }
    val Array(nNodes, nEdges, k, iters, cap) = args.take(5).map(_.toLong)
    val hotCap = args.lift(5).map(_.toLong).getOrElse(200L)
    val stableTol = args.lift(6).map(_.toDouble).filter(_ > 0)
    val initMode = args.lift(7).getOrElse("ego")
    val llhTol = args.lift(8).map(_.toDouble).filter(_ > 0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9
    val edges = GraphOps.symEdges(GraphGen.powerLawEdges(spark, nNodes, nEdges))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDirected = edges.count()
    val nNodesSeen = edges.select(col("src")).distinct().count()
    println(f"[synth] generated: $nNodesSeen nodes, $nDirected directed edge rows ($secs%.0f s)")

    val ranked = GraphOps.seedRank(edges, Some(hotCap))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[synth] seedRank: ${ranked.count()} candidate seeds ($secs%.0f s)")

    val p = BigClam.Params(k = k.toInt)
    val (fs, history) = BigClam.fitSparse(edges, p, iterations = iters.toInt,
      ranked = Some(ranked), supportCap = Some(cap.toInt), stableTol = stableTol,
      llhTol = llhTol, initMode = initMode,
      initProbe = d => println(s"[synth] init: requested=${d.requested} " +
        s"chosen=${d.chosen} egoLlh=${d.egoLlh.getOrElse(Double.NaN)} " +
        s"splitLlh=${d.splitLlh.getOrElse(Double.NaN)} " +
        s"abandonedAt=${d.abandonedAtIter.getOrElse(-1)} " +
        d.cover.fold("")(_.toString)))
    val fit = fs.persist(StorageLevel.MEMORY_AND_DISK)
    val supp = fit.agg(
      count(lit(1)).as("rows"),
      avg(size(col("fi"))).as("avg_nnz"),
      max(size(col("fi"))).as("max_nnz"),
      sum(when(size(col("fi")) > 0, 1L).otherwise(0L)).as("active_rows")).collect()(0)
    println(f"[synth] total ${secs}%.1f s: F rows=${supp.getLong(0)} " +
      f"active=${supp.getLong(3)} avg_nnz=${supp.getDouble(1)}%.2f max_nnz=${supp.getInt(2)}")
    println(s"[synth] LLH history: ${history.map(v => f"$v%.4e").mkString(" -> ")}")
    val monotone = history.sliding(2).forall(w => w.length < 2 || w(1) >= w(0) - math.abs(w(0)) * 1e-12)
    println(s"[synth] monotone ascent: $monotone")
    spark.stop()
  }
}
