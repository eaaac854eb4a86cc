package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.{GraphGen, GraphOps}
import graft.bigclam.BigClam

/** Planted-community recovery at scale — the scientific loop the reference
  * leaves implicit (it ships SNAP ground-truth `.cmty` files alongside its
  * datasets but never scores against them): generate a graph with KNOWN
  * communities, fit BigCLAM, and report symmetric best-match F1 against the
  * planted assignment.
  *
  *   runMain graft.RunPlanted <nNodes> <nCommunities> <intraEdges> <interEdges> <maxIterations> [supportCap=16] [hotDegCap=200] [stableTol=0.01]
  *
  * K is set to the planted community count. e.g. a 100k-node, 50-community
  * recovery: runMain graft.RunPlanted 100000 50 1000000 50000 40
  *
  * The membership-churn stop is the DEFAULT (stableTol 0.01) with
  * `maxIterations` as the guard-rail cap — the dense-giant analysis showed
  * fixed caps land mid-restructure and relative-LLH stops quit during
  * slow-LLH/high-churn phases, so budget by churn unless explicitly
  * disabled (stableTol 0 runs the fixed cap alone).
  */
object RunPlanted {
  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println("usage: RunPlanted <nNodes> <nCommunities> " +
        "<intraEdges> <interEdges> <maxIterations> [supportCap=16] " +
        "[hotDegCap=200] [stableTol=0.01 — <1% argmax churn; 0 disables]")
      sys.exit(2)
    }
    val Array(nNodes, nComms, intra, inter, iters) = args.take(5).map(_.toLong)
    val cap = args.lift(5).map(_.toInt).getOrElse(16)
    val hotCap = args.lift(6).map(_.toLong).getOrElse(200L)
    val stableTol = Some(args.lift(7).map(_.toDouble).getOrElse(0.01)).filter(_ > 0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9
    val edges = GraphOps.symEdges(
        GraphGen.plantedPartitionEdges(spark, nNodes, nComms.toInt, intra, inter))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[planted] ${edges.count()} directed edge rows over $nNodes nodes, " +
      f"$nComms planted communities ($secs%.0f s)")

    val ranked = GraphOps.seedRank(edges, Some(hotCap))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[planted] seedRank: ${ranked.count()} candidate seeds ($secs%.0f s)")

    val p = BigClam.Params(k = nComms.toInt)
    val (fs, history) = BigClam.fitSparse(edges, p, iterations = iters.toInt,
      ranked = Some(ranked), supportCap = Some(cap), stableTol = stableTol)
    val f = BigClam.toDenseF(fs, p.k).persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[planted] fit done ($secs%.0f s); " +
      s"LLH ${history.map(v => f"$v%.4e").mkString(" -> ")}")

    val fitted = BigClam.communities(f, edges, p)
    val truth = GraphGen.plantedTruth(spark, nNodes, nComms.toInt)
    val score = BigClam.scoreCommunities(fitted, truth).collect()(0)
    println(f"[planted] F1=${score.getDouble(0)}%.4f " +
      f"(fitted-best ${score.getDouble(1)}%.4f over ${score.getLong(3)} communities, " +
      f"truth-best ${score.getDouble(2)}%.4f over ${score.getLong(4)} planted) " +
      f"TOTAL $secs%.1f s")
    // δ-threshold vs argmax diagnosis: if argmax-F1 is high while F1 is low,
    // the fit is fine and the δ membership threshold is over-assigning
    val argmax = f.select(col("id").as("node"),
      (array_position(col("f"), array_max(col("f"))) - 1).cast("int").as("community"))
    val s2 = BigClam.scoreCommunities(argmax, truth).collect()(0)
    println(f"[planted] argmax-F1=${s2.getDouble(0)}%.4f " +
      f"(membership rows: threshold=${fitted.count()} argmax=${argmax.count()})")
    spark.stop()
  }
}
