package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.{GraphGen, GraphOps}
import graft.bigclam.BigClam

/** OVERLAPPING planted-cover recovery — the AGM regime BigCLAM exists for:
  * generate a graph whose ground truth assigns nodes to 1-3 communities
  * (GraphGen.plantedCoverTruth/plantedCoverEdges), fit, and score symmetric
  * best-match F1 against the overlapping truth. Reports the truth and
  * fitted multi-membership mass plus a structure-destroying striped
  * baseline so the score has a floor to beat.
  *
  *   runMain graft.RunPlantedCover <nNodes> <nCommunities> <pSingle> <interEdges> <maxIterations> [supportCap=16] [hotDegCap=200] [stableTol=0.01]
  *
  * The membership-churn stop is the DEFAULT (stableTol 0.01) with
  * `maxIterations` as the guard-rail cap — fixed caps land mid-restructure
  * in the dense-giant regime (see README's churn-trace analysis); pass
  * stableTol 0 to run the fixed cap alone. */
object RunPlantedCover {
  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println("usage: RunPlantedCover <nNodes> <nCommunities> " +
        "<pSingle> <interEdges> <maxIterations> [supportCap=16] " +
        "[hotDegCap=200] [stableTol=0.01 — 0 disables]")
      sys.exit(2)
    }
    val nNodes = args(0).toLong
    val nComms = args(1).toInt
    val pSingle = args(2).toDouble
    val inter = args(3).toLong
    val iters = args(4).toInt
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
    val truth = GraphGen.plantedCoverTruth(spark, nNodes, nComms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val memHist = truth.groupBy("node").agg(count(lit(1)).as("m"))
      .groupBy("m").agg(count(lit(1)).as("nodes")).orderBy("m").collect()
    println(s"[cover] truth memberships: " +
      memHist.map(r => s"${r.getLong(0)}x${r.getLong(1)}").mkString(" "))
    val edges = GraphOps.symEdges(
        GraphGen.plantedCoverEdges(spark, nNodes, nComms, pSingle, inter))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[cover] ${edges.count()} directed edge rows over $nNodes nodes, " +
      f"$nComms planted communities, pSingle=$pSingle ($secs%.0f s)")

    val ranked = GraphOps.seedRank(edges, Some(hotCap))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val p = BigClam.Params(k = nComms)
    val (fs, history) = BigClam.fitSparse(edges, p, iterations = iters,
      ranked = Some(ranked), supportCap = Some(cap), stableTol = stableTol)
    val f = BigClam.toDenseF(fs, p.k).persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[cover] fit done ($secs%.0f s); " +
      s"LLH ${history.map(v => f"$v%.4e").mkString(" -> ")}")

    val fitted = BigClam.communities(f, edges, p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fittedMulti = fitted.groupBy("node").agg(count(lit(1)).as("m"))
      .filter(col("m") >= 2).count()
    val truthMulti = truth.groupBy("node").agg(count(lit(1)).as("m"))
      .filter(col("m") >= 2).count()
    val score = BigClam.scoreCommunities(fitted, truth).collect()(0)
    val omega = BigClam.scoreCommunitiesOmega(fitted, truth)
      .collect()(0).getAs[Double]("omega")
    println(f"[cover] F1=${score.getDouble(0)}%.4f omega=$omega%.4f " +
      f"(fitted-best ${score.getDouble(1)}%.4f over ${score.getLong(3)} communities, " +
      f"truth-best ${score.getDouble(2)}%.4f over ${score.getLong(4)} planted); " +
      f"multi-membership fitted=$fittedMulti truth=$truthMulti")

    // structure-destroying baseline: stripe nodes across K single
    // memberships by residue — overlap-free AND community-structure-free
    val striped = truth.select(col("node")).distinct()
      .select(pmod(col("node"), lit(nComms.toLong)).as("community"), col("node"))
    val base = BigClam.scoreCommunities(striped, truth).collect()(0)
    println(f"[cover] striped-baseline F1=${base.getDouble(0)}%.4f  TOTAL $secs%.1f s")
    spark.stop()
  }
}
