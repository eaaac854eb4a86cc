package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.{GraphGen, GraphOps}
import graft.bigclam.BigClam

/** K-grid model selection on PLANTED ground truth — the validation the
  * unplanted power-law run cannot give (README "Two findings": on
  * hub-dominated structure raw LLH rises with K forever and the reference's
  * 1e-3 relative-gain stop never fires, so the walker honestly reports the
  * grid boundary). Here the graph is drawn from the AGM itself
  * (GraphGen.plantedCoverEdges — the exact generative model the fit
  * maximizes) with a KNOWN community count K*, so the LLH-vs-K curve has a
  * true answer to recover: gains should be large while K < K* (each new
  * community explains a planted block) and collapse once K >= K* (extra
  * capacity explains nothing that is really there).
  *
  * Reference semantics: the v4 K-grid walk, bigclam4-7.scala:16-20,225-266.
  *
  *   runMain graft.RunSelectKPlanted <nNodes> <kStar> <pSingle> <interEdges>
  *     <minK> <maxK> <steps> <fitIters> [supportCap=16] [stableTol=0.01]
  *     [hotDegCap=200]
  *
  * The grid is walked in FULL (no early stop) — the curve is the
  * deliverable; the reference's kTol=1e-3 stopping rule is then REPLAYED on
  * the recorded curve, so one run reports both the raw-LLH argmax and what
  * the reference's walker would have chosen. The argmax-K fit is finally
  * scored (best-match F1 + Omega) against the planted truth: a high score
  * at K~K* is the end-to-end evidence that grid selection finds real
  * structure when there is real structure to find. */
object RunSelectKPlanted {
  def main(args: Array[String]): Unit = {
    if (args.length < 8) {
      System.err.println("usage: RunSelectKPlanted <nNodes> <kStar> " +
        "<pSingle> <interEdges> <minK> <maxK> <steps> <fitIters> " +
        "[supportCap=16] [stableTol=0.01 — 0 disables] [hotDegCap=200]")
      sys.exit(2)
    }
    val nNodes = args(0).toLong
    val kStar = args(1).toInt
    val pSingle = args(2).toDouble
    val inter = args(3).toLong
    val minK = args(4).toInt
    val maxK = args(5).toInt
    val steps = args(6).toInt
    val iters = args(7).toInt
    val cap = args.lift(8).map(_.toInt).getOrElse(16)
    val stableTol = Some(args.lift(9).map(_.toDouble).getOrElse(0.01)).filter(_ > 0)
    val hotCap = Some(args.lift(10).map(_.toLong).getOrElse(200L)).filter(_ > 0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9

    val truth = GraphGen.plantedCoverTruth(spark, nNodes, kStar)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = GraphOps.symEdges(
        GraphGen.plantedCoverEdges(spark, nNodes, kStar, pSingle, inter))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[selectk*] $nNodes nodes, K*=$kStar planted, ${edges.count()} " +
      f"directed edge rows, pSingle=$pSingle ($secs%.0f s to generate)")

    // full-grid walk: kTol=0 never satisfies |1 - llh/prev| < kTol, so every
    // grid point is evaluated and the curve comes back whole
    val (bestK, bestF, grid) = BigClam.selectKSparse(edges,
      BigClam.Params(k = minK), minK = minK, maxK = maxK, steps = steps,
      kTol = 0.0, fitIterations = iters, supportCap = Some(cap),
      stableTol = stableTol, hotDegCap = hotCap)
    println(f"[selectk*] grid walked in $secs%.0f s:")
    grid.foreach { case (k, llh) => println(f"[selectk*]   K=$k%-6d llh=$llh%.4e") }
    // replay the reference's stopping rule (bigclam4-7.scala:259) on the
    // recorded curve: walk ascending, stop at the first sub-1e-3 relative
    // gain, report the best LLH seen up to the stop
    val stopIdx = grid.indices.drop(1)
      .find(i => math.abs(1.0 - grid(i)._2 / grid(i - 1)._2) < 1e-3)
    val refChoice = stopIdx match {
      case Some(i) => grid.take(i + 1).maxBy(_._2)._1
      case None    => grid.maxBy(_._2)._1
    }
    println(s"[selectk*] planted K*=$kStar  argmax-LLH K=$bestK  " +
      s"reference-rule(1e-3) K=$refChoice" +
      stopIdx.map(i => s" (stopped after ${grid(i)._1})").getOrElse(" (never stopped)"))

    // close the loop: does the argmax-K model recover the planted cover?
    val f = BigClam.toDenseF(bestF, bestK).persist(StorageLevel.MEMORY_AND_DISK)
    val fitted = BigClam.communities(f, edges, BigClam.Params(k = bestK))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val score = BigClam.scoreCommunities(fitted, truth).collect()(0)
    val omega = BigClam.scoreCommunitiesOmega(fitted, truth)
      .collect()(0).getAs[Double]("omega")
    println(f"[selectk*] argmax-K fit vs planted truth: F1=${score.getDouble(0)}%.4f " +
      f"omega=$omega%.4f  TOTAL $secs%.1f s")
    spark.stop()
  }
}
