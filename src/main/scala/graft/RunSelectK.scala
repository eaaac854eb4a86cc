package graft

import org.apache.spark.sql.SparkSession
import graft.graph.GraphOps
import graft.bigclam.BigClam

/** The reference's v4 workload — BigCLAM K-grid model selection
  * (/root/reference/codes/bigclam4-7.scala:16-20,225-266) — end-to-end on a
  * real edge-list file: walk a log-spaced K grid ascending, fit each K,
  * early-stop when the relative LLH gain drops below 1e-3, report the
  * chosen K and the full evaluated grid.
  *
  *   runMain graft.RunSelectK <edgeListPath> <minK> <maxK> <steps> <fitIters> [dense|sparse:<m>] [stableTol] [hotDegCap=200]
  *
  * `sparse:<m>` walks the grid over the capped sparse fit — the reference's
  * own published grid (K=1000→9000) is only reachable that way; `stableTol`
  * further lets each grid point stop on membership stability. `hotDegCap`
  * truncates hub egos inside the shared conductance seeding (default 200,
  * like every other scale main — uncapped, a power-law hub expands deg²
  * rows; pass 0 to disable on small/hubless graphs). */
object RunSelectK {
  def main(args: Array[String]): Unit = {
    if (args.length < 5) {
      System.err.println("usage: runMain graft.RunSelectK <edgeListPath> " +
        "<minK> <maxK> <steps> <fitIters> [dense|sparse:<m>] [stableTol] " +
        "[hotDegCap=200] [llhTol=0 — 0 disables] " +
        "[heldFrac=0 — >0 runs the HELD-OUT sparse walk instead]")
      sys.exit(2)
    }
    val Array(path, minK, maxK, steps, iters) = args.take(5)
    val mode = args.lift(5).getOrElse("dense")
    val supportCap = if (mode.startsWith("sparse:")) Some(mode.drop(7).toInt) else None
    val stableTol = args.lift(6).map(_.toDouble)
    val hotDegCap = Some(args.lift(7).map(_.toLong).getOrElse(200L)).filter(_ > 0)
    val llhTol = args.lift(8).map(_.toDouble).filter(_ > 0)
    val heldFrac = args.lift(9).map(_.toDouble).getOrElse(0.0)
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
    if (heldFrac > 0) {
      // held-out walk (VERDICT r12 #5): the capacity-honest criterion on an
      // ORGANIC graph, where raw training LLH rises monotonically in K and
      // the reference's relative-gain stop never fires. Every grid K fits
      // on the same 1−heldFrac train split to the same convergence rule,
      // scored on held edges + an equal non-edge sample.
      val (hk, _, hcurve) = BigClam.selectKSparseHeldOut(edges,
        BigClam.Params(k = minK.toInt), minK = minK.toInt, maxK = maxK.toInt,
        steps = steps.toInt, heldFrac = heldFrac,
        fitIterations = iters.toInt, llhTol = llhTol.orElse(Some(1e-4)),
        supportCap = supportCap, hotDegCap = hotDegCap)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[selectk] $path: $nEdges directed edges, HELD-OUT walk " +
        f"(frac=$heldFrac) in $secs%.1f s")
      hcurve.foreach { case (k, tr, ho) =>
        println(f"[selectk]   K=$k%-6d train_llh=$tr%.4e held_llh=$ho%.4e") }
      println(s"[selectk] held-out choice K=$hk")
    } else {
      val (bestK, _, grid) =
        if (mode.startsWith("sparse"))
          BigClam.selectKSparse(edges, BigClam.Params(k = minK.toInt),
            minK = minK.toInt, maxK = maxK.toInt, steps = steps.toInt,
            fitIterations = iters.toInt, supportCap = supportCap,
            stableTol = stableTol, hotDegCap = hotDegCap, llhTol = llhTol)
        else
          BigClam.selectK(edges, BigClam.Params(k = minK.toInt),
            minK = minK.toInt, maxK = maxK.toInt, steps = steps.toInt,
            fitIterations = iters.toInt, hotDegCap = hotDegCap)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[selectk] $path: $nEdges directed edges, grid " +
        s"${grid.map(_._1).mkString("{", ",", "}")} ($iters iters each) " +
        f"in $secs%.1f s")
      grid.foreach { case (k, llh) => println(f"[selectk]   K=$k%-6d llh=$llh%.2f") }
      println(s"[selectk] chosen K=$bestK")
    }
    spark.stop()
  }
}
