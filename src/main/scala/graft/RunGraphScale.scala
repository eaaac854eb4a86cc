package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.{GraphGen, GraphOps}

/** Iterative-graph scale demo on the same deterministic power-law synthetic
  * RunSynth fits: connected components (hash-min label propagation with the
  * label-sum fixpoint witness) and PageRank, timed at ~1M nodes — the two
  * O(iterations × |E|) algorithms whose per-round lineage/planning behavior
  * only misbehaves at scale (the exponential-stats class of bug the BigCLAM
  * loop hit).
  *
  *   runMain graft.RunGraphScale <nNodes> <nEdges> [prIters=5]
  */
object RunGraphScale {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: RunGraphScale <nNodes> <nEdges> [prIters=5]")
      sys.exit(2)
    }
    val Array(nNodes, nEdges) = args.take(2).map(_.toLong)
    val prIters = args.lift(2).map(_.toInt).getOrElse(5)
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
    println(f"[graphscale] ${edges.count()} directed edge rows ($secs%.0f s)")

    val tCc = System.nanoTime()
    val cc = GraphOps.connectedComponents(edges)
    val comps = cc.groupBy("comp").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_comps"), max(col("sz")).as("giant")).collect()(0)
    println(f"[graphscale] CC: ${comps.getLong(0)} components, giant=${comps.getLong(1)} " +
      f"(${(System.nanoTime() - tCc) / 1e9}%.0f s)")

    val tPr = System.nanoTime()
    val pr = GraphOps.pageRank(edges, prIters)
    val stats = pr.agg(sum(col("pr")).as("mass"), max(col("pr")).as("top")).collect()(0)
    println(f"[graphscale] PageRank($prIters): mass=${stats.getDouble(0)}%.4f " +
      f"top=${stats.getDouble(1)}%.6f (${(System.nanoTime() - tPr) / 1e9}%.0f s)")

    val tAs = System.nanoTime()
    val as = GraphOps.assortativity(edges).collect()(0)
    println(f"[graphscale] assortativity: r=${as.getDouble(1)}%.6f over " +
      f"${as.getLong(0)} edge rows (${(System.nanoTime() - tAs) / 1e9}%.0f s)")

    val tLpa = System.nanoTime()
    val lpa = GraphOps.labelPropagation(edges, 5)
    val lpaStats = lpa.groupBy("lab").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_labels"), max(col("sz")).as("biggest")).collect()(0)
    println(f"[graphscale] LPA(5): ${lpaStats.getLong(0)} labels, " +
      f"biggest=${lpaStats.getLong(1)} (${(System.nanoTime() - tLpa) / 1e9}%.0f s)")

    // PPR mass is EXACTLY mass-preserving on a symmetric graph (no
    // dangling nodes): Σpr stays 1 through every iteration — the same
    // checkable invariant PageRank's run asserts, under the seed reset
    val tPpr = System.nanoTime()
    val ppr = GraphOps.personalizedPageRank(edges, col("node") % 1000 === 0, 3)
    val pprStats = ppr.agg(sum(col("pr")).as("mass"),
      sum(when(col("node") % 1000 === 0, col("pr"))).as("seed_mass")).collect()(0)
    println(f"[graphscale] PPR(3, seeds=node%%1000==0): mass=${pprStats.getDouble(0)}%.4f " +
      f"seed_share=${pprStats.getDouble(1)}%.4f (${(System.nanoTime() - tPpr) / 1e9}%.0f s)")
    println(f"[graphscale] total $secs%.0f s")
    spark.stop()
  }
}
