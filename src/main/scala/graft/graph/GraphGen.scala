package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed synthetic graph generation — the offline stand-in
  * for the reference's SNAP downloads (its v3 dataset is com-youtube, ~1.13M
  * nodes / 2.99M undirected edges, bigclamv3-7.scala:14-15,26; the container
  * has no network, so scale runs use a generated graph of the same shape).
  */
object GraphGen {

  /** Power-law random graph: `nEdges` undirected edge draws whose endpoints
    * follow a truncated-Pareto(beta) distribution over [0, nNodes) — node 0
    * is the heaviest hub, P(X <= x) = (x/N)^(1-beta), so expected max degree
    * is ~ 2·nEdges·N^(beta-1) (β=0.5, N=1e6, E=3e6 → hub degree ≈ 6000 vs
    * mean ≈ 6 — the com-youtube-like skew that exercises hotDegCap seeding
    * and AQE skew handling).
    *
    * Fully distributed and DETERMINISTIC in (nNodes, nEdges, beta, seed):
    * each endpoint is derived from xxhash64 of the edge index, not a JVM
    * RNG, so the same graph materializes on any partitioning or cluster
    * size — `spark.range` is the only source and every op is a narrow
    * codegen'd projection until the closing `distinct`. Self-loops are
    * dropped and duplicate draws collapsed (hub multi-edges), so the
    * realized edge count lands slightly under `nEdges`.
    */
  def powerLawEdges(s: SparkSession, nNodes: Long, nEdges: Long,
      beta: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(nNodes > 1, "need at least two nodes")
    require(nEdges > 0, "need at least one edge draw")
    require(beta > 0.0 && beta < 1.0, "beta must be in (0,1)")
    // u ∈ [0,1) from the top 53 bits of the edge-index hash; inverse CDF of
    // density ∝ x^(-beta) on (0, N]: x = N·u^(1/(1-beta))
    def endpoint(salt: Int) = {
      val u = shiftrightunsigned(xxhash64(col("id"), lit(seed), lit(salt)), 11)
        .cast("double") * lit(1.0 / (1L << 53))
      least(
        floor(lit(nNodes.toDouble) * pow(u, lit(1.0 / (1.0 - beta)))).cast("bigint"),
        lit(nNodes - 1))
    }
    s.range(nEdges)
      .select(endpoint(1).as("src"), endpoint(2).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Planted-partition graph: `nCommunities` contiguous equal blocks of
    * [0, nNodes), `intraEdges` draws whose endpoints land inside one
    * (hash-chosen) block and `interEdges` uniform noise draws across the
    * whole id space. The planted assignment is the ground truth the
    * community-recovery loop (fit → `communities` → `scoreCommunities`)
    * is measured against — the synthetic stand-in for SNAP's
    * `com-*.all.cmty.txt` files the reference's datasets ship with
    * (offline container). Deterministic in (nNodes, nCommunities,
    * intraEdges, interEdges, seed) by the same edge-index-hash
    * construction as [[powerLawEdges]]; same output convention (single
    *-direction rows, self-loops dropped, duplicate draws collapsed).
    */
  def plantedPartitionEdges(s: SparkSession, nNodes: Long, nCommunities: Int,
      intraEdges: Long, interEdges: Long, seed: Long = 42L): DataFrame = {
    require(nNodes >= nCommunities && nCommunities >= 1, "need nNodes >= nCommunities >= 1")
    require(intraEdges > 0, "need at least one intra-community edge draw")
    require(interEdges >= 0, "inter-community edge draws must be >= 0")
    val blockSize = (nNodes + nCommunities - 1) / nCommunities
    def h(salt: Int) = xxhash64(col("id"), lit(seed), lit(salt))
    // intra draw: pick a block, then two uniform offsets within it (the last
    // block can be short when nCommunities does not divide nNodes)
    val block = pmod(h(10), lit(nCommunities.toLong))
    val start = block * lit(blockSize)
    val size = least(lit(blockSize), lit(nNodes) - start)
    val intra = s.range(intraEdges).select(
      (start + pmod(h(11), size)).as("src"),
      (start + pmod(h(12), size)).as("dst"))
    val inter = s.range(interEdges).select(
      pmod(h(13), lit(nNodes)).as("src"),
      pmod(h(14), lit(nNodes)).as("dst"))
    intra.unionAll(inter)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** The ground-truth (community, node) assignment matching
    * [[plantedPartitionEdges]]' blocks, in `scoreCommunities`' truth shape. */
  def plantedTruth(s: SparkSession, nNodes: Long, nCommunities: Int): DataFrame = {
    val blockSize = (nNodes + nCommunities - 1) / nCommunities
    s.range(nNodes).select(
      expr(s"id DIV $blockSize").as("community"), col("id").as("node"))
  }
}
