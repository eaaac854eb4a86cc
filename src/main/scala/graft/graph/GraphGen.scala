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
}
