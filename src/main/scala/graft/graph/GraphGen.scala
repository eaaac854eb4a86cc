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

  /** AGM-style planted COVER — overlapping ground truth, the regime BigCLAM
    * exists for (Yang & Leskovec's affiliation-graph model; the reference's
    * threshold-δ assignment at Bigclamv2.scala:223-229 emits
    * multi-membership precisely because real covers overlap, but a disjoint
    * planted partition never exercises that half of the metric). Every node
    * gets one hash-chosen community; a hash-coin half get a second draw and
    * a quarter a third (duplicate draws collapse), so membership counts are
    * 1–3 with mean ≈ 1.6 and a guaranteed multi-membership mass.
    * Deterministic in (nNodes, nCommunities, seed); (community, node) rows
    * in `scoreCommunities`' truth shape. */
  def plantedCoverTruth(s: SparkSession, nNodes: Long, nCommunities: Int,
      seed: Long = 42L): DataFrame = {
    require(nNodes >= 1 && nCommunities >= 1, "need nNodes >= 1 and nCommunities >= 1")
    def h(salt: Int) = xxhash64(col("node"), lit(seed), lit(salt))
    val nodes = s.range(nNodes).select(col("id").as("node"))
    val m1 = nodes.select(col("node"), pmod(h(21), lit(nCommunities.toLong)).as("community"))
    val m2 = nodes.filter(pmod(h(22), lit(2L)) === 0)
      .select(col("node"), pmod(h(23), lit(nCommunities.toLong)).as("community"))
    val m3 = nodes.filter(pmod(h(24), lit(4L)) === 0)
      .select(col("node"), pmod(h(25), lit(nCommunities.toLong)).as("community"))
    m1.unionAll(m2).unionAll(m3).distinct()
      .select(col("community"), col("node"))
  }

  /** Edges drawn from the planted cover by the AGM link function:
    * P(u ~ v) = 1 − exp(−Fu·Fv) with F the planted indicator scaled so a
    * single shared community links with probability `pSingle` — i.e.
    * Fu·Fv = k·s², k = |comms(u) ∩ comms(v)|, s² = −ln(1−pSingle); sharing
    * more communities raises the edge probability exactly as the model the
    * fit maximizes assumes. `interEdges` uniform noise draws stand in for
    * AGM's ε-background community. Deterministic throughout: the coin for
    * pair (u,v) is the top-53-bit u01 of xxhash64(u,v,seed).
    *
    * Generation cost is Σ_c |M_c|² candidate pairs (the membership
    * self-join) — the inherent cost of materializing the AGM's shared-
    * community pair set, distributed by community key. That is the right
    * shape for sparse-community covers (bounded |M_c|); a dense-community
    * instance at scale would switch to per-community random pair DRAWS like
    * [[plantedPartitionEdges]] rather than enumerate candidates. Same
    * output convention as the other generators (single-direction rows,
    * self-loops dropped, duplicates collapsed). */
  def plantedCoverEdges(s: SparkSession, nNodes: Long, nCommunities: Int,
      pSingle: Double, interEdges: Long, seed: Long = 42L): DataFrame = {
    require(pSingle > 0.0 && pSingle < 1.0, "pSingle must be in (0,1)")
    require(interEdges >= 0, "inter-community edge draws must be >= 0")
    val s2 = -math.log(1.0 - pSingle)
    val m = plantedCoverTruth(s, nNodes, nCommunities, seed)
    val a = m.select(col("community"), col("node").as("u"))
    val b = m.select(col("community"), col("node").as("v"))
    val shared = a.join(b, Seq("community")).filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("k"))
    val u01 = shiftrightunsigned(xxhash64(col("u"), col("v"), lit(seed), lit(31)), 11)
      .cast("double") * lit(1.0 / (1L << 53))
    val intra = shared
      .filter(u01 < lit(1.0) - exp(-col("k") * lit(s2)))
      .select(col("u").as("src"), col("v").as("dst"))
    def hI(salt: Int) = xxhash64(col("id"), lit(seed), lit(salt))
    val inter = s.range(interEdges)
      .select(pmod(hI(32), lit(nNodes)).as("src"), pmod(hI(33), lit(nNodes)).as("dst"))
    intra.unionAll(inter)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }
}
