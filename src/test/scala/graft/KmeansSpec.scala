package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Spherical k-means invariants: the cluster assignment partitions the
  * vector set, Lloyd refinement does not lose cohesion versus the
  * unrefined seed centroids, and the declared query's stats are
  * self-consistent. */
class KmeansSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def nVectors: Long = Tables.embeddings(s, TestSpark.sf).count()

  test("q_cluster_kmeans partitions all vectors into at most 16 cohesive clusters") {
    val rows = VectorOps.q_cluster_kmeans(s, TestSpark.sf).collect()
    assert(rows.length <= 16 && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nVectors)
    rows.foreach { r =>
      val c = r.getAs[Double]("avg_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"avg_cos out of range: $c")
    }
    // deterministic across invocations
    val again = VectorOps.q_cluster_kmeans(s, TestSpark.sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("Lloyd refinement does not lose total cohesion vs the unrefined seeds") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    def cohesion(iters: Int): Double = {
      val cents = VectorOps.kmeansCentroids(emb, 16, iters)
      // total cosine to the assigned (nearest) centroid — k-means' spherical
      // objective; refinement must not decrease it
      val sims = cents.map { case (cid, cv, cnrm) =>
        val lcv = array(cv.map(lit).toIndexedSeq: _*)
        VectorOps.dot(col("v"), lcv) / (col("nrm") * lit(cnrm))
      }
      emb.select(greatest(sims.toIndexedSeq: _*).as("best"))
        .agg(sum(col("best"))).collect()(0).getDouble(0)
    }
    val c0 = cohesion(0)
    val c2 = cohesion(2)
    assert(c2 >= c0 - 1e-6, s"refinement lost cohesion: $c0 -> $c2")
  }

  test("q_dedup_semantic: every vector labeled once; canonical = min member; sizes consistent") {
    val rows = VectorOps.q_dedup_semantic(s, TestSpark.sf).collect()
    assert(rows.length == nVectors, "labeling must cover every vector exactly once")
    val byCanon = rows.groupBy(_.getAs[Long]("canonical_id"))
    byCanon.foreach { case (canon, members) =>
      // canonical id IS the minimum member id (hash-min CC + keep-one rule)
      assert(members.map(_.getAs[Long]("vec_id")).min == canon)
      // every member agrees on the cluster size, and it is the real size
      members.foreach(m => assert(m.getAs[Long]("n_cluster") == members.length))
      assert(members.count(_.getAs[Boolean]("is_canonical")) == 1)
    }
    // the synthetic table has same-label near-dups: something must merge
    assert(byCanon.exists(_._2.length >= 2), "no dup clusters found at all")
  }

  test("semantic dedup invariants: identical vectors always merge, orthogonal never, zero-norm quarantined") {
    import s.implicits._
    // identical pairs (10<->11, 20<->21), an orthogonal singleton, a
    // zero-norm vector, spread across enough filler that k-means runs
    val base = Seq(
      // ids 0-1 exist because the k-means seed centroids are the vectors
      // with vec_id < nClusters
      (0L, Array(0.5, 0.5, 0.0, 0.0)),
      (1L, Array(0.0, 0.5, 0.5, 0.0)),
      (10L, Array(1.0, 0.0, 0.0, 0.0)),
      (11L, Array(1.0, 0.0, 0.0, 0.0)),  // identical to 10
      (20L, Array(0.0, 2.0, 0.0, 0.0)),
      (21L, Array(0.0, 2.0, 0.0, 0.0)),  // identical to 20 (other direction)
      (30L, Array(0.0, 0.0, 3.0, 0.0)),  // orthogonal to everything kept
      (40L, Array(0.0, 0.0, 0.0, 0.0)))  // zero norm: quarantine
    val emb = base.toDF("vec_id", "v")
    val out = VectorOps.semanticDedupLabels(emb, nClusters = 2, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_cluster"))).toMap
    assert(out.size == 8)
    // identical vectors merge to the min id regardless of clustering
    assert(out(10L) == (10L, 2L) && out(11L) == (10L, 2L))
    assert(out(20L) == (20L, 2L) && out(21L) == (20L, 2L))
    // orthogonal vector never merges with anything
    assert(out(30L) == (30L, 1L))
    // zero-norm vector is its own singleton, not NaN-poisoned
    assert(out(40L) == (40L, 1L))
  }

  test("q_dedup_semantic_bucketed: refines the unbucketed labeling; same output contract") {
    val rows = VectorOps.q_dedup_semantic_bucketed(s, TestSpark.sf).collect()
    // same shape contract as the unbucketed query
    assert(rows.length == nVectors, "labeling must cover every vector exactly once")
    rows.groupBy(_.getAs[Long]("canonical_id")).foreach { case (canon, members) =>
      assert(members.map(_.getAs[Long]("vec_id")).min == canon)
      members.foreach(m => assert(m.getAs[Long]("n_cluster") == members.length))
      assert(members.count(_.getAs[Boolean]("is_canonical")) == 1)
    }
    // REFINEMENT: sub-bucketing only removes candidate pairs, so every
    // bucketed cluster must sit inside exactly one unbucketed cluster
    val unbucketed = VectorOps.q_dedup_semantic(s, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("canonical_id")).toMap
    rows.groupBy(_.getAs[Long]("canonical_id")).foreach { case (canon, members) =>
      val parents = members.map(m => unbucketed(m.getAs[Long]("vec_id"))).toSet
      assert(parents.size == 1,
        s"bucketed cluster $canon straddles unbucketed clusters $parents")
    }
    // determinism across invocations (seeded hyperplanes, no rand())
    val again = VectorOps.q_dedup_semantic_bucketed(s, TestSpark.sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("bucketed semantic dedup: exact copies share every sign bit and still merge") {
    import s.implicits._
    val base = Seq(
      (0L, Array(0.5, 0.5, 0.0, 0.0)),
      (1L, Array(0.0, 0.5, 0.5, 0.0)),
      (10L, Array(1.0, 0.0, 0.0, 0.0)),
      (11L, Array(1.0, 0.0, 0.0, 0.0)),  // identical to 10
      (20L, Array(0.0, 2.0, 0.0, 0.0)),
      (21L, Array(0.0, 2.0, 0.0, 0.0)),  // identical to 20
      (30L, Array(0.0, 0.0, 3.0, 0.0)),
      (40L, Array(0.0, 0.0, 0.0, 0.0)))  // zero norm: quarantine
    val out = VectorOps.semanticDedupLabels(base.toDF("vec_id", "v"),
      nClusters = 2, threshold = 0.9,
      subPlanes = VectorOps.hyperplanes(nBits = 4, dim = 4))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_cluster"))).toMap
    // identical vectors have identical sign patterns — the sub-bucket can
    // NEVER separate an exact copy from its original
    assert(out(10L) == (10L, 2L) && out(11L) == (10L, 2L))
    assert(out(20L) == (20L, 2L) && out(21L) == (20L, 2L))
    assert(out(30L) == (30L, 1L))
    assert(out(40L) == (40L, 1L))
  }
}
