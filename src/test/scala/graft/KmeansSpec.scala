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
}
