package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Product-quantization invariants: deterministic codes, exact copies
  * share codes, MSE is a true squared error (≥ 0, 0 for a vector that IS
  * a concatenation of centroids), and 2 Lloyd rounds reconstruct no worse
  * than the raw seed codebooks (the monotone within-cluster-SS property
  * of Lloyd's algorithm — each assign and each update step can only lower
  * total squared error). */
class PqSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  test("q_embed_pq: coverage, mse >= 0, deterministic") {
    val rows = VectorOps.q_embed_pq(s, TestSpark.sf).collect()
    val n = Tables.embeddings(s, TestSpark.sf).count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getAs[Double]("mse") >= 0.0, s"negative mse: $r")
      // 8 comma-joined nibble codes in [0, 16)
      val codes = r.getAs[String]("pq_code").split(",").map(_.toInt)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    }
    val again = VectorOps.q_embed_pq(s, TestSpark.sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("exact copies share codes; a seed vector reconstructs near-exactly at iters=0") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val v7 = emb.filter(col("vec_id") === 7L).collect().head.getSeq[Double](1).toArray
    val withCopy = emb.unionByName(Seq((100007L, v7)).toDF("vec_id", "v"))
    val out = VectorOps.pqAudit(withCopy, iters = 0).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("pq_code"), r.getAs[Double]("mse"))).toMap
    // identical input -> identical codes and identical mse
    assert(out(7L) == out(100007L))
    // at iters=0 the codebooks ARE the first 16 vectors' subvectors, so
    // vector 7 quantizes onto itself: every subspace distance is 0
    assert(out(7L)._2 == 0.0, s"seed vector should reconstruct exactly: ${out(7L)}")
  }

  test("2 Lloyd rounds reconstruct no worse than the raw seed codebooks") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def totalMse(iters: Int): Double =
      VectorOps.pqAudit(emb, iters)
        .agg(sum(col("mse"))).collect().head.getDouble(0)
    val m0 = totalMse(0)
    val m2 = totalMse(2)
    assert(m2 <= m0 + 1e-9, s"Lloyd lost reconstruction quality: $m0 -> $m2")
  }
}
