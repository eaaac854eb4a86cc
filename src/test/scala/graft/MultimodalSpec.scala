package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalOps

/** Multimodal plumbing invariants: the stub decode is deterministic and the
  * Spark-side schema/partition/batch shapes are real even though the codec
  * is faked (brief: stub the decode, make the plumbing real and tested).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("media table has binary payload + typed metadata struct") {
    val m = MultimodalOps.mediaTable(s, sf)
    assert(m.schema("media").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    val kinds = m.select(col("meta.kind")).distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("stub features: L1-normalized histogram, n_bytes matches payload") {
    // output is exploded (media_id, n_bytes, bin, value) scalar rows
    val rows = MultimodalOps.q_multimodal_features(s, sf)
      .limit(50 * MultimodalOps.FEATURE_DIM).collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.foreach { case (_, bins) =>
      assert(bins.length == MultimodalOps.FEATURE_DIM)
      val total = bins.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-3, s"histogram not normalized: $total")
      assert(bins.forall(_.getInt(1) > 0))
    }
    // deterministic across runs
    val again = MultimodalOps.q_multimodal_features(s, sf)
      .limit(50 * MultimodalOps.FEATURE_DIM).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("frame sampling yields fixed-size frames with ordinal numbering") {
    val frames = MultimodalOps.frameSample(MultimodalOps.mediaTable(s, sf))
    val r = frames.agg(
      min(length(col("frame"))), max(length(col("frame"))), min(col("frame_no"))).collect()(0)
    assert(r.getInt(0) == 16 && r.getInt(1) == 16 && r.getInt(2) == 0)
  }

  test("resize bounds payload size") {
    val resized = MultimodalOps.resizeStub(MultimodalOps.mediaTable(s, sf), 32)
    assert(resized.agg(max(length(col("media")))).collect()(0).getInt(0) <= 32)
  }
}
