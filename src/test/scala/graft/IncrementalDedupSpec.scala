package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.IncrementalDedup

/** Persisted-state incremental dedup: batch semantics, cross-batch index
  * correctness, and batch-vs-streaming (foreachBatch) label equality. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // two "arrival batches": batch 1 carries an exact copy of doc 1, a
  // near-dup of doc 2 (>=0.5 shingle Jaccard), and a fresh doc
  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val batch0 = Seq(
    1L -> base,
    2L -> (base + " phi chi psi omega one two three four"),
    3L -> "completely different words with no overlap at all here today ok")
  private val batch1 = Seq(
    11L -> base, // exact copy of doc 1
    12L -> (base + " phi chi psi omega one two three nine"), // near-dup of 2
    13L -> "another unrelated document nothing shared with any other text")

  test("batch 1 dedups against batch 0's accumulated state") {
    val r0 = IncrementalDedup.processBatch(mkDocs(batch0),
      IncrementalDedup.emptyState(spark))
    val d0 = r0.decisions.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d0.values.forall(_._3 == 1L), s"empty-state batch must keep all: $d0")
    val st1 = IncrementalDedup.State(
      r0.acceptedHashes.localCheckpoint(true),
      r0.acceptedPostings.localCheckpoint(true))
    val r1 = IncrementalDedup.processBatch(mkDocs(batch1), st1)
    val d1 = r1.decisions.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d1(11L)._1 == 1L && d1(11L)._3 == 0L, s"exact copy not caught: $d1")
    assert(d1(12L)._2 >= 1L && d1(12L)._3 == 0L, s"near-dup not caught: $d1")
    assert(d1(13L) == (0L, 0L, 1L), s"fresh doc not kept: $d1")
    // accepted delta covers exactly the kept docs
    assert(r1.acceptedHashes.count() == 1L)
    assert(r1.acceptedPostings.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(13L))
  }

  test("in-batch exact dedup keeps the min doc_id") {
    val dup = mkDocs(Seq(5L -> base, 4L -> base, 6L -> ("something else entirely " +
      "unrelated to everything and then some more words")))
    val r = IncrementalDedup.processBatch(dup, IncrementalDedup.emptyState(spark))
    val d = r.decisions.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(d(4L) == (0L, 1L), "min-id copy must be the keeper")
    assert(d(5L) == (1L, 0L), "higher-id copy must be exact-flagged")
    assert(d(6L) == (0L, 1L))
  }

  test("foreachBatch streaming flow produces the same labels as batch runs") {
    import spark.implicits._
    // batch-sequential reference
    val r0 = IncrementalDedup.processBatch(mkDocs(batch0),
      IncrementalDedup.emptyState(spark))
    val st1 = IncrementalDedup.State(
      r0.acceptedHashes.localCheckpoint(true),
      r0.acceptedPostings.localCheckpoint(true))
    val r1 = IncrementalDedup.processBatch(mkDocs(batch1), st1)
    val want = (r0.decisions.collect() ++ r1.decisions.collect())
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // streaming flow: one micro-batch per arrival, state accumulated in
    // foreachBatch exactly as a production writer would (the state frames
    // are localCheckpointed — materialize-before-mutate, the same rule
    // appendState enforces on disk)
    implicit val sqlCtx = spark.sqlContext
    var state = IncrementalDedup.emptyState(spark)
    val got = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!df.isEmpty) {
          val r = IncrementalDedup.processBatch(df, state)
          r.decisions.collect().foreach(row => got(row.getLong(0)) =
            (row.getLong(1), row.getLong(2), row.getLong(3)))
          state = IncrementalDedup.State(
            state.hashes.unionByName(r.acceptedHashes).localCheckpoint(true),
            state.postings.unionByName(r.acceptedPostings).localCheckpoint(true))
        }
      }
      .start()
    try {
      mem.addData(batch0: _*); q.processAllAvailable()
      mem.addData(batch1: _*); q.processAllAvailable()
    } finally q.stop()
    assert(got.toMap == want,
      s"streaming labels diverged from batch labels:\n$got\nvs\n$want")
  }
}
