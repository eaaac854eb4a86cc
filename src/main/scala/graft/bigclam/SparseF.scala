package graft.bigclam

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sparse factor representation — the v3 path for large K
  * (/root/reference/codes/bigclamv3-7.scala:17,86 uses breeze SparseVector
  * for K≈8,385). Spark has no sparse SQL type, so a row's factors are a
  * pair of parallel arrays (indices ARRAY<INT>, values ARRAY<DOUBLE>),
  * kept sorted by index.
  *
  * At 100 TB/large-K this is the difference between shuffling K doubles per
  * node (dense, K=10⁴ → 80 KB/row) and shuffling only the non-zero
  * communities (≈ node degree after conductance init). All kernels stay
  * codegen-able column expressions — no UDFs.
  */
object SparseF {

  /** dense ARRAY<DOUBLE> → (indices, values) of the non-zero entries. */
  def toSparseIdx(dense: Column): Column =
    filter(
      transform(dense, (v, i) => struct(i.cast("int").as("i"), v.as("v"))),
      s => s.getField("v") =!= 0.0)

  def sparseIndices(dense: Column): Column =
    transform(toSparseIdx(dense), s => s.getField("i"))

  def sparseValues(dense: Column): Column =
    transform(toSparseIdx(dense), s => s.getField("v"))

  /** (indices, values, k) → dense ARRAY<DOUBLE> of length k. */
  def toDense(indices: Column, values: Column, k: Int): Column = {
    val m = map_from_arrays(indices, values)
    transform(sequence(lit(0), lit(k - 1)),
      i => coalesce(element_at(m, i.cast("int")), lit(0.0)))
  }

  /** Support cap: keep the `m` largest-|v| entries of a sparse row (ties →
    * lowest index, so the prune is deterministic), re-sorted by index.
    * Returns ARRAY<STRUCT<i,v>>.
    *
    * This is the BigCLAM "score only the candidate communities" practice
    * applied to the row representation: without it a row's support densifies
    * toward K within ~2 iterations (a hub's gradient support is the union
    * of its neighbors' supports) and the sparse kernels degenerate to dense
    * cost. One narrow O(nnz log nnz) per-row sort — no shuffle. */
  def topMByMagnitude(indices: Column, values: Column, m: Int): Column = {
    val zipped = zip_with(indices, values, (i, v) => struct(i.as("i"), v.as("v")))
    val picked = slice(
      array_sort(zipped, (l, r) =>
        when(abs(l.getField("v")) > abs(r.getField("v")), -1)
          .when(abs(l.getField("v")) < abs(r.getField("v")), 1)
          .when(l.getField("i") < r.getField("i"), -1)
          .when(l.getField("i") > r.getField("i"), 1)
          .otherwise(0)),
      1, m)
    // struct default ordering sorts by the first field — back to index order
    array_sort(picked)
  }

  /** Community index of the row's largest factor value (first max — with
    * `fi` sorted ascending, the lowest community id wins ties); −1 for a
    * row with no support. This is the membership observable behind the
    * stability stop rule: the 100k-node planted recovery showed argmax
    * membership keeps moving long after the LLH curve flattens (F1 0.077 at
    * 8 iterations vs 0.854 at 20 despite <2%/iter LLH gains), so community
    * fits should stop on the stability of THIS value, not on LLH deltas. */
  def argmaxIndex(indices: Column, values: Column): Column =
    coalesce(
      element_at(indices, array_position(values, array_max(values)).cast("int")),
      lit(-1))

  /** Sparse·sparse dot product: walk the shorter side, probe the other via
    * a map literal — O(nnz) per row, null-safe on missing keys (replaces
    * the reference's try/catch Flookup, bigclamv3-7.scala:94-104). */
  def sparseDot(ai: Column, av: Column, bi: Column, bv: Column): Column = {
    val mb = map_from_arrays(bi, bv)
    aggregate(
      zip_with(ai, av, (i, v) => v * coalesce(element_at(mb, i), lit(0.0))),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Sparse axpy: a + t·g over the union of index sets, re-sparsified and
    * clipped to [lo, hi] (the projected-gradient step on sparse rows). */
  def sparseAxpyClip(ai: Column, av: Column, gi: Column, gv: Column,
      t: Column, lo: Double, hi: Double): Column = {
    val ma = map_from_arrays(ai, av)
    val mg = map_from_arrays(gi, gv)
    val union = array_sort(array_union(ai, gi))
    filter(
      transform(union, i => struct(
        i.as("i"),
        least(greatest(
          coalesce(element_at(ma, i), lit(0.0)) + t * coalesce(element_at(mg, i), lit(0.0)),
          lit(lo)), lit(hi)).as("v"))),
      s => s.getField("v") =!= 0.0)
  }
}
