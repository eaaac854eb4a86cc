package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.bigclam.BigClam

/** The engine against the reference's own bundled dataset
  * (facebook_combined: 4,039 nodes / 88,234 undirected edges, read-only) —
  * the loader contract, graph primitives at real scale, and a short
  * BigCLAM fit on a subgraph.
  */
class RealGraphSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val path = "/root/reference/data/facebook_combined.txt"

  private def available = new java.io.File(path).exists()

  test("edge-list loader reads facebook_combined with the documented counts") {
    assume(available)
    val raw = GraphOps.loadEdgeList(s, path)
    assert(raw.count() == 88234)
    val sym = GraphOps.symEdges(raw)
    assert(sym.count() == 2 * 88234) // each pair listed once in the file
    assert(GraphOps.degrees(sym).count() == 4039)
  }

  test("conductance + seeding run on the full real graph") {
    assume(available)
    val sym = GraphOps.symEdges(GraphOps.loadEdgeList(s, path)).cache()
    val phi = GraphOps.conductance(sym).cache()
    assert(phi.count() == 4039)
    val bad = phi.filter(col("phi") < 0).count()
    assert(bad == 0)
    val seeds = GraphOps.seedRank(sym)
    assert(seeds.count() > 0 && seeds.count() <= 4039)
    phi.unpersist(); sym.unpersist()
  }

  test("BigCLAM fit runs on a real subgraph with finite non-decreasing-ish LLH") {
    assume(available)
    // induced subgraph on the first 600 node ids — a connected Facebook
    // ego-net region, big enough to be honest, small enough for CI
    val raw = GraphOps.loadEdgeList(s, path)
      .filter(col("src") < 600 && col("dst") < 600)
    val sym = GraphOps.symEdges(raw).cache()
    val (f, hist) = BigClam.fit(sym, BigClam.Params(k = 4), iterations = 2)
    assert(hist.forall(v => !v.isNaN && !v.isInfinite))
    assert(hist.last > hist.head) // net ascent over the fit
    val nNodes = sym.select("src").distinct().count()
    assert(f.count() == nNodes)
    sym.unpersist()
  }
}
