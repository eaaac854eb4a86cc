package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Paper-checkable facts on the two-triangles-plus-bridge graph
  * (FIXTURES.md §C): edges {(0,1),(1,2),(0,2),(3,4),(4,5),(3,5),(2,3)}.
  * Known: degrees {0:2,1:2,2:3,3:3,4:2,5:2}, total volume 14, φ(0)=1/6.
  */
class ToyGraphSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private lazy val edges = GraphOps.symEdges(
    Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
      .toDF("src", "dst"))

  test("degrees match hand computation") {
    val deg = GraphOps.degrees(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(0L -> 2, 1L -> 2, 2L -> 3, 3L -> 3, 4L -> 2, 5L -> 2))
  }

  test("conductance of node 0 ego net is 1/6 and guards hold") {
    val phi = GraphOps.conductance(edges)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("phi")).toMap
    assert(math.abs(phi(0L) - 1.0 / 6.0) < 1e-12)
    // symmetric graph: node 5 mirrors node 0
    assert(math.abs(phi(5L) - 1.0 / 6.0) < 1e-12)
    // ego of bridge endpoint 2 = {0,1,2,3}: cut=2 (3-4,3-5), internal
    // endpoints vol_s=8, vol_t=14-8-4=2 -> phi=2/min(8,2)=1
    assert(math.abs(phi(2L) - 1.0) < 1e-12)
    assert(phi.values.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("triangle counts: each toy node sits in exactly its own triangle") {
    val proj = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
      .toDF("u", "v")
    val tc = GraphOps.triangleCounts(proj)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_triangles")).toMap
    // triangles (0,1,2) and (3,4,5); the bridge (2,3) closes nothing
    assert(tc == Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("connected components: bridged toy is one component; cut bridge gives two") {
    // full toy graph: the bridge (2,3) joins both triangles -> one component, min id 0
    val one = GraphOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == (0L to 5L).map(_ -> 0L).toMap)
    // drop the bridge: triangles {0,1,2} and {3,4,5} labeled by their minima
    val cutEdges = GraphOps.symEdges(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L))
        .toDF("src", "dst"))
    val two = GraphOps.connectedComponents(cutEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 3L))
  }

  test("connected components converge on a path graph (diameter-bound rounds)") {
    // 0-1-2-...-9 path: worst case for hash-min (label 0 must walk the chain)
    val path = GraphOps.symEdges(
      (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst"))
    val labels = GraphOps.connectedComponents(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (0L to 9L).map(_ -> 0L).toMap)
  }

  test("connected components: 60-node path converges under the default cap (pointer jumping)") {
    // plain hash-min needs 59 rounds here — past the 50-round default cap
    // (the silent-wrong-answer hazard before fail-loudly, the throw after);
    // label doubling converges in O(log diameter) rounds. driverMaxRows=-1
    // forces the DISTRIBUTED fixpoint (the small toy would otherwise take
    // the driver union-find fast path and test nothing).
    val path = GraphOps.symEdges(
      (0L until 59L).map(i => (i, i + 1)).toDF("src", "dst"))
    val labels = GraphOps.connectedComponents(path, driverMaxRows = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == (0L to 59L).map(_ -> 0L).toMap)
  }

  test("connected components fail loudly at the iteration cap instead of returning wrong labels") {
    // a 12-node path needs ~11 hash-min rounds; cap at 3 must throw, not
    // silently return a split component (distributed path forced — the
    // driver union-find has no cap to trip)
    val path = GraphOps.symEdges(
      (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst"))
    val e = intercept[IllegalStateException] {
      GraphOps.connectedComponents(path, maxIter = 3, driverMaxRows = -1L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("cc size dispatch: driver union-find and distributed fixpoint label identically") {
    // the r17 fast path must be invisible in results: same (node, comp =
    // min member id) pairs on a multi-component graph either way
    val g = GraphOps.symEdges(
      (Seq((0L, 1L), (1L, 2L), (0L, 2L), (7L, 9L), (9L, 11L)) ++
        (20L until 29L).map(i => (i, i + 1))).toDF("src", "dst"))
    val viaDriver = GraphOps.connectedComponents(g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = GraphOps.connectedComponents(g, driverMaxRows = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(2L) == 0L && viaDriver(11L) == 7L && viaDriver(29L) == 20L)
  }

  test("empty edge input: cc yields empty labels (no NPE), pagerank yields empty ranks (no NaN)") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.connectedComponents(empty).count() == 0)
    assert(GraphOps.pageRank(empty).count() == 0)
  }

  test("pagerank: uniform on a symmetric triangle, mass conserved, bridge graph ranks degree") {
    // triangle is vertex-transitive -> all ranks equal; total mass ~ 1
    val tri = GraphOps.symEdges(Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst"))
    val prTri = GraphOps.pageRank(tri).collect().map(_.getAs[Double]("pr"))
    assert(prTri.distinct.length == 1, s"triangle ranks not uniform: ${prTri.toSeq}")
    assert(math.abs(prTri.sum - 1.0) < 1e-9)
    // on the bridged toy graph the degree-3 bridge endpoints (2,3) outrank
    // the degree-2 nodes
    val pr = GraphOps.pageRank(edges)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr")).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(2L) > pr(0L) && pr(3L) > pr(4L))
  }

  test("seed rank prefers the triangle interiors over the bridge") {
    val ranked = GraphOps.seedRank(edges).orderBy(col("phi"), col("seed"))
      .collect().map(_.getAs[Long]("seed"))
    // all minimal-phi candidates are triangle nodes, not bridge endpoints 2/3
    assert(ranked.nonEmpty)
    assert(!Set(2L, 3L).contains(ranked.head))
  }

  test("k-core peeling: toy graph hand-checked at k=2 and k=3; pendant drops") {
    // every toy node has degree >= 2, so the 2-core is the whole graph with
    // core_deg = original degree
    val core2 = GraphOps.kcore(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == Map(0L -> 2, 1L -> 2, 2L -> 3, 3L -> 3, 4L -> 2, 5L -> 2))
    // k=3: peeling the degree-2 nodes leaves only the bridge (2,3), whose
    // endpoints then have degree 1 -> the 3-core is empty
    assert(GraphOps.kcore(edges, 3).count() == 0L)
    // a pendant node hanging off a triangle is peeled; the triangle stays
    val withPendant = GraphOps.symEdges(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 6L)).toDF("src", "dst"))
    val core2p = GraphOps.kcore(withPendant, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2p == Map(0L -> 2, 1L -> 2, 2L -> 2))
    // empty input is already stable
    assert(GraphOps.kcore(edges.filter(col("src") > 100), 2).count() == 0L)
  }

  test("BFS hop distances hand-checked on the bridged toy graph") {
    // from node 0: triangle mates at 1 hop, bridge endpoint 3 at 2 hops
    // (through 2), far triangle at 3
    val d = GraphOps.bfsDepth(edges, 0L, 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 3))
    // depth cap truncates the frontier: maxDepth=1 reaches only the ego net
    val capped = GraphOps.bfsDepth(edges, 0L, 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped == Map(0L -> 0, 1L -> 1, 2L -> 1))
    // unreachable source component: BFS from an isolated id returns just it
    val lone = GraphOps.bfsDepth(edges.filter(col("src") < 3 && col("dst") < 3), 5L, 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lone == Map(5L -> 0))
  }

  test("bfs/kcore size dispatch: distributed loops label identically to the driver path") {
    // the toy graphs above all take the driver fast path; force the
    // distributed loops here and pin equality on the same fixtures
    val dLoop = GraphOps.bfsDepth(edges, 0L, 10, driverMaxRows = -1L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dLoop == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 3))
    val coreLoop = GraphOps.kcore(edges, 2, driverMaxRows = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(coreLoop == Map(0L -> 2, 1L -> 2, 2L -> 3, 3L -> 3, 4L -> 2, 5L -> 2))
    assert(GraphOps.kcore(edges, 3, driverMaxRows = -1L).count() == 0L)
  }

  test("flatCheckpoint saturates inherited stats: no exponential compounding across rounds") {
    // size-only estimation multiplies child sizes, so 12 rounds of
    // self-join + checkpoint would compound the leaf estimate ~2^12-fold
    // per round (million-digit BigIntegers by round ~10, the BigCLAM
    // checkpointF lesson) — the bridge clamp must keep it word-sized
    var df = (0L until 100L).toDF("x")
    for (_ <- 1 to 12) {
      val joined = df.join(df.withColumnRenamed("x", "y"), col("x") === col("y"))
        .select("x")
      df = org.apache.spark.sql.graftbridge.Bridge.flatCheckpoint(joined)
    }
    val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sz <= BigInt(Long.MaxValue / 2), s"stats compounded: $sz")
    assert(df.count() == 100L)
  }

  test("q_graph_kcore: every surviving node keeps degree >= 3 in the core") {
    val rows = GraphOps.q_graph_kcore(s, TestSpark.sf).collect()
    assert(rows.nonEmpty, "3-core of the bounded bipartite subgraph is empty")
    rows.foreach(r => assert(r.getAs[Long]("core_deg") >= 3L, s"below-k degree: $r"))
  }

  test("label propagation hand-traced: 3 rounds split the bridged triangles") {
    // synchronous LPA, most-frequent-neighbor tie->min, traced by hand:
    // l1 = {0:1,1:0,2:0,3:2,4:3,5:3}, l2 = {0:0,1:0,2:0,3:3,4:2,5:2},
    // l3 = {0:0,1:0,2:0,3:2,4:2,5:2} — the two triangles separate with
    // the bridge assigned to its own side
    val l = GraphOps.labelPropagation(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
    // deterministic across runs (the tie rule leaves no scheduler freedom)
    val l2 = GraphOps.labelPropagation(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == l2)
    // and identical through the forced DISTRIBUTED path (size dispatch)
    val lLoop = GraphOps.labelPropagation(edges, 3, driverMaxRows = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l == lLoop)
  }

  test("modularity hand-checked: two disjoint triangles") {
    // 2m = 12 directed rows, every node degree 2.
    // CC partition: W = 12, D_c = 6 per triangle -> Q = 1 - 72/144 = 0.5
    // singleton partition (node % 10, all ids distinct): W = 0,
    // D_c = 2 per node -> Q = 0 - 6*4/144 = -1/6
    val two = GraphOps.symEdges(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L))
        .toDF("src", "dst"))
    val cc = GraphOps.connectedComponents(two)
      .select(col("node"), col("comp").as("lab"))
    val qcc = GraphOps.modularity(two, cc, "cc").collect()(0)
    assert(qcc.getAs[Long]("n_parts") == 2 && qcc.getAs[Long]("m") == 6)
    assert(qcc.getAs[Double]("q") == 0.5)
    val singleton = two.select(col("src").as("node")).distinct()
      .select(col("node"), pmod(col("node"), lit(10L)).as("lab"))
    val qs = GraphOps.modularity(two, singleton, "s").collect()(0)
    assert(qs.getAs[Long]("n_parts") == 6)
    assert(math.abs(qs.getAs[Double]("q") - (-1.0 / 6)) < 1e-6)
  }
}
