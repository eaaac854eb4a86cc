package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.bigclam.{BigClam, SparseF}
import graft.graph.GraphOps

/** Property checks (SURVEY.md §5.3): the distributed BigCLAM kernels vs a
  * driver-side brute-force implementation of the same formulas on small
  * random graphs, gradient vs finite differences, and sparse-vs-dense
  * round trips. Seeded RNG only — deterministic across runs.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private val p = BigClam.Params(k = 3)

  private def clip(x: Double, lo: Double, hi: Double) = math.min(math.max(x, lo), hi)

  /** Brute-force per-node LLH, reference formula (Bigclamv2.scala:189-197). */
  private def bruteLlh(adj: Map[Long, Seq[Long]], f: Map[Long, Array[Double]],
      u: Long): Double = {
    val k = f.values.head.length
    val sumF = Array.tabulate(k)(i => f.values.map(_(i)).sum)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val fu = f(u)
    val neigh = adj(u).map { v =>
      val d = dot(fu, f(v))
      math.log(1.0 - clip(math.exp(-d), p.minP, p.maxP)) + d
    }.sum
    neigh - dot(fu, sumF) + dot(fu, fu)
  }

  private def randomGraph(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    val pairs = for {
      a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.4
    } yield (a.toLong, b.toLong)
    // ensure no isolated nodes: chain fallback
    pairs ++ (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
  }

  private def fixtures(seed: Int, n: Int) = {
    import s.implicits._
    val edges = GraphOps.symEdges(randomGraph(seed, n).toDF("src", "dst")).cache()
    val rnd = new Random(seed + 1)
    val fMap: Map[Long, Array[Double]] =
      (0 until n).map(i => i.toLong -> Array.fill(p.k)(rnd.nextDouble() * 2)).toMap
    val fDf = fMap.toSeq.map { case (id, arr) => (id, arr.toSeq) }
      .toDF("id", "f").select(col("id"), col("f").cast("array<double>").as("f"))
    val adj = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (edges, fDf, fMap, adj)
  }

  test("distributed LLH matches driver-side brute force on random graphs") {
    for (seed <- Seq(7, 21, 42)) {
      val (edges, fDf, fMap, adj) = fixtures(seed, 10)
      val states = BigClam.nodeStates(edges, fDf, p)
        .select("id", "llh").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((u, llh) <- states) {
        val expected = bruteLlh(adj, fMap, u)
        assert(math.abs(llh - expected) < 1e-8, s"seed=$seed node=$u: $llh vs $expected")
      }
    }
  }

  test("distributed gradient matches finite differences of the brute-force LLH") {
    val (edges, fDf, fMap, adj) = fixtures(11, 8)
    val grads = BigClam.nodeStates(edges, fDf, p)
      .select("id", "grad").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val h = 1e-6
    for (u <- fMap.keys; c <- 0 until p.k) {
      val fPlus = fMap.updated(u, { val a = fMap(u).clone(); a(c) += h; a })
      val fMinus = fMap.updated(u, { val a = fMap(u).clone(); a(c) -= h; a })
      // central difference of l(u) wrt F_u[c]; note sumF shifts with F_u
      val fd = (bruteLlh(adj, fPlus, u) - bruteLlh(adj, fMinus, u)) / (2 * h)
      assert(math.abs(grads(u)(c) - fd) < 1e-4,
        s"node=$u dim=$c: grad=${grads(u)(c)} fd=$fd")
    }
  }

  test("sparse gradient/LLH pass equals the dense kernel") {
    val (edges, fDf, fMap, _) = fixtures(33, 9)
    // sparsify: zero out ~half the entries, keep both representations
    import org.apache.spark.sql.functions.{col, when, expr}
    val fZeroed = fDf.select(col("id"),
      expr("transform(f, (x, i) -> CASE WHEN (id + i) % 2 = 0 THEN x ELSE 0.0 END)").as("f"))
    val fSparse = fZeroed.select(col("id"),
      SparseF.sparseIndices(col("f")).as("fi"), SparseF.sparseValues(col("f")).as("fv"))
    val sf = BigClam.sumF(fZeroed, p)
    val dense = BigClam.nodeStates(edges, fZeroed, p)
      .select("id", "llh", "grad").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Double](2))).toMap
    val sparse = BigClam.nodeStatesSparse(edges, fSparse, sf, p)
      .select("id", "llh", "grad").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Double](2))).toMap
    assert(dense.keySet == sparse.keySet)
    for (id <- dense.keys) {
      assert(math.abs(dense(id)._1 - sparse(id)._1) < 1e-9, s"llh differs at $id")
      dense(id)._2.zip(sparse(id)._2).zipWithIndex.foreach { case ((a, b), c) =>
        assert(math.abs(a - b) < 1e-9, s"grad differs at node $id dim $c: $a vs $b")
      }
    }
  }

  test("fitSparse matches fit: same LLH history and same F on toy graphs") {
    for (seed <- Seq(5, 19)) {
      val (edges, _, _, _) = fixtures(seed, 10)
      val (fd, hd) = BigClam.fit(edges, p, iterations = 3)
      val (fsRaw, hs) = BigClam.fitSparse(edges, p, iterations = 3)
      assert(hd.size == hs.size)
      hd.zip(hs).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a)),
          s"seed=$seed history diverged: dense=$hd sparse=$hs")
      }
      val dense = fd.select("id", "f").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val sparse = BigClam.toDenseF(fsRaw, p.k).select("id", "f").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(dense.keySet == sparse.keySet)
      for (id <- dense.keys; c <- 0 until p.k)
        assert(math.abs(dense(id)(c) - sparse(id)(c)) < 1e-6,
          s"seed=$seed F differs at node $id dim $c: ${dense(id)(c)} vs ${sparse(id)(c)}")
    }
  }

  test("argmaxIndex: first max wins ties via ascending fi; empty support is -1") {
    import s.implicits._
    val rows = Seq(
      (Seq(1, 4, 7), Seq(0.5, 2.0, 1.0), 4),  // plain max
      (Seq(2, 5, 9), Seq(3.0, 3.0, 1.0), 2),  // tie -> lowest community id
      (Seq.empty[Int], Seq.empty[Double], -1) // no support
    ).toDF("fi", "fv", "want")
    val bad = rows.filter(
      graft.bigclam.SparseF.argmaxIndex(col("fi"), col("fv")) =!= col("want"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("stableTol: tracking never perturbs the fit; a loose tolerance stops after one iteration") {
    val (edges, _, _, _) = fixtures(11, 10)
    val (fa, ha) = BigClam.fitSparse(edges, p, iterations = 3)
    val (fb, hb) = BigClam.fitSparse(edges, p, iterations = 3,
      stableTol = Some(0.0)) // churn fraction is never < 0 -> never stops
    // the tracked run adds read-only jobs (count + churn joins), which can
    // shift task completion order and with it the float-sum merge order of
    // the LLH aggregations — compare at relative 1e-12 (ulp-class), the
    // parity suite's convention for cross-run float reductions
    def close(x: Double, y: Double) = math.abs(x - y) <= 1e-12 * math.abs(y)
    assert(ha.size == hb.size && ha.zip(hb).forall((close _).tupled),
      s"stability tracking changed the fit: $ha vs $hb")
    val a = BigClam.toDenseF(fa, p.k).select("id", "f").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = BigClam.toDenseF(fb, p.k).select("id", "f").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet == b.keySet, "stability tracking changed F's node set")
    for (id <- a.keys)
      assert(a(id).zip(b(id)).forall { case (x, y) =>
        math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(y)) },
        s"stability tracking changed F at node $id: ${a(id)} vs ${b(id)}")
    // churn fraction is always <= 1 < 1.5: stops after iteration 1 -> the
    // tracked history is [llh before iter 1, final llh]
    val (_, h1) = BigClam.fitSparse(edges, p, iterations = 3,
      stableTol = Some(1.5))
    assert(h1.size == 2, s"loose tolerance did not stop after 1 iteration: $h1")
    assert(h1.zip(ha.take(2)).forall((close _).tupled),
      s"early-stopped prefix diverged: $h1 vs $ha")
  }

  test("fitSparse with supportCap >= K is exactly the uncapped fit") {
    val (edges, _, _, _) = fixtures(7, 10)
    val (fu, hu) = BigClam.fitSparse(edges, p, iterations = 3)
    val (fc, hc) = BigClam.fitSparse(edges, p, iterations = 3, supportCap = Some(p.k))
    // same merge-order caveat as the stall-backstop test: identical plans,
    // but cross-run float reductions compare at relative 1e-12, not ==
    def close(x: Double, y: Double) = math.abs(x - y) <= 1e-12 * math.abs(y)
    assert(hu.size == hc.size && hu.zip(hc).forall((close _).tupled),
      s"capped history diverged: $hu vs $hc")
    val a = BigClam.toDenseF(fu, p.k).select("id", "f").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = BigClam.toDenseF(fc, p.k).select("id", "f").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet == b.keySet, "capped F changed the node set")
    for (id <- a.keys)
      assert(a(id).zip(b(id)).forall { case (x, y) =>
        math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(y)) },
        s"capped F diverged from uncapped at node $id: ${a(id)} vs ${b(id)}")
  }

  test("topMByMagnitude keeps the m largest entries, index-sorted, ties to lower index") {
    val df = s.range(1).select(
      typedLit(Seq(3, 0, 7, 5)).as("i"),
      typedLit(Seq(0.5, -2.0, 0.5, 1.0)).as("v"))
    val out = df.select(SparseF.topMByMagnitude(col("i"), col("v"), 3).as("t"))
      .select(transform(col("t"), s => s.getField("i")).as("ti"),
        transform(col("t"), s => s.getField("v")).as("tv"))
      .collect()(0)
    // |−2.0| > |1.0| > |0.5| (tie between i=3 and i=7 → keep i=3)
    assert(out.getSeq[Int](0) == Seq(0, 3, 5), s"indices ${out.getSeq[Int](0)}")
    assert(out.getSeq[Double](1) == Seq(-2.0, 0.5, 1.0), s"values ${out.getSeq[Double](1)}")
  }

  test("sparse round-trip and sparse dot match dense") {
    val df = s.range(1).select(
      typedLit(Seq(0.0, 1.5, 0.0, 2.5, 0.0)).as("a"),
      typedLit(Seq(1.0, 0.0, 3.0, 4.0, 0.0)).as("b"))
    val r = df.select(
      SparseF.toDense(SparseF.sparseIndices(col("a")), SparseF.sparseValues(col("a")), 5).as("rt"),
      SparseF.sparseDot(
        SparseF.sparseIndices(col("a")), SparseF.sparseValues(col("a")),
        SparseF.sparseIndices(col("b")), SparseF.sparseValues(col("b"))).as("dot"))
      .collect()(0)
    assert(r.getSeq[Double](0) == Seq(0.0, 1.5, 0.0, 2.5, 0.0))
    assert(math.abs(r.getDouble(1) - 10.0) < 1e-12) // 2.5*4.0
  }

  test("sparse axpy-clip matches dense projected step") {
    val df = s.range(1).select(
      typedLit(Seq(0.0, 1.0, 2.0, 0.0)).as("a"),
      typedLit(Seq(5.0, -10.0, 0.0, 1.0)).as("g"))
    val out = df.select(SparseF.sparseAxpyClip(
      SparseF.sparseIndices(col("a")), SparseF.sparseValues(col("a")),
      SparseF.sparseIndices(col("g")), SparseF.sparseValues(col("g")),
      lit(0.5), 0.0, 1000.0).as("r")).collect()(0)
    // dense: clip([0+2.5, 1-5, 2+0, 0+0.5]) = [2.5, 0, 2, 0.5] → sparse
    val entries = out.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(entries == Map(0 -> 2.5, 2 -> 2.0, 3 -> 0.5))
  }

  test("llhTol fit returns the best measured iterate: LLH(F) = max(history)") {
    // uncapped fits are pure Armijo ascent → monotone → the max is the
    // last measure, and every stop path (consecutive rule, stall backstop,
    // budget) returns exactly that iterate; re-scoring the returned F must
    // reproduce it (same DECIMAL reduction, float-exact modulo merge order)
    for ((seed, tol) <- Seq((7, 1e-2), (21, 1e-3), (42, 1e-4))) {
      val (edges, _, _, _) = fixtures(seed, 10)
      val (fs, hist) = BigClam.fitSparse(edges, p, iterations = 25,
        llhTol = Some(tol))
      val llh = BigClam.llhSparse(edges, fs, p)
      val best = hist.max
      assert(math.abs(llh - best) <= 1e-9 * math.max(1.0, math.abs(best)),
        s"seed=$seed tol=$tol: returned F scores $llh, best measured $best, " +
          s"hist=$hist")
    }
    // capped fits can oscillate around the prune fixpoint; the convergence
    // rule itself only promises the returned iterate within tol·|best| of
    // the best measure (a consecutive-delta stop may land on a sub-tol dip)
    for (seed <- Seq(5, 19)) {
      val (edges, _, _, _) = fixtures(seed, 10)
      val tol = 1e-3
      val (fs, hist) = BigClam.fitSparse(edges, p, iterations = 60,
        llhTol = Some(tol), supportCap = Some(1))
      val llh = BigClam.llhSparse(edges, fs, p)
      val best = hist.max
      assert(llh >= best - tol * math.abs(best) - 1e-9,
        s"seed=$seed capped: returned F scores $llh, best measured $best, " +
          s"hist=$hist")
    }
  }

  test("stall backstop off vs on: monotone fits are identical to merge-order noise") {
    // the two runs execute the SAME plan, but float-sum merge order across
    // shuffle fetches is not pinned run-to-run (the stableTol test's lesson,
    // line ~147) — an exact `==` here is a latent flake (it tripped once
    // under heavy concurrent load, last-ulp diffs at 2 of 26 history
    // entries). Compare at relative 1e-12 (ulp-class), the parity suite's
    // convention for cross-run float reductions; the structural claims
    // (same history LENGTH — the backstop fired nowhere — and same sparse
    // SUPPORT) stay exact.
    def close(x: Double, y: Double) = math.abs(x - y) <= 1e-12 * math.abs(y)
    for (seed <- Seq(5, 19)) {
      val (edges, _, _, _) = fixtures(seed, 10)
      val (fa, ha) = BigClam.fitSparse(edges, p, iterations = 25,
        llhTol = Some(1e-3))
      val (fb, hb) = BigClam.fitSparse(edges, p, iterations = 25,
        llhTol = Some(1e-3), stallWindow = Int.MaxValue)
      assert(ha.size == hb.size && ha.zip(hb).forall((close _).tupled),
        s"seed=$seed: backstop changed the history: $ha vs $hb")
      val a = BigClam.toDenseF(fa, p.k).select("id", "f").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val b = BigClam.toDenseF(fb, p.k).select("id", "f").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(a.keySet == b.keySet, s"seed=$seed: backstop changed F's node set")
      for (id <- a.keys)
        assert(a(id).zip(b(id)).forall { case (x, y) =>
          math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(y)) },
          s"seed=$seed: backstop changed F at node $id: ${a(id)} vs ${b(id)}")
    }
  }

  test("RaceMemory over generated verdict streams: armed iff two consecutive " +
      "decisive same-side race verdicts (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    // verdict alphabet: a completed race with a controlled side and
    // decisiveness margin, or a non-race diag (manual init paths, which
    // RaceMemory must ignore). Decisive = |loser| >= 1.5 x |winner| —
    // generated strictly either side of the threshold so the property
    // never rides the boundary.
    sealed trait V
    final case class Race(side: String, decisive: Boolean) extends V
    case object NonRace extends V
    val genRace: Gen[V] = for {
      side <- Gen.oneOf("ego", "egosplit")
      decisive <- Gen.oneOf(true, false)
    } yield Race(side, decisive)
    val genV: Gen[V] = Gen.frequency(5 -> genRace, 1 -> Gen.const(NonRace))
    def toDiag(v: V, mag: Double): BigClam.InitDiag = v match {
      case NonRace => BigClam.InitDiag("ego", "ego", None)
      case Race(side, decisive) =>
        val ratio = if (decisive) 2.0 + (mag % 5.0) else 1.05 + (mag % 0.4)
        val w = 1e5 * (1.0 + (mag % 9.0)) // winner magnitude
        val (win, lose) = (-w, -w * ratio)
        if (side == "egosplit")
          BigClam.InitDiag("auto", side, None,
            egoLlh = Some(lose), splitLlh = Some(win))
        else
          BigClam.InitDiag("auto", side, None,
            egoLlh = Some(win), splitLlh = Some(lose))
    }
    // independent oracle, NOT the class's fold: with window = 2, armed <=>
    // some adjacent pair of RACE verdicts (non-race filtered out) is
    // decisive on the same side; the remembered side is the EARLIEST such
    // pair's — anything observed after arming must be ignored
    def oracle(stream: List[V]): Option[String] = {
      val races = stream.collect { case r: Race => r }
      races.zip(races.drop(1)).collectFirst {
        case (a, b) if a.decisive && b.decisive && a.side == b.side => a.side
      }
    }
    val prop = Prop.forAll(Gen.listOf(genV), Gen.choose(0.0, 1e4)) {
      (stream: List[V], jitter: Double) =>
        val m = new BigClam.RaceMemory()
        stream.zipWithIndex.foreach { case (v, i) =>
          m.observe(toDiag(v, jitter + i))
        }
        m.sticky == oracle(stream)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300)
      .withInitialSeed(Seed(20260816L)), prop)
    assert(res.passed, s"scalacheck: $res")
  }

  test("initSparse matches toSparse(init) row-for-row, incl. hash padding") {
    // k well above the seed count so rankTopSeeds returns fewer than k egos
    // and some nodes take the xxhash64 padding path in both implementations
    for (seed <- Seq(5, 17)) {
      val (edges, _, _, _) = fixtures(seed, 12)
      val pk = BigClam.Params(k = 20)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getSeq[Double](2).toList))
        .sortBy(_._1).toList
      val viaDense = rows(BigClam.toSparse(BigClam.init(edges, pk)))
      val direct = rows(BigClam.initSparse(edges, pk))
      assert(direct == viaDense)
      assert(direct.exists(_._2.nonEmpty))
    }
  }
}
