package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.{GraphGen, GraphOps}
import graft.bigclam.BigClam

/** K-grid model selection on PLANTED ground truth — the validation the
  * unplanted power-law run cannot give (README "Two findings": on
  * hub-dominated structure raw LLH rises with K forever and the reference's
  * 1e-3 relative-gain stop never fires, so the walker honestly reports the
  * grid boundary). Here the graph is drawn from the AGM itself
  * (GraphGen.plantedCoverEdges — the exact generative model the fit
  * maximizes) with a KNOWN community count K*, so the LLH-vs-K curve has a
  * true answer to recover.
  *
  * Round-11 lesson baked in: a fixed iteration budget (40) + churn stop left
  * large-K fits systematically under-converged, so the curve compared
  * unequally-converged models and came back non-monotone (argmax at the grid
  * floor, recovery F1 0.43). The walk now converges EVERY grid point to the
  * reference's own relative-LLH rule (SGDFindC, bigclam4-7.scala:225-243:
  * |1 − LLH/LLHold| < 1e-4) with `fitIters` as a hard job budget, which is
  * what makes the cross-K comparison fair.
  *
  * Reference semantics: the v4 K-grid walk, bigclam4-7.scala:16-20,225-266.
  *
  *   runMain graft.RunSelectKPlanted <nNodes> <kStar> <pSingle> <interEdges>
  *     <minK> <maxK> <steps> <fitIters> [supportCap=16] [llhTol=1e-4]
  *     [hotDegCap=200] [heldFrac=0.1 — 0 skips the held-out walk]
  *
  * Four deliverables from one run:
  *  1. the full LLH-vs-K curve (no early stop), every K equally converged;
  *  2. the reference's kTol=1e-3 stopping rule REPLAYED on the curve — the
  *     SIGNED test of bigclam4-7.scala:259 ((1 − new/old) < 1e-3, which also
  *     fires on any LLH decrease) choosing the stop-point K itself (KforC);
  *  3. recovery scoring (best-match F1 + Omega) of the argmax-K fit AND of a
  *     fit at exactly K* — the latter is the achievable bar: if conductance
  *     seeding degenerates on planted covers, the K* fit shows it directly;
  *  4. a held-out selection walk (train on 90% of undirected pairs, score
  *     Bernoulli LLH on the held 10% + an equal non-edge sample) — the
  *     standard answer if raw training LLH still rises monotonically in K.
  */
object RunSelectKPlanted {
  def main(args: Array[String]): Unit = {
    if (args.length < 8) {
      System.err.println("usage: RunSelectKPlanted <nNodes> <kStar> " +
        "<pSingle> <interEdges> <minK> <maxK> <steps> <fitIters> " +
        "[supportCap=16] [llhTol=1e-4 — 0 disables] [hotDegCap=200] " +
        "[heldFrac=0.1 — 0 skips held-out walk] " +
        "[arms=all — comma list of grid,bar,warm,random,spread,staged," +
        "gridsplit,egosplit,egosplitlpa,egosplitlpa2x,egosplitlpa4x," +
        "egosplitlpanp,egosplitlpa2xnp,egosplitlpa4xnp,oraclepartial," +
        "oraclepartialnp,alloconly,allocdist,auto,gridauto,gridautomem," +
        "gridknee,restart,heldout,heldoutsplit; add nodiag to skip the " +
        "seed-coverage and oracle-bar preambles] " +
        "[kneeKTol=0.05 — gridknee arm's kTol, set BETWEEN the knee's " +
        "pre/post gains so the stop fires AT the knee]")
      sys.exit(2)
    }
    val nNodes = args(0).toLong
    val kStar = args(1).toInt
    val pSingle = args(2).toDouble
    val inter = args(3).toLong
    val minK = args(4).toInt
    val maxK = args(5).toInt
    val steps = args(6).toInt
    val iters = args(7).toInt
    val cap = args.lift(8).map(_.toInt).getOrElse(16)
    val llhTol = Some(args.lift(9).map(_.toDouble).getOrElse(1e-4)).filter(_ > 0)
    val hotCap = Some(args.lift(10).map(_.toLong).getOrElse(200L)).filter(_ > 0)
    val heldFrac = args.lift(11).map(_.toDouble).getOrElse(0.1)
    // comma-list arm filter (default all): grid,bar,warm,random,spread,
    // staged,heldout — lets a re-run execute one experiment arm without
    // paying the whole battery again
    val arms = args.lift(12).map(_.split(",").toSet).getOrElse(Set("all"))
    def arm(name: String): Boolean = arms("all") || arms(name)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9

    val truth = GraphGen.plantedCoverTruth(spark, nNodes, kStar)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edges = GraphOps.symEdges(
        GraphGen.plantedCoverEdges(spark, nNodes, kStar, pSingle, inter))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(f"[selectk*] $nNodes nodes, K*=$kStar planted, ${edges.count()} " +
      f"directed edge rows, pSingle=$pSingle ($secs%.0f s to generate)")

    // `nodiag` in the arm list skips the two unconditional preambles below
    // (top-K* seed coverage and the oracle LLH bar) — at the v3 scale shape
    // (115M edge rows) they are the two biggest shuffle/spill sources of
    // the whole battery and the alloconly arm doesn't read either
    val noDiag = arms("nodiag")

    // DIAGNOSTIC 1 — seeding degeneracy check: do the top-K* conductance
    // seeds actually spread over the planted communities, or do they pile
    // into a few dense blocks? (A degenerate seed cover explains a large-K
    // fit that converges into a poor optimum.)
    if (!noDiag) {
      val seedCov = GraphOps.rankTopSeeds(GraphOps.seedRank(edges, hotCap), kStar)
        .join(truth, col("seed") === col("node"))
        .agg(countDistinct(col("community")).as("cov")).collect()(0).getLong(0)
      println(f"[selectk*] seeding: top-$kStar conductance seeds touch " +
        f"$seedCov/$kStar planted communities ($secs%.0f s)")
    }

    // DIAGNOSTIC 2 — the ORACLE LLH bar: score the planted F itself
    // (F[u][c] = s for every true membership, s² = −ln(1−pSingle) — the
    // exact F plantedCoverEdges drew from). Any fitted model at K >= K*
    // could represent this; the gap between a fit's LLH and this number is
    // pure optimization shortfall, not model class.
    val sLit = math.sqrt(-math.log(1.0 - pSingle))
    val truthF = truth.groupBy(col("node").as("id"))
      .agg(sort_array(collect_set(col("community").cast("int"))).as("fi"))
      .withColumn("fv", transform(col("fi"), _ => lit(sLit)))
    if (!noDiag) {
      val truthLlh = BigClam.llhSparse(edges, truthF, BigClam.Params(k = kStar))
      println(f"[selectk*] ORACLE bar: planted-F llh=$truthLlh%.4e ($secs%.0f s)")
    }

    // score any fitted sparse F against the planted truth — via the sparse
    // scorer (BigClamSpec pins pair-equality with the dense rule): at the
    // v3 scale shape (K=8000 × 1M nodes) the dense path would materialize
    // 64 GB of factor rows and posexplode 8G dims just to threshold them
    def scoreFit(fs: org.apache.spark.sql.DataFrame, k: Int, tag: String): Double = {
      val fitted = BigClam.communitiesSparse(fs, edges, BigClam.Params(k = k))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val score = BigClam.scoreCommunities(fitted, truth).collect()(0)
      val omega = BigClam.scoreCommunitiesOmega(fitted, truth)
        .collect()(0).getAs[Double]("omega")
      println(f"[selectk*] $tag (K=$k) vs planted truth: " +
        f"F1=${score.getDouble(0)}%.4f omega=$omega%.4f ($secs%.0f s)")
      fitted.unpersist()
      score.getDouble(0)
    }

    // 1. full-grid walk, every K converged to the same relative-LLH rule:
    //    kTol=0 never satisfies |1 - llh/prev| < kTol, so every grid point
    //    is evaluated and the curve comes back whole
    // bestK is only meaningful once the grid arm has run; the bar arm's
    // skip-when-grid-chose-K* shortcut must not fire when the grid was
    // skipped (invoking arms=bar alone used to silently no-op because
    // bestK initialized to kStar)
    var bestK = kStar
    var gridRan = false
    if (arm("grid")) {
      gridRan = true
      val (bk, bestF, grid) = BigClam.selectKSparse(edges,
        BigClam.Params(k = minK), minK = minK, maxK = maxK, steps = steps,
        kTol = 0.0, fitIterations = iters, supportCap = Some(cap),
        stableTol = None, hotDegCap = hotCap, llhTol = llhTol)
      bestK = bk
      println(f"[selectk*] grid walked in $secs%.0f s:")
      grid.foreach { case (k, llh) => println(f"[selectk*]   K=$k%-6d llh=$llh%.4e") }

      // 2. replay the reference's stopping rule (bigclam4-7.scala:259) on
      //    the recorded curve: walk ascending, stop at the first SIGNED
      //    sub-1e-3 relative gain — (1 − new/old) < 1e-3 also fires on any
      //    LLH decrease — and report the stop-point K itself (KforC = i)
      val stopIdx = grid.indices.drop(1)
        .find(i => 1.0 - grid(i)._2 / grid(i - 1)._2 < 1e-3)
      val refChoice = stopIdx.map(i => grid(i)._1).getOrElse(grid.last._1)
      println(s"[selectk*] planted K*=$kStar  argmax-LLH K=$bestK  " +
        s"reference-rule(1e-3) K=$refChoice" +
        (if (stopIdx.isDefined) "" else " (never stopped — grid boundary)"))
      scoreFit(bestF, bestK, "argmax-K fit")
    }

    // 1b. the same full-grid walk under the PRODUCTION egosplit init
    //     (spread seeds + LPA persona columns + no hash padding): the
    //     round-13 "done" criterion is an INTERIOR LLH peak at/near K* —
    //     the padded walk always picked the grid floor because every
    //     large-K fit collapsed.
    def gridArm(im: String, raceMemory: Boolean = false): Unit = {
      val (bk, bestF, grid) = BigClam.selectKSparse(edges,
        BigClam.Params(k = minK), minK = minK, maxK = maxK, steps = steps,
        kTol = 0.0, fitIterations = iters, supportCap = Some(cap),
        stableTol = None, hotDegCap = hotCap, llhTol = llhTol,
        initMode = im, raceMemory = raceMemory,
        initProbe = d => println(s"[selectk*]   grid($im) init: " +
          s"requested=${d.requested} chosen=${d.chosen}" +
          d.egoLlh.fold("")(e => f" egoLlh=$e%.4e") +
          d.splitLlh.fold("")(sp => f" splitLlh=$sp%.4e")))
      println(f"[selectk*] $im grid walked in $secs%.0f s:")
      grid.foreach { case (k, llh) => println(f"[selectk*]   K=$k%-6d llh=$llh%.4e") }
      val stopIdx = grid.indices.drop(1)
        .find(i => 1.0 - grid(i)._2 / grid(i - 1)._2 < 1e-3)
      val refChoice = stopIdx.map(i => grid(i)._1).getOrElse(grid.last._1)
      println(s"[selectk*] $im walk: planted K*=$kStar  argmax-LLH K=$bk  " +
        s"reference-rule(1e-3) K=$refChoice" +
        (if (stopIdx.isDefined) "" else " (never stopped — grid boundary)"))
      scoreFit(bestF, bk, s"$im argmax-K fit")
    }
    if (arm("gridsplit")) gridArm("egosplit")
    // the fully-unattended v4 capability: K-grid walk where every grid
    // point also selects its own init by the final-LLH race
    if (arm("gridauto")) gridArm("auto")
    // gridauto + race memory: skip re-racing once two consecutive
    // decisive same-side verdicts have been recorded (round 15)
    if (arm("gridautomem")) gridArm("auto", raceMemory = true)

    // 1c. LIVE-FIRE of the ElbowCollapseRatio branch (round-17 item 2): the
    //     collapse rule was calibrated on recorded curves but no recorded
    //     walk ever tripped kTol. Walk the same grid under criterion=auto
    //     with kTol set BETWEEN the knee's pre/post gains (recorded
    //     10k/K*=100 curve: 0.225 -> 0.0105), so the reference's
    //     relative-gain stop fires AT the knee; the fire must register as a
    //     gain COLLAPSE (ratio 0.047 <= 0.2) and the dispatch must stay
    //     with LLH, choosing K* — converting the 0.2 threshold from
    //     curve-reading calibration to observed behavior.
    if (arm("gridknee")) {
      val kneeKTol = args.lift(13).map(_.toDouble).getOrElse(0.05)
      var kneeDiag = Option.empty[BigClam.SelectKDiag]
      val (bk, bestF, grid) = BigClam.selectKSparse(edges,
        BigClam.Params(k = minK), minK = minK, maxK = maxK, steps = steps,
        kTol = kneeKTol, fitIterations = iters, supportCap = Some(cap),
        stableTol = None, hotDegCap = hotCap, llhTol = llhTol,
        initMode = "auto", raceMemory = true, criterion = "auto",
        criterionProbe = (k, l, q) =>
          println(f"[selectk*]   gridknee K=$k%-6d llh=$l%.4e q=$q%.4f"),
        initProbe = d => println(s"[selectk*]   gridknee init: " +
          s"requested=${d.requested} chosen=${d.chosen}" +
          d.egoLlh.fold("")(e => f" egoLlh=$e%.4e") +
          d.splitLlh.fold("")(sp => f" splitLlh=$sp%.4e") +
          d.abandonedAtIter.fold("")(a => s" abandonedAt=$a")),
        diagProbe = d => kneeDiag = Some(d))
      println(f"[selectk*] gridknee(kTol=$kneeKTol) walked in $secs%.0f s:")
      grid.foreach { case (k, llh) =>
        println(f"[selectk*]   K=$k%-6d llh=$llh%.4e") }
      kneeDiag.foreach { d =>
        val gains = grid.map(_._2).sliding(2).collect {
          case Seq(a, b) => math.abs(1.0 - b / a) }.toVector
        println(s"[selectk*] gridknee: planted K*=$kStar chosen K=$bk " +
          s"decided-by=${d.decidedBy} kTolFired=${d.kTolFired} " +
          s"fireCollapse=${d.fireCollapse} boundary_pick=${d.boundaryPick} " +
          s"gains=${gains.map(g => f"$g%.4f").mkString("{", ",", "}")}" +
          (if (gains.size >= 2)
             f" fireRatio=${gains.last / gains(gains.size - 2)}%.4f" else ""))
      }
      scoreFit(bestF, bk, "gridknee chosen-K fit")
    }

    // 3. two K* bars:
    //    (a) the ACHIEVABLE bar — a K=K* fit under the membership-churn
    //        stop (recovery converges later than LLH: the 100k lesson), and
    //    (b) the OPTIMIZER-vs-INIT separator — a fit WARM-STARTED from the
    //        planted F itself. If (b) holds recovery while (a) does not,
    //        the landscape near truth is fine and conductance seeding is
    //        what fails on this cover shape.
    if (arm("bar") && (!gridRan || bestK != kStar)) {
      val ranked = GraphOps.seedRank(edges, hotCap).persist(StorageLevel.MEMORY_AND_DISK)
      val (fStar, histStar) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, ranked = Some(ranked), supportCap = Some(cap),
        stableTol = Some(0.01))
      println(f"[selectk*] K* bar fit (churn-stop): ${histStar.length} LLH " +
        f"points, final=${histStar.last}%.4e")
      scoreFit(fStar, kStar, "K*-bar fit")
      ranked.unpersist()
    }
    if (arm("warm")) {
      val (fWarm, histWarm) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        warmStart = Some(truthF))
      println(f"[selectk*] truth-warm-start fit: ${histWarm.length} LLH points, " +
        f"${histWarm.head}%.4e -> ${histWarm.last}%.4e")
      scoreFit(fWarm, kStar, "truth-warm-start fit")
    }

    // DIAGNOSTIC 3 — reference-faithful RANDOM init (Bigclamv2.scala:62-63,
    // 77-89 pads every row randomly; graft's deterministic equivalent is
    // the xxhash64(id, c) mod 16 padding rule, normally applied only to
    // ego-uncovered nodes). Applying it to ALL nodes removes conductance
    // seeding from the loop entirely: if this cold start recovers where
    // the ego-seeded one does not, seeding — not the optimizer, not the
    // model — is the failing stage on this cover shape.
    val randF = truth.select(col("node").as("id")).distinct()
      .select(col("id"),
        filter(sequence(lit(0), lit(kStar - 1)),
          c => pmod(xxhash64(col("id"), c), lit(16)) === 0)
          .cast("array<int>").as("fi"))
      .withColumn("fv", transform(col("fi"), _ => lit(1.0)))
    // stop on the LLH rule, NOT churn: an undifferentiated random init
    // (every membership exactly 1.0) starts with near-zero argmax churn —
    // the first run of this arm fired the 1% churn stop after ONE
    // iteration at F1=0.05. Churn is a convergence observable only once
    // memberships have differentiated; on random inits the reference's
    // LLH rule is the right stop (and is what the reference used with its
    // own random init).
    if (arm("random")) {
      val (fRand, histRand) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        warmStart = Some(randF))
      println(f"[selectk*] hash-random-init fit (llhTol-stop): " +
        f"${histRand.length} LLH points, ${histRand.head}%.4e -> ${histRand.last}%.4e")
      scoreFit(fRand, kStar, "hash-random-init fit")
    }

    // DIAGNOSTIC 4 — SPREAD seeding (the coverage fix): non-adjacent greedy
    // seed selection over the conductance pool, then the identical ego +
    // hash-padding init. Coverage printed next to diagnostic 1's: the
    // hypothesis is that the cold-fit collapse tracks seed coverage (the
    // working 4k/40 fixture: 36/40 covered; the failing 10k/100: 67/100).
    if (arm("spread")) {
      val spread = GraphOps.rankTopSeedsSpread(
        GraphOps.seedRank(edges, hotCap), edges, kStar)
      val spreadCov = spread.join(truth, col("seed") === col("node"))
        .agg(countDistinct(col("community")).as("cov")).collect()(0).getLong(0)
      println(f"[selectk*] SPREAD seeding: top-$kStar non-adjacent seeds touch " +
        f"$spreadCov/$kStar planted communities ($secs%.0f s)")
      val initSpread = BigClam.initSparseFromSeeds(edges, BigClam.Params(k = kStar),
        spread.select(col("seed"), (col("rank") - 1).as("c")))
      val (fSp, histSp) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        warmStart = Some(initSpread))
      println(f"[selectk*] spread-seeded cold fit (llhTol-stop): " +
        f"${histSp.length} LLH points, ${histSp.head}%.4e -> ${histSp.last}%.4e")
      scoreFit(fSp, kStar, "spread-seeded cold fit")
    }

    // DIAGNOSTIC 5 — STAGED split seeding: fit a COARSE model first (the
    // K=K*/4 fit converges fast and recovers coarse structure — F1 0.43 at
    // 10k/100), then seed m=K*/kCoarse sub-communities INSIDE each coarse
    // block (per-block conductance candidates, greedy non-adjacent within
    // the block) and warm-start the full-K fit from their egos. The coarse
    // stage localizes structure, so per-block coverage is an m-seeds-in-
    // one-block problem instead of K*-seeds-over-the-whole-graph.
    if (arm("staged")) {
      val kC = math.max(kStar / 4, 2)
      val m = math.max((kStar + kC - 1) / kC, 1)
      val ranked = GraphOps.seedRank(edges, hotCap)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (fC, histC) = BigClam.fitSparse(edges, BigClam.Params(k = kC),
        iterations = iters, ranked = Some(ranked), supportCap = Some(cap),
        llhTol = llhTol)
      println(f"[selectk*] staged: coarse K=$kC fit ${histC.length} LLH points, " +
        f"final=${histC.last}%.4e ($secs%.0f s)")
      import org.apache.spark.sql.expressions.Window
      val blocks = fC.select(col("id"),
        graft.bigclam.SparseF.argmaxIndex(col("fi"), col("fv")).as("blk"))
      // per-block top-32 conductance candidates: the window partitions by
      // blk (cardinality kC, each partition's rows bounded by the block's
      // seedRank winners) — bounded model-state-sized collect downstream
      val w = Window.partitionBy("blk").orderBy(col("phi").asc, col("seed").asc)
      val cands = ranked.join(blocks, col("seed") === col("id"))
        .select(col("seed"), col("phi"), col("blk"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 32)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val candRows = cands.orderBy("blk", "rn")
        .select(col("seed"), col("blk")).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      val candSet = candRows.map(_._1).toSet
      import spark.implicits._
      val candDf = candSet.toSeq.toDF("pid")
      val induced = edges
        .join(broadcast(candDf.select(col("pid").as("src"))), Seq("src"), "left_semi")
        .join(broadcast(candDf.select(col("pid").as("dst"))), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")).collect()
      val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.HashSet[Long]]()
      induced.foreach { r =>
        adj.getOrElseUpdate(r.getLong(0), scala.collection.mutable.HashSet.empty) += r.getLong(1) }
      // greedy: per block in candidate order, up to m seeds, non-adjacent
      // to every seed chosen so far (globally); fill shortfall from the
      // remaining candidates in order, relaxing adjacency last
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val chosenSet = scala.collection.mutable.HashSet.empty[Long]
      val perBlock = scala.collection.mutable.HashMap.empty[Int, Int]
      candRows.foreach { case (seed, blk) =>
        if (chosen.length < kStar && perBlock.getOrElse(blk, 0) < m &&
            adj.get(seed).forall(ns => !ns.exists(chosenSet))) {
          chosen += seed; chosenSet += seed
          perBlock(blk) = perBlock.getOrElse(blk, 0) + 1
        }
      }
      candRows.foreach { case (seed, _) =>
        if (chosen.length < kStar && !chosenSet(seed) &&
            adj.get(seed).forall(ns => !ns.exists(chosenSet))) {
          chosen += seed; chosenSet += seed } }
      candRows.foreach { case (seed, _) =>
        if (chosen.length < kStar && !chosenSet(seed)) {
          chosen += seed; chosenSet += seed } }
      val seedsDf = chosen.toSeq.zipWithIndex.toDF("seed", "c")
      val stagedCov = seedsDf.join(truth, col("seed") === col("node"))
        .agg(countDistinct(col("community")).as("cov")).collect()(0).getLong(0)
      println(f"[selectk*] STAGED seeding: ${chosen.length} per-block seeds " +
        f"touch $stagedCov/$kStar planted communities ($secs%.0f s)")
      val initStaged = BigClam.initSparseFromSeeds(edges,
        BigClam.Params(k = kStar), seedsDf)
      val (fStg, histStg) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        warmStart = Some(initStaged))
      println(f"[selectk*] staged split-seeded fit (llhTol-stop): " +
        f"${histStg.length} LLH points, ${histStg.head}%.4e -> ${histStg.last}%.4e")
      scoreFit(fStg, kStar, "staged split-seeded fit")
      cands.unpersist(); ranked.unpersist()
    }

    // DIAGNOSTIC 6 — EGO-SPLITTING init (round 13; round 12's named
    // candidate fix). The proven blocker is ego BLENDING: each seed's ego
    // folds the seed's 1-3 true communities into ONE init column.
    // egoSplitCover partitions every spread seed's ego into triangle-
    // support components (communities overlapping only at the seed share
    // no triangle through it) and allocates the K columns greedy-max-
    // coverage over persona member sets — so a multi-community seed's
    // second persona can claim a column for a community no seed reached.
    // Printed: column count, majority-community coverage (the planted
    // communities that hold the plurality of at least one init column) and
    // mean column purity (plurality mass / column truth rows) — the
    // coverage number to beat is staged's 82/100, the F1 bar is 0.44.
    // poolMult > 1 feeds the allocator MORE candidate seeds than columns
    // (spread top poolMult·K): coverage of seedless communities can only
    // come from extra personas, and greedy max-coverage dedups the surplus
    // pad = false drops initSparseFromCover's hash padding — uncovered
    // nodes start EMPTY instead of holding ~K/16 random columns at 1.0
    // (~300 spurious members per column at 10k/K=100 — more than the true
    // fragment mass), and acquire support through neighbor dims instead.
    def egoSplitArm(method: String, poolMult: Int = 1,
        pad: Boolean = true): Unit = {
      val spread = GraphOps.rankTopSeedsSpread(
        GraphOps.seedRank(edges, hotCap), edges, kStar * poolMult)
      val (cover0, diag) = GraphOps.egoSplitCover(edges, spread, kStar,
        method = method)
      println(s"[selectk*] EGO-SPLIT diag: $diag")
      val cover = cover0.persist(StorageLevel.MEMORY_AND_DISK)
      val colStats = cover.join(truth, col("member") === col("node"))
        .groupBy("c", "community").agg(count(lit(1)).as("n"))
        .groupBy("c").agg(max(struct(col("n"), col("community"))).as("m"),
          sum(col("n")).as("tot"))
      val cs = colStats.agg(countDistinct(col("m.community")).as("cov"),
        (sum(col("m.n")).cast("double") / sum(col("tot"))).as("purity"),
        count(lit(1)).as("ncols")).collect()(0)
      val tag = (if (poolMult == 1) method else s"$method,pool=${poolMult}x") +
        (if (pad) "" else ",nopad")
      println(f"[selectk*] EGO-SPLIT($tag) allocation: ${cs.getLong(2)} " +
        f"columns, majority-community coverage ${cs.getLong(0)}/$kStar, " +
        f"mean purity ${cs.getDouble(1)}%.3f ($secs%.0f s)")
      val initEs = BigClam.initSparseFromCover(edges,
        BigClam.Params(k = kStar), cover, pad = pad)
      val (fEs, histEs) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        warmStart = Some(initEs))
      println(f"[selectk*] ego-split($tag) cold fit (llhTol-stop): " +
        f"${histEs.length} LLH points, ${histEs.head}%.4e -> ${histEs.last}%.4e")
      scoreFit(fEs, kStar, s"ego-split($tag) cold fit")
      cover.unpersist()
    }
    if (arm("egosplit")) egoSplitArm("cc")
    if (arm("egosplitlpa")) egoSplitArm("lpa")
    if (arm("egosplitlpa2x")) egoSplitArm("lpa", poolMult = 2)
    if (arm("egosplitlpa4x")) egoSplitArm("lpa", poolMult = 4)
    if (arm("egosplitlpanp")) egoSplitArm("lpa", pad = false)
    if (arm("egosplitlpa2xnp")) egoSplitArm("lpa", poolMult = 2, pad = false)
    if (arm("egosplitlpa4xnp")) egoSplitArm("lpa", poolMult = 4, pad = false)

    // DIAGNOSTIC 8 — ORACLE-PARTIAL warm start: the BEST init any
    // ego-local method could ever produce — each column is one planted
    // community restricted to its min-id member's closed neighborhood
    // (100% pure, one column per true community, ego-sized) with init
    // value 1.0. This bounds the whole ego-splitting program from above:
    // if the fit cannot reach the warm basin from perfectly pure ego-sized
    // fragments, no seed-local splitting refinement can close the gap and
    // the honest conclusion is that cold-start init needs more than
    // one-hop purity (e.g. a growth phase or truth-scale values); if it
    // recovers, the gap to egosplitlpa is purity/coverage left on the
    // table, and splitting refinements are worth pursuing.
    def oraclePartialArm(pad: Boolean): Unit = {
      val anchor = truth.groupBy("community").agg(min(col("node")).as("a"))
      val egoA = edges.join(anchor, col("src") === col("a"))
        .select(col("community"), col("dst").as("member"))
        .unionByName(anchor.select(col("community"), col("a").as("member")))
      val coverP = egoA
        .join(truth.select(col("community"), col("node").as("member")),
          Seq("community", "member"), "left_semi")
        .select(col("community").cast("int").as("c"), col("member"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val frag = coverP.groupBy("c").agg(count(lit(1)).as("sz"))
        .agg(avg(col("sz")), min(col("sz")), count(lit(1))).collect()(0)
      println(f"[selectk*] ORACLE-PARTIAL cover: ${frag.getLong(2)} columns, " +
        f"avg fragment ${frag.getDouble(0)}%.1f members (min ${frag.getLong(1)}) " +
        f"of ~${nNodes * 16 / kStar / 10} per community ($secs%.0f s)")
      val initP = BigClam.initSparseFromCover(edges,
        BigClam.Params(k = kStar), coverP, pad = pad)
      val ptag = if (pad) "oracle-partial" else "oracle-partial,nopad"
      val (fP, histP) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        warmStart = Some(initP))
      println(f"[selectk*] $ptag warm fit (llhTol-stop): " +
        f"${histP.length} LLH points, ${histP.head}%.4e -> ${histP.last}%.4e")
      scoreFit(fP, kStar, s"$ptag warm fit")
      coverP.unpersist()
    }
    if (arm("oraclepartial")) oraclePartialArm(pad = true)
    if (arm("oraclepartialnp")) oraclePartialArm(pad = false)

    // DIAGNOSTIC 9 — ALLOCATION-ONLY probe (round 14, the v3-scale-shape
    // question): run the production egosplit pre-fit pass exactly as
    // initMode="egosplit"/"auto" would (2K spread pool, LPA split, greedy
    // max-coverage allocator) and print the CoverDiag — allocator path
    // (greedy vs rank-fallback under the 8M-row collect guard), column
    // count, covered nodes, and the auto-regime signal (multi-persona
    // fraction) — plus truth-labeled coverage/purity, WITHOUT paying for a
    // fit. This is what answers "does the allocator survive 1M nodes /
    // K=8000 / a 16k-seed pool" inside a bounded wall-clock budget.
    if (arm("alloconly")) {
      val spread = GraphOps.rankTopSeedsSpread(
        GraphOps.seedRank(edges, hotCap), edges, 2 * kStar)
      val (cover0, diag) = GraphOps.egoSplitCover(edges, spread, kStar,
        method = "lpa")
      println(f"[selectk*] ALLOC-ONLY diag: $diag ($secs%.0f s)")
      val cover = cover0.persist(StorageLevel.MEMORY_AND_DISK)
      val colStats = cover.join(truth, col("member") === col("node"))
        .groupBy("c", "community").agg(count(lit(1)).as("n"))
        .groupBy("c").agg(max(struct(col("n"), col("community"))).as("m"),
          sum(col("n")).as("tot"))
      val cs = colStats.agg(countDistinct(col("m.community")).as("cov"),
        (sum(col("m.n")).cast("double") / sum(col("tot"))).as("purity"),
        count(lit(1)).as("ncols")).collect()(0)
      println(f"[selectk*] ALLOC-ONLY truth: ${cs.getLong(2)} columns, " +
        f"majority-community coverage ${cs.getLong(0)}/$kStar, " +
        f"mean purity ${cs.getDouble(1)}%.3f ($secs%.0f s)")
      cover.unpersist()
    }

    // DIAGNOSTIC 9b — DISTRIBUTED-ALLOCATOR parity at scale (round 15 #2):
    // the same egosplit cover twice — driver greedy (guard raised) vs the
    // distributed greedy (guard forced to 0) — printing both CoverDiags and
    // wall. The picks are exact-parity by construction (EgoSplitSpec pins
    // the sequence); this run RECORDS coverage equality and the cost ratio
    // at a memberRows scale where the driver path collects in bulk.
    if (arm("allocdist")) {
      val spread = GraphOps.rankTopSeedsSpread(
          GraphOps.seedRank(edges, hotCap), edges, 2 * kStar)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // leg 0 (round 16 #2): the NATURAL dispatch — default 8M guard, no
      // forcing. On a cover genuinely past the guard this must read
      // allocator=greedy-dist with AllocDiag (rounds, max batch rows,
      // overshoots) recorded; below it, allocator=greedy.
      val t0n = System.nanoTime()
      val (_, dNat) = GraphOps.egoSplitCover(edges, spread, kStar,
        method = "lpa")
      val sNat = (System.nanoTime() - t0n) / 1e9
      println(f"[selectk*] ALLOC natural:       $dNat ($sNat%.0f s)")
      val t1 = System.nanoTime()
      val (_, dDrv) = GraphOps.egoSplitCover(edges, spread, kStar,
        maxCollectRows = Long.MaxValue, method = "lpa")
      val sDrv = (System.nanoTime() - t1) / 1e9
      println(f"[selectk*] ALLOC driver-greedy: $dDrv ($sDrv%.0f s)")
      val t2 = System.nanoTime()
      val (_, dDist) = GraphOps.egoSplitCover(edges, spread, kStar,
        maxCollectRows = 0L, method = "lpa")
      val sDist = (System.nanoTime() - t2) / 1e9
      println(f"[selectk*] ALLOC greedy-dist:   $dDist ($sDist%.0f s)")
      println(f"[selectk*] ALLOC coverage delta: " +
        f"${dDist.coveredNodes - dDrv.coveredNodes} nodes " +
        f"(dist ${dDist.coveredNodes} vs driver ${dDrv.coveredNodes}); " +
        f"natural-vs-driver ${dNat.coveredNodes - dDrv.coveredNodes}")
      spread.unpersist()
    }

    // DIAGNOSTIC 10 — initMode="auto" end-to-end (round 14 #1): the fit
    // must pick the measured-best init for THIS fixture's regime on its
    // own (dense overlapping 10k/100 -> egosplit; sparse 4k/40 -> padded
    // ego) and record the choice. Compare its F1 against the best manual
    // arm on the same fixture.
    if (arm("auto")) {
      var picked = "?"
      val (fA, histA) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
        iterations = iters, supportCap = Some(cap), llhTol = llhTol,
        ranked = Some(GraphOps.seedRank(edges, hotCap)), initMode = "auto",
        initProbe = d => {
          picked = d.chosen
          println(s"[selectk*] AUTO init decision: requested=${d.requested} " +
            s"chosen=${d.chosen} egoLlh=${d.egoLlh.getOrElse(Double.NaN)} " +
            s"splitLlh=${d.splitLlh.getOrElse(Double.NaN)} " +
            s"abandonedAt=${d.abandonedAtIter.getOrElse(-1)} " +
            d.cover.fold("")(_.toString))
        })
      println(f"[selectk*] auto-init cold fit (chose $picked, llhTol-stop): " +
        f"${histA.length} LLH points, ${histA.head}%.4e -> ${histA.last}%.4e")
      scoreFit(fA, kStar, s"auto-init ($picked) cold fit")
    }

    // DIAGNOSTIC 7 — seeded MULTI-RESTART (the cheap complement: R spread
    // selections over deterministically-perturbed candidate pools — each
    // restart knocks out a different hash-chosen 25% of the conductance
    // pool before the non-adjacent greedy — keep the best final LLH).
    // Budget per restart is capped at min(150, fitIters): a restart in a
    // materially better basin shows it well before full convergence (the
    // warm fit needed 14 iterations), and three full 400-iteration walks
    // would triple the battery cost for a hypothesis round 12 already
    // priced as likely-negative.
    if (arm("restart")) {
      val rankedAll = GraphOps.seedRank(edges, hotCap)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val rIters = math.min(150, iters)
      val results = (1 to 3).map { r =>
        val sub = rankedAll.filter(
          pmod(xxhash64(col("seed"), lit(r)), lit(4)) =!= 0)
        val spreadR = GraphOps.rankTopSeedsSpread(sub, edges, kStar)
        val initR = BigClam.initSparseFromSeeds(edges,
          BigClam.Params(k = kStar),
          spreadR.select(col("seed"), (col("rank") - 1).as("c")))
        val (fR, histR) = BigClam.fitSparse(edges, BigClam.Params(k = kStar),
          iterations = rIters, supportCap = Some(cap), llhTol = llhTol,
          warmStart = Some(initR))
        println(f"[selectk*] restart $r/3 (knockout-25%%, cap $rIters): " +
          f"${histR.length} LLH points, final=${histR.last}%.4e ($secs%.0f s)")
        (r, fR, histR.last)
      }
      val best = results.maxBy(_._3)
      println(f"[selectk*] restart best: r=${best._1} llh=${best._3}%.4e")
      scoreFit(best._2, kStar, s"multi-restart best (r=${best._1})")
      rankedAll.unpersist()
    }

    // 4. held-out selection — the capacity-honest criterion
    def heldOutArm(im: String): Unit = {
      val (hk, hf, hcurve) = BigClam.selectKSparseHeldOut(edges,
        BigClam.Params(k = minK), minK = minK, maxK = maxK, steps = steps,
        heldFrac = heldFrac, fitIterations = iters, llhTol = llhTol,
        supportCap = Some(cap), hotDegCap = hotCap, initMode = im)
      println(f"[selectk*] held-out walk (frac=$heldFrac, init=$im) in $secs%.0f s:")
      hcurve.foreach { case (k, tr, ho) =>
        println(f"[selectk*]   K=$k%-6d train_llh=$tr%.4e held_llh=$ho%.4e") }
      println(s"[selectk*] held-out choice K=$hk (planted K*=$kStar, init=$im)")
      scoreFit(hf, hk, s"held-out-K fit ($im)")
    }
    if (arm("heldout") && heldFrac > 0) heldOutArm("ego")
    if (arm("heldoutsplit") && heldFrac > 0) heldOutArm("egosplit")
    println(f"[selectk*] TOTAL $secs%.1f s")
    spark.stop()
  }
}
