package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Product-quantization scale run — codebook training + audit at lake
  * size with ASSERTED structure (the RunSemanticScale pattern): the same
  * splitmix64 planted families (10 members sharing a base direction,
  * members 0-4 exact copies, 5-9 perturbed), PQ-coded end to end.
  * Asserts, exactly:
  *   (a) every family's 5 exact copies carry IDENTICAL code strings
  *       (identical vectors cannot quantize differently);
  *   (b) Lloyd monotonicity at scale: trained codebooks (iters rounds)
  *       reconstruct no worse in TOTAL squared error than the raw seed
  *       codebooks (iters = 0).
  * Reports wall time for training+audit and the reconstruction-MSE
  * profile (mean/p99/max) — the compression-quality curve a PQ
  * deployment reads before trusting 64x-compressed vectors.
  *
  *   runMain graft.RunPqScale [nVec=1000000] [iters=2]
  */
object RunPqScale {
  def main(args: Array[String]): Unit = {
    val nVec = args.lift(0).map(_.toLong).getOrElse(1000000L)
    require(nVec % 10 == 0, "nVec must be a multiple of the family size 10")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val dim = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9

    def u(x0: Long): Double = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
      x ^= x >>> 27; x *= 0x94D049BB133111EBL
      x ^= x >>> 31
      (x >>> 11) * (2.0 / (1L << 53)) - 1.0
    }
    val emb = spark.range(nVec).select(col("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val fam = id / 10
          val base = Array.tabulate(dim)(j => u(fam * 131L + j))
          val v =
            if (id % 10 < 5) base
            else Array.tabulate(dim)(j => base(j) + 0.05 * u(id * 977L + j))
          (id, v)
        }
      }
      .toDF("vec_id", "v")

    val audit = VectorOps.pqAudit(emb, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = audit.count()
    println(f"[pqscale] $n audits over $nVec vectors, iters=$iters ($secs%.1f s)")
    require(n == nVec, "audit must cover every vector")

    // (a) exact copies share codes, family by family
    val split = audit.filter(col("vec_id") % 10 < 5)
      .groupBy(floor(col("vec_id") / 10).as("fam"))
      .agg(countDistinct(col("pq_code")).as("nc"))
      .filter(col("nc") =!= 1).count()
    require(split == 0, s"families whose exact copies coded differently: $split")

    val stats = audit.agg(
      avg(col("mse")).as("mean"),
      expr("percentile_approx(mse, 0.99, 10000)").as("p99"),
      max(col("mse")).as("mx")).collect()(0)
    println(f"[pqscale] mse mean=${stats.getDouble(0)}%.6f " +
      f"p99=${stats.getDouble(1)}%.6f max=${stats.getDouble(2)}%.6f ($secs%.1f s)")

    // (b) Lloyd monotonicity at scale vs the raw seed codebooks
    val total = audit.agg(sum(col("mse"))).collect()(0).getDouble(0)
    val total0 = VectorOps.pqAudit(emb, 0)
      .agg(sum(col("mse"))).collect()(0).getDouble(0)
    println(f"[pqscale] total mse: seeds=$total0%.2f trained=$total%.2f " +
      f"(${(1 - total / total0) * 100}%.1f%% lower)  ($secs%.1f s)")
    require(total <= total0 + 1e-6 * math.abs(total0),
      s"Lloyd lost reconstruction at scale: $total0 -> $total")

    // (c) the SEARCH side at scale: IVF cells + 8-nibble codes + ADC
    // top-3 for 100 probes (families 0-9 complete). Planted geometry makes
    // the answer checkable: same-family L2² ≈ 0.1 vs cross-family ≈ 40,
    // and per-vector quantization error ≈ 15 — so ADC top-1 must stay
    // in-family for (nearly) every probe despite 64× compression.
    // ONE cell-count constant: the coarse quantizer's k and the sweep's
    // all-cells assertions must agree or the recall==1.0 require evaluates
    // against the wrong cell count
    val nCells = 256
    val embN = graft.graph.GraphOps.cutLineage(
      emb.withColumn("nrm", VectorOps.l2norm(col("v"))))
    val cents = VectorOps.kmeansCentroids(embN, nCells, iters = 2)
    val books = VectorOps.pqCodebooks(embN, 8, 8, 16, iters)
    val cands = VectorOps.ivfAssignWith(embN, cents)
      .select(col("vec_id").as("w"), col("cell"),
        graft.functions.PqFns.pqCodes(col("v"), books).getField("codes").as("codes"))
    val probes = VectorOps.ivfProbeCellsWith(embN.filter(col("vec_id") < 100), cents, 2)
      .select(col("vec_id").as("u"), col("v").as("uv"), col("cell"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("adc").asc, col("w").asc)
    val top1 = probes.join(cands, Seq("cell")).filter(col("u") =!= col("w"))
      .select(col("u"), col("w"),
        graft.functions.PqFns.adcDistance(col("uv"), col("codes"), books).as("adc"))
      .select(col("u"), col("w"), row_number().over(win).as("rn"))
      .filter(col("rn") === 1)
    val inFam = top1.filter(floor(col("u") / 10) === floor(col("w") / 10)).count()
    val nProbes = top1.count()
    println(f"[pqscale] ADC search: top-1 in-family $inFam/$nProbes ($secs%.1f s)")
    require(inFam >= (nProbes * 9) / 10,
      s"ADC top-1 in-family recall collapsed: $inFam/$nProbes")

    // (d) the recall-vs-nprobe CURVE — the operating table an IVF+PQ
    // deployment reads to pick its cost/quality point. One all-pairs pass
    // (100 probes x nVec candidates, probe side broadcast, candidate side
    // streamed — no shuffle of the lake) computes BOTH the quantized ADC
    // distance and the exact L2², each candidate tagged with the rank of
    // its cell in the probe's cell ordering; every nprobe point is then a
    // cellrank filter over the same tiny per-(probe, cellrank) top-3
    // digest, so the whole sweep costs one scan, two narrow shuffles and
    // a 76k-row collect. Two recall columns, two different questions:
    //   vs ADC-full-scan  — what the CELL PRUNING loses (candidate stage;
    //                       provably monotone in nprobe, exactly 1.0 at
    //                       nprobe = nCells — both asserted);
    //   vs exact L2       — what pruning AND 64x quantization lose
    //                       end-to-end (need not be monotone).
    // Self-audit: the merged all-cells digest must equal a global ADC
    // window computed WITHOUT the cell decomposition — a candidate lost or
    // double-counted by the IVF partitioning would break set equality.
    val sweep = Iterator.iterate(1)(_ * 2).takeWhile(_ <= nCells).toSeq
    val kTop = 3
    val cands2 = VectorOps.ivfAssignWith(embN, cents)
      .select(col("vec_id").as("w"), col("v").as("wv"), col("nrm").as("wnrm"),
        col("cell"),
        graft.functions.PqFns.pqCodes(col("v"), books).getField("codes").as("codes"))
    val probesR = VectorOps.ivfProbeCellsRankedAll(
        embN.filter(col("vec_id") < 100), cents)
      .select(col("vec_id").as("u"), col("v").as("uv"), col("nrm").as("unrm"),
        col("cell"), col("cellrank"))
    val pairsN = broadcast(probesR).join(cands2, Seq("cell"))
      .filter(col("u") =!= col("w"))
      .select(col("u"), col("w"), col("cellrank"),
        graft.functions.PqFns.adcDistance(col("uv"), col("codes"), books).as("adc"),
        (col("unrm") * col("unrm") + col("wnrm") * col("wnrm")
          - lit(2.0) * VectorOps.dot(col("uv"), col("wv"))).as("l2x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("u", "cellrank").orderBy(col("adc").asc, col("w").asc)
    val digest = pairsN
      .select(col("u"), col("w"), col("cellrank"), col("adc"),
        row_number().over(wCell).as("rn"))
      .filter(col("rn") <= kTop).drop("rn").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getDouble(3)))
    val scanned = pairsN.groupBy("u", "cellrank").count().collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def topSets(byU: Map[Long, Array[(Long, Int, Long, Double)]], p: Int) =
      byU.map { case (u, rows) =>
        u -> rows.filter(_._2 <= p).sortBy(t => (t._4, t._3)).take(kTop)
          .map(_._3).toSet
      }
    val byU = digest.groupBy(_._1)
    val probeIds = byU.keySet.toSeq.sorted
    val adcFull = topSets(byU, nCells)
    val wGlob = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("adc").asc, col("w").asc)
    val globSets = pairsN
      .select(col("u"), col("w"), row_number().over(wGlob).as("rn"))
      .filter(col("rn") <= kTop).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(1)).toSet }
    require(probeIds.forall(u => adcFull(u) == globSets(u)),
      "IVF cell decomposition lost/duplicated a candidate vs the global ADC scan")
    val exactSets = pairsN
      .select(col("u"), col("w"), row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy("u")
        .orderBy(col("l2x").asc, col("w").asc)).as("rn"))
      .filter(col("rn") <= kTop).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(1)).toSet }
    println(f"[pqscale] nprobe sweep over ${probeIds.size} probes, " +
      f"$nCells cells, top-$kTop ($secs%.1f s):")
    println("[pqscale]   nprobe  avg_cands  scan_frac  recall_vs_adcfull  recall_vs_exact")
    var prevAdcRecall = 0.0
    for (p <- sweep) {
      val sets = topSets(byU, p)
      def recall(truth: Map[Long, Set[Long]]) = probeIds.map { u =>
        val t = truth(u); if (t.isEmpty) 1.0
        else (sets(u) & t).size.toDouble / t.size
      }.sum / probeIds.size
      val rAdc = recall(adcFull)
      val rExact = recall(exactSets.toMap)
      val avgCands = probeIds.map { u =>
        (1 to p).map(c => scanned.getOrElse((u, c), 0L)).sum
      }.sum.toDouble / probeIds.size
      println(f"[pqscale]   $p%6d  $avgCands%9.0f  ${avgCands / nVec}%9.4f" +
        f"  $rAdc%17.4f  $rExact%15.4f")
      require(rAdc >= prevAdcRecall - 1e-12,
        s"candidate-stage recall not monotone at nprobe=$p: $prevAdcRecall -> $rAdc")
      prevAdcRecall = rAdc
    }
    require(math.abs(prevAdcRecall - 1.0) < 1e-12,
      s"probing all $nCells cells must recover the full ADC scan exactly: $prevAdcRecall")
    pairsN.unpersist()
    println(f"[pqscale] TOTAL $secs%.1f s")
    spark.stop()
  }
}
