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
    val embN = graft.graph.GraphOps.cutLineage(
      emb.withColumn("nrm", VectorOps.l2norm(col("v"))))
    val cents = VectorOps.kmeansCentroids(embN, 256, iters = 2)
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
    println(f"[pqscale] ADC search: top-1 in-family $inFam/$nProbes  TOTAL $secs%.1f s")
    require(inFam >= (nProbes * 9) / 10,
      s"ADC top-1 in-family recall collapsed: $inFam/$nProbes")
    spark.stop()
  }
}
