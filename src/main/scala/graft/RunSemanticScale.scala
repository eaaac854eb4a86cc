package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Semantic-dedup scale run — [[ops.VectorOps.semanticDedupLabels]] at lake
  * size with a PLANTED duplicate structure whose recovery is asserted, not
  * eyeballed (the RunLshScale pattern for the embedding-space dedup):
  * `nVec` synthetic 64-dim vectors in families of 10 sharing a base
  * direction — members 0-4 of each family are EXACT copies of the base,
  * members 5-9 carry a small deterministic perturbation (cos ≈ 0.9988
  * to the base). Asserts, exactly:
  *   (a) zero cross-family merges (unrelated 64-dim directions at
  *       cosine ≥ 0.9 would be a 7σ coincidence per pair);
  *   (b) the 5 exact copies of EVERY family share one label (identical
  *       vectors hash to identical cell + sub-bucket deterministically);
  * and reports the perturbed-member recall (how many of the 5 noisy
  * copies the block survived — the knob-vs-recall tradeoff measured),
  * DECOMPOSED into cross-cell misses (inherent SemDeDup blocking loss —
  * the multiprobe case) vs same-cell sub-bucket splits (the hot-cell
  * knob's price) vs in-block misses (threshold loss; expect 0).
  *
  *   runMain graft.RunSemanticScale [nVec=1000000] [k=256] [subBits=6] [threshold=0.9]
  *
  * `subBits` realizes the hot-cell sub-bucketing note in the labeler's
  * doc: with k cells alone, Σ(cell size)² at 1M vectors is ~2e9 candidate
  * pairs; 6 sign-LSH bits cut that ~64× while near-identical pairs agree
  * on every bit w.h.p.
  */
object RunSemanticScale {
  def main(args: Array[String]): Unit = {
    val nVec = args.lift(0).map(_.toLong).getOrElse(1000000L)
    require(nVec % 10 == 0, "nVec must be a multiple of the family size 10")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val subBits = args.lift(2).map(_.toInt).getOrElse(6)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(0.9)
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

    // deterministic doubles in [-1, 1) via the FULL splitmix64 finalizer —
    // a single-multiply mixer leaves consecutive inputs nearly linear in
    // the top bits (outputs step by ~K/2^64), which made different family
    // bases cosine-0.99 collinear in the first cut of this run
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
    val planes = if (subBits > 0) VectorOps.hyperplanes(subBits, dim) else Nil
    val (labels0, assigned) =
      VectorOps.semanticDedupWithBlocks(emb, k, threshold, planes)
    val labels = labels0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = labels.count()
    println(f"[semscale] $n labels over $nVec vectors, k=$k subBits=$subBits " +
      f"threshold=$threshold ($secs%.1f s)")
    require(n == nVec, "labeling must cover every vector")

    // Spark's `/` on longs is DOUBLE division — family key needs floor
    def fam(c: org.apache.spark.sql.Column) = floor(c / lit(10L)).cast("bigint")
    // (a) zero cross-family merges
    val cross = labels.filter(fam(col("canonical_id")) =!= fam(col("vec_id"))).count()
    require(cross == 0, s"cross-family merges: $cross")
    // (b) the 5 exact copies of every family share one label
    val exactGroups = labels.filter(col("vec_id") % 10 < 5)
      .groupBy(fam(col("vec_id")).as("fam"))
      .agg(countDistinct(col("canonical_id")).as("nl"))
      .filter(col("nl") =!= 1).count()
    require(exactGroups == 0, s"families whose exact copies split: $exactGroups")
    // perturbed-member recall: noisy copies that merged into a cluster
    // (cross == 0 above means any merge is within-family)
    val merged = labels.filter(col("vec_id") % 10 >= 5)
      .filter(col("n_cluster") > 1).count()
    println(f"[semscale] exact-copy families intact: all; perturbed members " +
      f"merged: $merged/${nVec / 2} (${merged * 100.0 / (nVec / 2)}%.2f%%)  " +
      f"TOTAL $secs%.1f s")

    // Recall decomposition: WHERE did the missed perturbed members go?
    // Reference block = the family's exact-copy block (member fam*10 —
    // all 5 exact copies share it deterministically). A miss is either
    //   cross_cell: landed in a different k-means CELL (the inherent
    //     SemDeDup blocking loss; multiprobe assignment would recover it),
    //   sub_split: same cell, different sign-LSH sub-bucket (the price of
    //     the hot-cell knob; fewer subBits recover it), or
    //   in_block:  shared the full block and STILL missed (threshold
    //     loss — expect 0 at cos≈0.9988 vs threshold 0.9).
    val missed = labels.filter(col("vec_id") % 10 >= 5)
      .filter(col("n_cluster") === 1).select(col("vec_id"))
    val memberBlk = assigned.select(fam(col("vec_id")).as("fam"),
      col("vec_id"), col("cell"), col("blk"))
    val baseBlk = assigned.filter(col("vec_id") % 10 === 0)
      .select(fam(col("vec_id")).as("fam"),
        col("cell").as("base_cell"), col("blk").as("base_blk"))
    val missRows = missed.join(memberBlk, Seq("vec_id")).join(baseBlk, Seq("fam"))
      .select(
        when(col("cell") =!= col("base_cell"), "cross_cell")
          .when(!(col("blk") <=> col("base_blk")), "sub_split")
          .otherwise("in_block").as("why"))
      .groupBy("why").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMissed = nVec / 2 - merged
    println(s"[semscale] missed $nMissed decompose: " +
      s"cross_cell=${missRows.getOrElse("cross_cell", 0L)} " +
      s"sub_split=${missRows.getOrElse("sub_split", 0L)} " +
      s"in_block=${missRows.getOrElse("in_block", 0L)}")
    spark.stop()
  }
}
