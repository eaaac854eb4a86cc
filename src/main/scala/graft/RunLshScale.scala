package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Mass-duplication stress for the LSH dedup path — the scenario
  * q_dedup_lsh_cluster exists for: families of byte-identical documents far
  * past the rare-shingle df cap. Generates a deterministic corpus of
  * `nFamilies` families × `r` byte-identical copies each plus `nBackground`
  * distinct docs (all derived from xxhash64 token streams — no RNG, no
  * input tables), runs the production `lshClusterLabels` (exact
  * pre-collapse → band → chain → verify → CC → re-expand), and checks the
  * labels: every family must come back as one full cluster.
  *
  * With `compare` as the 4th arg it also times the pre-collapse-free
  * proposal+verify the path used before round 8 — R-sized (band, bucket)
  * windows chained per band, every chain edge Jaccard-verified by melting
  * its full shingle sets — to quantify what the collapse removes.
  *
  *   runMain graft.RunLshScale [nFamilies=200] [r=1000] [nBackground=5000] [compare]
  */
object RunLshScale {
  def main(args: Array[String]): Unit = {
    val nFamilies = args.lift(0).map(_.toInt).getOrElse(200)
    val r = args.lift(1).map(_.toInt).getOrElse(1000)
    val nBackground = args.lift(2).map(_.toInt).getOrElse(5000)
    val compare = args.lift(3).contains("compare")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9

    // family f copy i -> doc_id f*r+i, text = 60 hash tokens of family f;
    // background b -> doc_id nFamilies*r+b, 60 hash tokens unique to b
    def tokens(keyCol: org.apache.spark.sql.Column, salt: Int) =
      array_join(transform(sequence(lit(1), lit(60)),
        j => concat(lit("t"), pmod(xxhash64(keyCol, j, lit(salt)), lit(99991)))), " ")
    val fams = spark.range(nFamilies.toLong * r).select(
      col("id").as("doc_id"),
      tokens(expr(s"id DIV $r"), 1).as("text"))
    val bg = spark.range(nBackground).select(
      (col("id") + nFamilies.toLong * r).as("doc_id"),
      tokens(col("id"), 2).as("text"))
    val docs = fams.unionAll(bg)
      .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(f"[lsh-scale] corpus: ${docs.count()} docs " +
      f"($nFamilies families x $r copies + $nBackground background) ($secs%.0f s)")

    val tRun = System.nanoTime()
    val labels = TextOps.lshClusterLabels(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byFam = labels.groupBy(expr(s"doc_id DIV $r").as("fam"))
      .agg(countDistinct(col("canon_id")).as("n_canon"), count(lit(1)).as("n"))
    val bad = byFam.filter(col("n_canon") =!= 1 || col("n") =!= r).count()
    val famsClustered = byFam.count()
    val runSecs = (System.nanoTime() - tRun) / 1e9
    println(f"[lsh-scale] pre-collapse path: ${labels.count()} labeled docs, " +
      f"$famsClustered/$nFamilies families intact, $bad broken — $runSecs%.1f s")
    require(bad == 0 && famsClustered == nFamilies.toLong,
      "family clusters broken — pre-collapse path is WRONG, not just slow")
    labels.unpersist()

    if (compare) {
      // the raw-docs proposal+verify the declared path ran before round 8:
      // band minima over ALL copies (R-sized single-task bucket sorts), chain
      // per band, then the full Jaccard verify melt per proposed edge
      import org.apache.spark.sql.expressions.Window
      val tOld = System.nanoTime()
      val buckets = docs
        .select(col("doc_id"),
          graft.functions.ShingleHash.bandMins(col("text"), 4).as("mins"))
        .filter(col("doc_id").isNotNull && col("mins").isNotNull)
        .select(col("doc_id"), posexplode(col("mins")).as(Seq("band", "bucket")))
      val w = Window.partitionBy("band", "bucket").orderBy("doc_id")
      val chain = buckets
        .withColumn("doc_a", lag(col("doc_id"), 1).over(w))
        .filter(col("doc_a").isNotNull)
        .select(col("doc_a"), col("doc_id").as("doc_b"))
        .distinct()
      val docShingle = TextOps.docShinglesOf(docs)
      val melt = chain.select(col("doc_a"), col("doc_b"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      val nVerified = melt.join(docShingle, Seq("doc_id"))
        .groupBy("doc_a", "doc_b", "shingle").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(col("cnt")).as("tot"), count(lit(1)).as("n_union"))
        .filter((col("tot") - col("n_union")).cast("double") >= col("n_union") * 0.5)
        .count()
      println(f"[lsh-scale] no-collapse proposal+verify (pre-round-8 shape): " +
        f"$nVerified verified edges — ${(System.nanoTime() - tOld) / 1e9}%.1f s")
    }
    println(f"[lsh-scale] TOTAL $secs%.1f s")
    spark.stop()
  }
}
