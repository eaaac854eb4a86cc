package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for pipeline stress runs: replicate every
  * document R× (and, round-17, every embedding R× — same replica rule with
  * a one-coordinate ε nudge standing in for the text marker), writing
  * `<outDir>/documents.parquet` / `<outDir>/embeddings.parquet` with the
  * source schemas. Replica i of doc_id D gets doc_id D*R+i and:
  *   - i = 0: the original text;
  *   - odd i: an EXACT copy (exact-dedup food);
  *   - even i > 0: the text plus a per-replica marker token (a near-dup —
  *     shares every original shingle, adds one).
  * Replication is a deterministic `posexplode(sequence)` — no driver loop,
  * no RNG; the expansion distributes with the scan. The point of the shape:
  * post-exact-dedup each family still has ~R/2 distinct near-identical
  * texts, so every shared shingle's doc-frequency is ~R/2 — past the
  * rare-shingle df ≤ 10 cap once R > ~20, which is exactly the
  * mass-duplication regime q_dedup_lsh_cluster exists for.
  *
  *   runMain graft.ScaleCorpus <srcSfDir> <outDir> <R>
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: runMain graft.ScaleCorpus <srcSfDir> <outDir> <R>")
    val Array(src, out, rStr) = args.take(3)
    val r = rStr.toInt
    require(r >= 1, s"R must be >= 1, got $r")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, src)
    val cols = docs.columns
    val scaled = docs
      .select(col("*"), posexplode(sequence(lit(0), lit(r - 1))).as(Seq("i", "unused")))
      .withColumn("new_id", col("doc_id") * r + col("i"))
      .withColumn("new_text",
        when(col("i") === 0 || pmod(col("i"), lit(2)) === 1, col("text"))
          .otherwise(concat(col("text"), lit(" xrep"), col("i"))))
      .drop("doc_id", "text", "unused", "i")
      .withColumnRenamed("new_id", "doc_id")
      .withColumnRenamed("new_text", "text")
      // keep derived metadata true for the mutated replicas
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .select(cols.map(col): _*)
    scaled.write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[scale-corpus] wrote ${spark.read.parquet(s"$out/documents.parquet").count()} docs (R=$r) to $out")
    // embeddings too (round-17 item 6: the semantic/ANN scale rows need
    // them): replica i of vec_id V gets vec_id V*R+i; odd i is an EXACT
    // copy (semantic exact-dup food), even i > 0 nudges ONE coordinate by
    // a tiny deterministic ε — cosine stays ≈ 1, a near-dup family of ~R/2
    // distinct members per original, the same mass-duplication shape the
    // documents side gets
    val emb = Tables.embeddings(spark, src)
    val embCols = emb.columns
    val scaledEmb = emb
      .select(col("*"), posexplode(sequence(lit(0), lit(r - 1))).as(Seq("i", "unused")))
      .withColumn("new_id", col("vec_id") * r + col("i"))
      .withColumn("new_emb",
        when(col("i") === 0 || pmod(col("i"), lit(2)) === 1, col("embedding"))
          .otherwise(concat(
            array((col("embedding").getItem(0) +
              col("i").cast("float") * lit(1e-4f)).cast("float")),
            slice(col("embedding"), 2, 1000000))))
      .drop("vec_id", "embedding", "unused", "i")
      .withColumnRenamed("new_id", "vec_id")
      .withColumnRenamed("new_emb", "embedding")
      .select(embCols.map(col): _*)
    scaledEmb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[scale-corpus] wrote ${spark.read.parquet(s"$out/embeddings.parquet").count()} vectors (R=$r) to $out")
    spark.stop()
  }
}
