package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.Tables

/** End-to-end LLM-training-data pipeline demo — the composed version of the
  * individually-verified operators, the workload a user of this engine runs
  * over a raw corpus:
  *
  *   exact dedup → near-dup drop (rare-shingle blocking) → eval-set
  *   decontamination (8-gram overlap) → repeated-line boilerplate floor
  *   (C4 rule over the survivor set) → quality floor → context packing
  *
  * Each stage reports survivors and wall time. Every stage is the same
  * DataFrame program the oracle-checked query uses, so the pipeline
  * inherits their scale stances (hash-groupBy dedup, bounded blocking,
  * broadcast benchmark side, sharded packing windows).
  *
  *   runMain graft.RunTextPipeline [sfDir=/root/testdata/sf0.1] [shingle|lsh]
  *
  * The optional second arg picks the near-dup PROPOSER: `shingle`
  * (default — rare-shingle df-band blocking, the q_dedup_cluster path) or
  * `lsh` (MinHash band buckets + chain + Jaccard verify, the
  * q_dedup_lsh_cluster path). The df-band blocker goes blind on document
  * families replicated past its df ≤ 10 cap (see ScaleCorpus); LSH has no
  * multiplicity ceiling.
  */
object RunTextPipeline {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val proposer = args.lift(1).getOrElse("shingle")
    require(proposer == "shingle" || proposer == "lsh",
      s"near-dup proposer must be 'shingle' or 'lsh', got '$proposer'")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    var tLast = t0
    def stage(name: String, n: Long, unit: String = "docs"): Unit = {
      val now = System.nanoTime()
      println(f"[pipeline] $name%-22s $n%8d $unit%-4s (+${(now - tLast) / 1e9}%.1f s)")
      tLast = now
    }

    val docs = Tables.documents(spark, d).cache()
    stage("load", docs.count())

    // 1. exact dedup: keep the min doc_id of every content-hash group
    val keepers = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val d1 = docs.join(keepers, Seq("doc_id"), "left_semi").cache()
    stage("exact_dedup", d1.count())

    // 2. near-dup drop, cluster-canonical: pair evidence isn't transitive,
    // so dropping pair losers directly can keep two docs that are both
    // near-dups of a third. Connected components of the pair graph give
    // the duplicate clusters; keep only each cluster's canonical (min-id)
    // doc — the CCNet/SlimPajama-style keep-one rule.
    // The LSH proposer runs over the exact-deduped d1, not the raw corpus:
    // byte-identical copies land in identical band buckets, so removing
    // them preserves connectivity among the survivors (a removed copy that
    // chained two survivors leaves them adjacent in the same bucket) while
    // skipping their window-sort, chain, and Jaccard-probe cost — and the
    // cluster canonical (cluster-min id) is always an exact-dedup keeper,
    // so the loser set within d1 is unchanged. The shingle proposer stays
    // on the raw corpus: its df in [2,10] band COUNTS duplicates, and
    // feeding it d1 would change which shingles are "rare" (the oracle-
    // checked q_dedup_cluster semantics are defined over the raw table).
    val clusterLabels =
      if (proposer == "lsh") TextOps.lshClusterLabels(d1)
      else TextOps.dedupClusterLabelsOf(docs)
    val nearDupLosers = clusterLabels
      .filter(col("doc_id") =!= col("canon_id"))
      .select("doc_id")
    val d2 = d1.join(nearDupLosers, Seq("doc_id"), "left_anti").cache()
    stage(s"near_dedup($proposer)", d2.count())

    // 3. decontamination: drop corpus docs overlapping the benchmark split
    val contaminated = TextOps.q_text_contamination(spark, d)
      .select("doc_id").distinct()
    val d3 = d2.join(contaminated, Seq("doc_id"), "left_anti").cache()
    stage("decontaminate", d3.count())

    // 4. line-level boilerplate floor: C4's repeated-line rule applied as a
    // doc filter over the SURVIVOR set — a doc half or more of whose lines
    // also occur in other surviving docs is boilerplate-dominated even
    // though no single other doc near-duplicates it (the fraction rule, not
    // an absolute token floor, so short-but-unique docs pass through to the
    // quality stage instead of being silently folded in here)
    val boiler = TextOps.lineDedupStats(d3)
      .filter(col("n_dup_lines") * 2 >= col("n_lines")).select("doc_id")
    val d3b = d3.join(boiler, Seq("doc_id"), "left_anti").cache()
    stage("line_boiler_floor", d3b.count())

    // 5. quality floor: ≥ 20 tokens (drops stubs; mirrors q_text_quality's
    // token accounting)
    val d4 = d3b.filter(size(split(col("text"), " ")) >= 20).cache()
    stage("quality_floor", d4.count())

    // 6. pack survivors into 512-token contexts, sharded like q_text_pack
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = d4
      .select(col("source"), pmod(col("doc_id"), lit(4)).as("shard"),
        col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / lit(512.0)).cast("bigint"))
      .groupBy("source", "shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val bins = packed.agg(
      count(lit(1)).as("n_bins"), sum(col("n_tokens")).as("tokens")).collect()(0)
    stage("pack", bins.getLong(0), "bins")
    println(f"[pipeline] packed ${bins.getLong(1)} tokens into ${bins.getLong(0)} " +
      f"bins; total ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
