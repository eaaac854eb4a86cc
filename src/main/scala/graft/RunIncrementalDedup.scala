package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.IncrementalDedup

/** Persisted-state incremental dedup — the production daily-crawl flow,
  * end to end: split the documents table into `nBatches` arrival batches
  * (doc_id mod nBatches), process them as SEPARATE invocations (or all in
  * sequence), each batch deduping against the parquet index the previous
  * batches persisted, never against re-read historical text.
  *
  *   runMain graft.RunIncrementalDedup <sfDir> <stateDir> <nBatches> \
  *     [batchIdx] [--no-audit]
  *
  * With `batchIdx` given, processes exactly that batch against whatever
  * state `stateDir` holds — run 0, then 1, ... as separate processes to
  * demonstrate state survival across JVMs. Without it, runs every batch in
  * order in one process. The per-batch giant-near-family ceiling audit
  * (processBatch(audit = true) — computed from the batch's own PRE-append
  * frames, so the just-appended state can never feed the audit its own
  * hashes) is ON by default here: its cost measured within run noise at
  * the 24x replication fixture (README round 17). `--no-audit` opts out;
  * the library default stays audit = false (plan purity for
  * q_dedup_incremental and embedding callers). After the FINAL batch (either mode), audits
  * the accumulated decisions:
  *   (1) every corpus doc has exactly one decision row;
  *   (2) kept docs' md5s are globally UNIQUE — batch k can never re-accept
  *       content batch j<k accepted (the cross-JVM state-correctness bit);
  *   (3) every zero-kept hash group was dropped for a RECORDED reason: some
  *       member saw n_near > 0 with is_exact_dup = 0 (near-represented in
  *       the index) — content never silently vanishes.
  */
object RunIncrementalDedup {
  def main(args: Array[String]): Unit = {
    // audit defaults ON in this production harness (round-17 item 4): at
    // the 24x replication fixture the measured delta is within run noise
    // (audit 100.0 s vs no-audit 114.9 s total — the audit run was FASTER;
    // the diag reuses the batch's already-checkpointed postings, so the
    // marginal work is one survivor count + one df aggregation + <=8
    // melts). The LIBRARY default stays processBatch(audit = false):
    // q_dedup_incremental's declared plan must remain pure-lazy, and
    // embedding callers opt in explicitly.
    val audit = !args.contains("--no-audit")
    val pos = args.filterNot(a => a == "--audit" || a == "--no-audit")
    if (pos.length < 3) {
      System.err.println("usage: RunIncrementalDedup <sfDir> <stateDir> " +
        "<nBatches> [batchIdx] [--no-audit]")
      sys.exit(2)
    }
    val d = pos(0)
    val stateDir = pos(1)
    val nBatches = pos(2).toInt
    val only = pos.lift(3).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    def secs = (System.nanoTime() - t0) / 1e9

    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def runBatch(b: Int): Unit = {
      val batch = docs.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === b)
      val state = IncrementalDedup.loadState(spark, stateDir)
      // audit (opt-in): processBatch computes the ceiling diag EAGERLY from
      // its own pre-append frames and hands back plain longs — by the time
      // appendState below has re-listed the state dirs, the audit is done,
      // so it can never see the batch's own just-appended hashes (the
      // round-16 ordering fix; the old post-append ceilingDiag call flipped
      // every accepted survivor to exact-dup and silently never flagged)
      val r = IncrementalDedup.processBatch(batch, state, audit = audit)
      // one materialization; the three writes below reuse it
      val dec = r.decisions
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = dec.agg(count(lit(1)), sum(col("is_exact_dup")),
        sum(when(col("n_near") > 0, 1L).otherwise(0L)), sum(col("keep"))).collect()(0)
      IncrementalDedup.appendState(stateDir, b,
        IncrementalDedup.BatchResult(dec, r.acceptedHashes, r.acceptedPostings))
      println(f"[incdedup] batch $b/$nBatches: ${stats.getLong(0)}%6d docs, " +
        f"${stats.getLong(1)}%5d exact-dup, ${stats.getLong(2)}%5d near-hit, " +
        f"${stats.getLong(3)}%6d accepted ($secs%.1f s)")
      r.ceiling.foreach { cd =>
        if (cd.overCeilingShingles > 0)
          println(s"[incdedup] batch $b ceiling audit: $cd" +
            (if (cd.flagged) "  <- AUDIT: probable giant near-family accepted"
             else ""))
      }
      dec.unpersist()
    }

    only match {
      case Some(b) => runBatch(b)
      case None    => (0 until nBatches).foreach(runBatch)
    }

    // audit after the final batch
    val isFinal = only.forall(_ == nBatches - 1)
    if (isFinal) {
      val decisions = spark.read.parquet(s"$stateDir/decisions")
      val n = decisions.count()
      val nDocs = docs.count()
      require(n == nDocs, s"decision rows $n != corpus docs $nDocs")
      require(decisions.select("doc_id").distinct().count() == nDocs,
        "a doc was decided more than once")
      val keptH = decisions.filter(col("keep") === 1)
        .join(docs, Seq("doc_id")).select(md5(col("text")).as("h"))
      val keptN = keptH.count()
      val keptD = keptH.distinct().count()
      require(keptN == keptD, s"kept docs share md5s: $keptN rows, $keptD distinct")
      // zero-kept hash groups must carry a recorded near-dup reason
      val byH = decisions.join(docs, Seq("doc_id"))
        .select(md5(col("text")).as("h"), col("keep"), col("n_near"), col("is_exact_dup"))
        .groupBy("h").agg(sum(col("keep")).as("nk"),
          sum(when(col("n_near") > 0 && col("is_exact_dup") === 0, 1L)
            .otherwise(0L)).as("nreason"))
      val silent = byH.filter(col("nk") === 0 && col("nreason") === 0).count()
      require(silent == 0, s"$silent hash groups vanished with no recorded reason")
      val nH = byH.count()
      println(f"[incdedup] AUDIT ok: $nDocs docs -> $keptN kept " +
        f"($nH distinct hashes, ${nH - keptD} groups near-dropped) ($secs%.1f s)")
    }
    println(f"[incdedup] TOTAL $secs%.1f s")
    spark.stop()
  }
}
