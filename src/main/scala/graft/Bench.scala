package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query, prints ONE JSON line.
  *
  * Env knobs (driver uses the defaults):
  *  - SPARK_GRAFT_SF_DIR:    data dir (default sf0.1)
  *  - SPARK_GRAFT_CPUS:      local[] threads + shuffle partitions
  *  - SPARK_GRAFT_BENCH_REPS: runs per query, min is reported (default 3:
  *    the machine has noisy external load — swings of 1.4↔24s between
  *    identical runs were measured, and round-3's single-rep driver bench
  *    carried ~70 s of phantom spikes — min-of-3 makes the number
  *    reproducible)
  * Optional args restrict the run to the named queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val only = args.toSet
    // wipe guard (round-16 item 5): the driver wipes target/ between rounds
    // and leaves STUB classes whose query map is empty — a "fresh-boot"
    // bench against them prints total 0.0 s and the pair is silently lost
    // (the round-15 fresh pair died exactly this way, README "fresh-boot
    // pair"). An empty map can never be a real benchmark: abort loudly
    // BEFORE starting a session so the caller recompiles first.
    // Defense-in-depth only (round-16 ADVICE): when target/ holds the FULL
    // stub set, the stub Bench (without this check) is what runs, so this
    // guard can't fire — tools/run_main.sh's graft/ops class-file check is
    // the effective layer for that case, and ROUND_CLOSE.md requires
    // launching benches through it. This in-process check covers the
    // mixed/partial-compile states the launcher check can't see.
    if (SparkEntry.queries.isEmpty) {
      System.err.println("BENCH ABORT: SparkEntry.queries is empty — " +
        "target/ holds the driver's stub classes, not the compiled " +
        "library. Run `sbt -batch compile` first, then re-run the bench.")
      sys.exit(3)
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/parquet-footer paths once so the first timed
    // query doesn't absorb session startup cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // noop-format write, not count(): count() lets Spark elide the final
    // global sort of orderBy().limit() plans, undercounting the ordering
    // cost the driver's Verify parquet dump actually pays
    val qlist = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
    // reps are interleaved ROUND-ROBIN (pass 1 over every query, then pass
    // 2, ...) rather than back-to-back per query: the machine's external
    // load arrives in multi-minute windows, and back-to-back reps of one
    // query all land inside the same window — its min-of-3 then records the
    // spike as if it were the query's cost (round 6's recorded 36.6 s for a
    // true 2.3 s query). With passes spaced a full sweep apart, a loaded
    // window inflates one pass of a few queries and the min survives.
    val best = scala.collection.mutable.Map.empty[String, Double]
    // a query that throws must not pass silently: its (meaningless) timing
    // still lands in the map so the driver sees every declared name, but
    // the line carries an "errs" count naming the driver's attention
    val failed = scala.collection.mutable.Set.empty[String]
    for (_ <- 1 to reps; (name, fn) <- qlist) {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      best(name) = best.get(name).fold(t)(math.min(_, t))
    }
    val results = qlist.map { case (name, _) => name -> best(name) }
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // The driver keeps only the LAST 2000 chars of stdout (measured from
    // BENCH_r01..r06: every `tail` field is exactly 2000 chars and every
    // `parsed` is null — the full 80-to-90-entry queries map has NEVER fit
    // once sbt's ~75-char "[success] Total time" suffix is subtracted). So
    // the stdout line is budgeted to ≤ ~1800 chars: queries are listed
    // individually from slowest down while the line stays under budget,
    // and the remainder — all faster than anything listed — is aggregated
    // as rest_n/rest_s. `value` is still the total over ALL queries. The
    // complete per-query map goes to bench_full.json next to the repo for
    // local analysis (written before the line prints, never to stdout).
    val fullJson = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (s"""{"total":${fmt(total)},"sf":"$sfDir","queries":$fullJson}""" + "\n")
        .getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // failed queries time near-0 (fail-fast), sort to the fast end, and
    // would vanish into rest_n — force them to the FRONT of the listing so
    // the driver always sees which name broke, then slowest-first
    val bySlow = results.sortBy { case (k, v) => (!failed(k), -v, k) }
    val budget = 1800
    val sb = new StringBuilder
    var listed = 0
    var restN = 0
    var restS = 0.0
    val fixedOverhead = 140 + sfDir.length // header + rest_n/rest_s + sf suffix
    // stop at the FIRST entry that doesn't fit: everything folded into
    // rest_n/rest_s is then genuinely no slower than anything listed (a
    // keep-scanning loop would hide a long-named slow query in rest_s
    // while still listing shorter-named faster ones)
    var full = false
    for ((k, v) <- bySlow) {
      val entry = "\"" + k + "\":" + fmt(v)
      if (!full && sb.length + entry.length + 1 + fixedOverhead < budget) {
        if (listed > 0) sb.append(',')
        sb.append(entry); listed += 1
      } else { full = true; restN += 1; restS += v }
    }
    val restPart =
      if (restN > 0) s""","rest_n":$restN,"rest_s":${fmt(restS)}""" else ""
    val errPart = if (failed.nonEmpty) s""","errs":${failed.size}""" else ""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{${sb.toString}}$restPart$errPart,"sf":"$sfDir"}""")
    spark.stop()
  }
}
