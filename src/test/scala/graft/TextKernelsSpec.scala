package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ShingleHash
import graft.ops.TextOps

/** The native shingle+hash kernels must be BIT-IDENTICAL to the HOF
  * formulations they replaced: same split(" ") token semantics (empty
  * tokens preserved), same xxhash64 seed chain, same multiset-k-smallest
  * sketch. Verified on the real documents table plus adversarial strings
  * (runs of spaces, exactly-5 tokens, multibyte UTF-8). */
class TextKernelsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val adversarial = Seq(
    "",                       // 1 empty token
    "a b c d",                // 4 tokens — no shingle
    "a b c d e",              // exactly one shingle
    "a  b   c d e f",         // runs of spaces → empty tokens preserved
    " leading and trailing ", // boundary empty tokens
    "čeští vědci žijí v Ústí nad Labem", // multibyte UTF-8
    "x " * 300 + "x")         // long doc

  private def corpus = Tables.documents(s, TestSpark.sf).select("doc_id", "text")
    .union(adversarial.zipWithIndex
      .map { case (t, i) => (100000L + i, t) }.toDF("doc_id", "text"))

  test("ShingleBandMins matches the aggregate-fold HOF band minima bit for bit") {
    val hof = corpus
      .select(col("doc_id"),
        when(size(split(col("text"), " ")) >= 5,
          aggregate(
            TextOps.shingles(split(col("text"), " ")),
            array((0 until 4).map(_ => lit(Long.MaxValue)): _*),
            (acc, sh) => zip_with(
              acc,
              array((0 until 4).map(b => xxhash64(lit(b), sh)): _*),
              (m, h) => least(m, h)))).as("mins"))
    val native = corpus
      .select(col("doc_id"), ShingleHash.bandMins(col("text"), 4).as("mins"))
    val diff = hof.join(native.withColumnRenamed("mins", "mins2"), "doc_id")
      .filter(!(col("mins") <=> col("mins2")))
    assert(diff.count() == 0, diff.limit(5).collect().mkString("\n"))
  }

  test("ShingleMinK matches sort+slice of the full shingle hash list bit for bit") {
    val hof = corpus
      .select(col("doc_id"),
        slice(array_sort(transform(
          TextOps.shingles(split(col("text"), " ")),
          sh => xxhash64(sh))), 1, 4).as("fp"))
    val native = corpus
      .select(col("doc_id"), ShingleHash.minK(col("text"), 4).as("fp"))
    val diff = hof.join(native.withColumnRenamed("fp", "fp2"), "doc_id")
      .filter(!(col("fp") <=> col("fp2")))
    assert(diff.count() == 0, diff.limit(5).collect().mkString("\n"))
  }

  test("NgramStrings matches the transform/slice/array_join HOF grams bit for bit (g = 2, 3, 5)") {
    for (g <- Seq(2, 3, 5)) {
      val hof = corpus.select(col("doc_id"),
        TextOps.ngrams(split(col("text"), " "), g).as("sh"))
      val native = corpus.select(col("doc_id"),
        graft.functions.ShingleHash.ngramArr(col("text"), g).as("sh2"))
      val diff = hof.join(native, "doc_id").filter(!(col("sh") <=> col("sh2")))
      assert(diff.count() == 0, s"g=$g: " + diff.limit(5).collect().mkString("\n"))
    }
  }

  test("SimHashBands matches the 64-agg-buffer groupBy formulation bit for bit") {
    // the expression form this kernel replaced: per-token md5-hex nibble
    // parse, 64 per-bit set-count sum() buffers in one groupBy(doc_id),
    // bucket = Σ_r [2·nset ≥ n]·2^r per 16-bit band
    val sig = corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), substring(md5(col("tok")), 1, 16).as("h"))
    val digits = sig.select(col("doc_id"),
      transform(sequence(lit(0), lit(15)), p => {
        val ch = col("h").substr(p.cast("int") + 1, lit(1))
        when(ascii(ch) <= 57, ascii(ch) - 48).otherwise(ascii(ch) - 87)
      }).as("dg"))
    val nset = (0 until 64).map { j =>
      sum(shiftright(element_at(col("dg"), j / 4 + 1), j % 4)
        .bitwiseAND(lit(1)).cast("long")).as(s"b$j")
    }
    val agged = digits.groupBy("doc_id").agg(count(lit(1)).as("n"), nset: _*)
    val buckets = (0 until 4).map { b =>
      (0 until 16).map { r =>
        val j = b * 16 + r
        when(col(s"b$j") * 2 >= col("n"), lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val aggForm = agged.select(col("doc_id"), array(buckets: _*).as("bk"))
    val native = corpus.select(col("doc_id"),
      ShingleHash.simhashBands(col("text"), 4, 16).as("bk2"))
    val diff = aggForm.join(native, "doc_id").filter(!(col("bk") <=> col("bk2")))
    assert(diff.count() == 0, diff.limit(5).collect().mkString("\n"))
  }

  test("HashedNgramSet matches the distinct independent-xxhash64 expression form (g = 5, 8)") {
    // the expression form the kernel replaced: per-doc distinct
    // struct(xxhash64(sh), xxhash64(lit(1L), sh)) over the gram STRINGS.
    // NOTE h2 hashes the salt FIRST — xxhash64(lit(1L), sh) accumulates
    // seed 42 → hashLong(1L) → the bytes, so h2 is an independent pass
    // with a different seed, NOT r17's h2 = f(h1) seed chain. The kernel
    // must reproduce the exact values AND the per-doc set semantics
    // (order-insensitive compare via array_sort of the structs).
    for (g <- Seq(5, 8)) {
      val expr = corpus
        .select(col("doc_id"),
          explode(graft.functions.ShingleHash.ngramArr(col("text"), g)).as("sh"))
        .select(col("doc_id"),
          struct(xxhash64(col("sh")).as("h1"),
            xxhash64(lit(1L), col("sh")).as("h2")).as("k"))
        .distinct()
        .groupBy("doc_id").agg(array_sort(collect_list(col("k"))).as("ks"))
      val native = corpus
        .select(col("doc_id"),
          explode(graft.functions.ShingleHash.hashedNgramSet(col("text"), g)).as("k"))
        .groupBy("doc_id").agg(array_sort(collect_list(col("k"))).as("ks2"))
      val joined = expr.join(native, Seq("doc_id"), "full")
      val diff = joined.filter(!(col("ks") <=> col("ks2")))
      assert(diff.count() == 0, s"g=$g: " + diff.limit(5).collect().mkString("\n"))
      // docs with <g tokens emit an EMPTY array (explode drops them) on
      // both sides — the full join above would surface a one-sided doc
    }
    // in-doc duplicate grams collapse to ONE key (the .distinct() twin)
    val dup = Seq((1L, "p q p q p q p q")).toDF("doc_id", "text") // 3 distinct 5-grams... 4 tokens repeated
    val n = dup.select(explode(
      graft.functions.ShingleHash.hashedNgramSet(col("text"), 2)).as("k"))
      .distinct().count()
    val raw = dup.select(explode(
      graft.functions.ShingleHash.hashedNgramSet(col("text"), 2)).as("k")).count()
    assert(n == raw, "kernel must emit each distinct gram exactly once")
    assert(n == 2, s"'p q'/'q p' are the only distinct 2-grams, got $n")
  }

  test("kernel queries still satisfy their invariants: exact dups share all 4 LSH buckets") {
    val dup = Seq((1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "totally different text goes here now")).toDF("doc_id", "text")
    val mins = dup.select(col("doc_id"),
      ShingleHash.bandMins(col("text"), 4).as("mins")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mins(1L) == mins(2L))
    assert(mins(1L) != mins(3L))
  }

  test("text kernels are callable from SQL after install") {
    graft.functions.GraftExtensions.install(s)
    val r = s.sql(
      """SELECT shingle_band_mins('a b c d e f', 4) AS bm,
        |       shingle_min_k('a b c d e f', 2) AS mk,
        |       ngram_strings('a b c', 2) AS ng""".stripMargin).collect()(0)
    val viaCol = Seq(("a b c d e f", "a b c")).toDF("t", "u")
      .select(ShingleHash.bandMins(col("t"), 4).as("bm"),
        ShingleHash.minK(col("t"), 2).as("mk"),
        ShingleHash.ngramArr(col("u"), 2).as("ng")).collect()(0)
    assert(r.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(r.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(r.getSeq[String](2) == viaCol.getSeq[String](2))
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
    // non-literal width arg is a clear error, not a silent misplan
    val err = intercept[Exception](s.sql(
      "SELECT ngram_strings('a b c', CAST(doc_id AS INT)) FROM parquet.`" +
        TestSpark.sf + "/documents.parquet`").collect())
    assert(err.getMessage.contains("literal INT"))
  }
}
