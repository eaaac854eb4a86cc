package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis, VectorOps}

/** Invariants for the no-oracle text-analysis and ANN queries. */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("langid: predictions in the model's language set, deterministic") {
    val rows = TextAnalysis.q_text_langid(s, sf).collect()
    assert(rows.nonEmpty)
    val langs = Set("en", "de", "es", "fr", "zh", "und")
    assert(rows.forall(r => langs.contains(r.getAs[String]("pred"))))
    // the synthetic corpus is English-vocabulary for every label row, so the
    // marker vote should overwhelmingly say 'en'
    val en = rows.count(_.getAs[String]("pred") == "en")
    assert(en.toDouble / rows.length > 0.9, s"only $en/${rows.length} voted en")
    val again = TextAnalysis.q_text_langid(s, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("pii mask: every planted instance found and redacted, none survive") {
    val rows = TextAnalysis.q_text_pii_mask(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[String]("masked")
      // exactly the planted instance of each kind (base corpus is word soup)
      assert(r.getAs[Long]("n_emails") == 1L, s"emails: $r")
      assert(r.getAs[Long]("n_phones") == 1L, s"phones: $r")
      assert(r.getAs[Long]("n_ips") == 1L, s"ips: $r")
      assert(m.contains("<EMAIL>") && m.contains("<PHONE>") && m.contains("<IP>"))
      // nothing PII-shaped survives the mask
      assert(!m.contains("@"), s"unmasked email in: $m")
      assert(!m.matches(""".*\+\d{1,3}-\d{3}-\d{4}.*"""), s"unmasked phone in: $m")
      assert(!m.matches(""".*\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}.*"""), s"unmasked ip in: $m")
    }
  }

  test("fingerprint: 4 sorted hashes per doc; identical docs share sketches") {
    val fps = TextAnalysis.q_text_fingerprint(s, sf).collect()
    assert(fps.nonEmpty)
    fps.foreach { r =>
      // sketch is comma-joined (scalar output contract for declared queries)
      val fp = r.getString(1).split(",").map(_.toLong).toSeq
      assert(fp.length == 4 && fp == fp.sorted)
    }
  }

  test("ANN LSH: buckets partition vectors; recall vs exact baseline is nonzero") {
    val ann = VectorOps.q_sim_ann_lsh(s, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(ann.nonEmpty)
    assert(ann.values.forall(_.size <= 3))
    // exact global top-3 per probe (label-free brute force in the driver)
    val emb = graft.Tables.embeddings(s, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    var hit = 0; var tot = 0
    for ((u, found) <- ann.take(30)) {
      val exact = emb.filter(_._1 != u).toSeq
        .map { case (w, v) => (w, cos(emb(u), v)) }
        .sortBy { case (w, c) => (-c, w) }.take(3).map(_._1).toSet
      hit += found.intersect(exact).size; tot += exact.size
    }
    // sign-LSH on gaussian data is approximate: just require clearly-better-
    // than-nothing recall (random 3-of-500 would be ~0.006)
    assert(hit.toDouble / tot > 0.05, s"recall ${hit.toDouble / tot}")
  }

  test("ANN IVF: 16 cells partition vectors; recall vs exact baseline is nonzero") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorOps.l2norm(col("v")))
    val assigned = VectorOps.ivfAssign(emb, 16)
    assert(assigned.count() == emb.count()) // every vector lands in a cell
    val cells = assigned.select("cell").distinct().count()
    assert(cells > 1 && cells <= 16)
    val out = VectorOps.q_sim_ann_ivf(s, sf).collect()
    assert(out.nonEmpty)
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    // determinism
    val again = VectorOps.q_sim_ann_ivf(s, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // multiprobe dominance: nprobe=2 searches a superset of nprobe=1's
    // candidates, so each probe's best found cosine can only improve
    val best1 = VectorOps.ivfTopK(s, sf, nprobe = 1).collect()
      .filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val best2 = out.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(best1.keySet.subsetOf(best2.keySet))
    for ((u, c1) <- best1) assert(best2(u) >= c1, s"multiprobe lost recall at probe $u")
  }

  test("ANN recall audit: bounded, deterministic; probing all cells snaps recall to 1") {
    val rows = VectorOps.q_sim_ann_recall(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $r")
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_true"))
    }
    val again = VectorOps.q_sim_ann_recall(s, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the audit audits itself: with every cell probed IVF is exhaustive,
    // and under the shared (rounded-cosine, id) tiebreak its top-3 must
    // EQUAL the brute-force ground truth pair for pair
    val truth = VectorOps.bruteTopK(s, sf, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = VectorOps.ivfTopK(s, sf, nprobe = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth == exhaustive,
      s"exhaustive IVF diverged from brute force: ${(truth -- exhaustive).take(3)} / ${(exhaustive -- truth).take(3)}")
  }

  test("gopher quality: ratios bounded, keep decision matches its thresholds") {
    val rows = TextAnalysis.q_text_quality_gopher(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rep = r.getAs[Double]("rep_ratio")
      val top = r.getAs[Double]("top_bigram_frac")
      val keep = r.getAs[Long]("keep")
      assert(rep >= 0.0 && rep < 1.0, s"rep_ratio out of range: $r")
      assert(top >= 0.0 && top <= 1.0, s"top_bigram_frac out of range: $r")
      val expect =
        if (r.getAs[Long]("n_tokens") >= 20 && rep <= 0.6 && top <= 0.05) 1L else 0L
      assert(keep == expect, s"keep decision disagrees with thresholds: $r")
    }
    // the synthetic corpus must split non-trivially or the filter is vacuous
    val kept = rows.count(_.getAs[Long]("keep") == 1L)
    assert(kept > 0 && kept < rows.length, s"degenerate keep split: $kept/${rows.length}")
  }

  test("quota sample: per-lang cap respected, ranks gapless, deterministic") {
    val rows = TextAnalysis.q_sample_quota(s, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val docs = graft.Tables.documents(s, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(docs(lang), 25L).toInt,
        s"$lang quota: ${rs.length} of ${docs(lang)}")
      // ranks are 1..n with no gaps, each mapping to a distinct doc
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length),
        s"$lang ranks not gapless")
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length == rs.length)
    }
    val again = TextAnalysis.q_sample_quota(s, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("gopher quality edge cases: single-token doc (no bigrams) and pure repetition") {
    val sess = s
    import sess.implicits._
    val docs = Seq(
      (1L, "hello"),                                        // 1 token, no bigrams
      (2L, Seq.fill(30)("spam").mkString(" ")),             // pure repetition
      (3L, (1 to 30).map(i => s"tok$i").mkString(" "))      // clean, all distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // bigram-less doc: top_bigram_frac coalesces to 0, fails the length floor
    assert(out(1L).getAs[Long]("n_tokens") == 1L)
    assert(out(1L).getAs[Double]("rep_ratio") == 0.0)
    assert(out(1L).getAs[Double]("top_bigram_frac") == 0.0)
    assert(out(1L).getAs[Long]("keep") == 0L)
    // 30x one token: rep_ratio = 1 - 1/30, one bigram holds all mass
    assert(math.abs(out(2L).getAs[Double]("rep_ratio") - (1.0 - 1.0 / 30)) < 1e-6)
    assert(out(2L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(out(2L).getAs[Long]("keep") == 0L)
    // all-distinct doc: rep 0, every bigram unique (1/29), passes
    assert(out(3L).getAs[Double]("rep_ratio") == 0.0)
    assert(math.abs(out(3L).getAs[Double]("top_bigram_frac") - 1.0 / 29) < 1e-4)
    assert(out(3L).getAs[Long]("keep") == 1L)
  }

  test("lm score: hand-checked add-1 smoothing on a tiny corpus; typical beats gibberish") {
    import s.implicits._
    // corpus: V = 4 (a b x y); bigram counts "a b"=2, "b a"=1, "x y"=1;
    // context counts a=2, b=1, x=1
    val docs = Seq((1L, "a b a b"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    // V counts the z token too: vocab = 5
    val v = 5.0
    val d1 = (math.log((2 + 1) / (2 + v)) * 2 + math.log((1 + 1) / (1 + v))) / 3
    val d2 = math.log((1 + 1) / (1 + v))
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - math.rint(d1 * 1e6) / 1e6) < 1e-9)
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - math.rint(d2 * 1e6) / 1e6) < 1e-9)
    // single-token doc has no bigrams -> no row
    assert(!out.contains(3L))
    // the repeated-bigram doc is more "typical of the corpus"
    assert(out(1L)._2 > out(2L)._2)
    // real corpus: every doc scored, negative log-probs, n_bigrams = tokens-1
    val real = TextAnalysis.q_text_lm_score(s, sf).collect()
    val nDocs = Tables.documents(s, sf).count()
    assert(real.length == nDocs)
    real.foreach(r => assert(r.getAs[Double]("avg_logp") < 0.0))
  }

  test("quality: ratios bounded and stopword counting sane") {
    val rows = TextAnalysis.q_text_quality(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0.0 && sr <= 1.0)
      assert(r.getAs[Double]("quality") <= 1.0)
      assert(r.getAs[Double]("avg_token_len") > 0)
    }
  }
}
