package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.VectorOps

/** Product-quantization invariants: deterministic codes, exact copies
  * share codes, MSE is a true squared error (≥ 0, 0 for a vector that IS
  * a concatenation of centroids), and 2 Lloyd rounds reconstruct no worse
  * than the raw seed codebooks (the monotone within-cluster-SS property
  * of Lloyd's algorithm — each assign and each update step can only lower
  * total squared error). */
class PqSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  test("native PqCodes/AdcDistance match the HOF least-struct forms bit for bit") {
    import graft.functions.PqFns
    val m = 8; val dsub = 8
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val books = VectorOps.pqCodebooks(emb, m, dsub, k = 16, iters = 2)
    // the replaced HOF form: per subspace least(struct(aggregate-dist, code))
    val hofParts = (0 until m).map { j =>
      val sv = slice(col("v"), j * dsub + 1, dsub)
      least(books(j).zipWithIndex.map { case (cv, c) =>
        val lcv = array(cv.toIndexedSeq.map(lit): _*)
        struct(aggregate(zip_with(sv, lcv, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x).as("dist"), lit(c.toLong).as("code"))
      }.toIndexedSeq: _*)
    }
    val hof = emb.select(col("vec_id") +:
        hofParts.zipWithIndex.map { case (p, j) => p.as(s"p$j") }: _*)
      .select(col("vec_id"),
        array((0 until m).map(j => col(s"p$j.code")): _*).as("codes"),
        (0 until m).map(j => col(s"p$j.dist")).reduce(_ + _).as("err"))
    val nat = emb.select(col("vec_id"), PqFns.pqCodes(col("v"), books).as("pq"))
      .select(col("vec_id"), col("pq.codes").as("codes2"), col("pq.err").as("err2"))
    val diff = hof.join(nat, "vec_id")
      .filter(!(col("codes") <=> col("codes2")) || !(col("err") <=> col("err2")))
    assert(diff.count() == 0, diff.limit(5).collect().mkString("\n"))
    // ADC vs the HOF element_at lookup form, on real (probe, codes) pairs
    val codes = nat.select(col("vec_id"), col("codes2").as("codes"))
    val pairs = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("u"), col("v").as("uv"))
      .crossJoin(codes.filter(col("vec_id") < 50)
        .select(col("vec_id").as("w"), col("codes")))
    val hofAdc = (0 until m).map { j =>
      val bookLit = array(books(j).toIndexedSeq.map(cv =>
        array(cv.toIndexedSeq.map(lit): _*)): _*)
      aggregate(zip_with(slice(col("uv"), j * dsub + 1, dsub),
        element_at(bookLit, element_at(col("codes"), j + 1).cast("int") + 1),
        (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
    }.reduce(_ + _)
    val adcDiff = pairs
      .select(hofAdc.as("a"), PqFns.adcDistance(col("uv"), col("codes"), books).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(adcDiff.count() == 0, adcDiff.limit(5).collect().mkString("\n"))
  }

  test("q_embed_pq: coverage, mse >= 0, deterministic") {
    val rows = VectorOps.q_embed_pq(s, TestSpark.sf).collect()
    val n = Tables.embeddings(s, TestSpark.sf).count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getAs[Double]("mse") >= 0.0, s"negative mse: $r")
      // 8 comma-joined nibble codes in [0, 16)
      val codes = r.getAs[String]("pq_code").split(",").map(_.toInt)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 16))
    }
    val again = VectorOps.q_embed_pq(s, TestSpark.sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("exact copies share codes; a seed vector reconstructs near-exactly at iters=0") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val v7 = emb.filter(col("vec_id") === 7L).collect().head.getSeq[Double](1).toArray
    val withCopy = emb.unionByName(Seq((100007L, v7)).toDF("vec_id", "v"))
    val out = VectorOps.pqAudit(withCopy, iters = 0).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("pq_code"), r.getAs[Double]("mse"))).toMap
    // identical input -> identical codes and identical mse
    assert(out(7L) == out(100007L))
    // at iters=0 the codebooks ARE the first 16 vectors' subvectors, so
    // vector 7 quantizes onto itself: every subspace distance is 0
    assert(out(7L)._2 == 0.0, s"seed vector should reconstruct exactly: ${out(7L)}")
  }

  test("IVF+PQ ADC: shape, determinism, real recall vs the exact-L2 baseline") {
    val out = VectorOps.q_sim_ann_ivfpq(s, TestSpark.sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      rs.foreach(r => assert(r.getAs[Double]("adc_dist") >= 0.0))
    }
    val again = VectorOps.q_sim_ann_ivfpq(s, TestSpark.sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // recall@3 of the ADC ranking against the exact L2 ground truth —
    // driver-side brute force over the fixture (500 x 64)
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var sum = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); sum += t * t; i += 1 }
      sum
    }
    var hit = 0; var tot = 0
    for (u <- emb.keys.filter(_ < 100)) {
      val exact = emb.filter(_._1 != u)
        .map { case (w, wv) => (l2(emb(u), wv), w) }
        .toSeq.sortBy(identity).take(3).map(_._2).toSet
      val found = out.filter(_.getLong(0) == u).map(_.getLong(1)).toSet
      hit += found.intersect(exact).size; tot += exact.size
    }
    // cell blocking + 16-centroid nibble codes are coarse on gaussian
    // data: require clearly-better-than-random (3-of-499 ≈ 0.006)
    assert(hit.toDouble / tot > 0.1, s"ADC recall ${hit.toDouble / tot}")
  }

  test("pq kernels fail fast on EITHER dim mismatch: shorter AND longer than the codebook span") {
    import graft.functions.PqFns
    val books = Array.tabulate(2)(_ => Array.tabulate(2)(c =>
      Array.fill(4)(c.toDouble))) // span = 2 subspaces x 4 dims = 8
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    for (badDim <- Seq(7, 9)) { // one short, one long
      val bad = Seq((1L, Array.fill(badDim)(1.0))).toDF("vec_id", "v")
      val exC = intercept[Throwable] {
        bad.select(PqFns.pqCodes(col("v"), books)).collect() }
      assert(chain(exC).exists(_.contains("pq_codes")),
        s"dim=$badDim: ${chain(exC).mkString(" | ")}")
      val exA = intercept[Throwable] {
        bad.withColumn("codes", array(lit(0L), lit(1L)))
          .select(PqFns.adcDistance(col("v"), col("codes"), books)).collect() }
      assert(chain(exA).exists(_.contains("adc_distance")),
        s"dim=$badDim: ${chain(exA).mkString(" | ")}")
    }
    // the exact span evaluates clean
    val ok = Seq((1L, Array.fill(8)(1.0))).toDF("vec_id", "v")
    assert(ok.select(PqFns.pqCodes(col("v"), books)).collect().length == 1)
  }

  test("seeding: rank-of-present-ids, copy-aware, and bit-identical to the old rule on the fixture") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // (1) contiguous-distinct fixture: seeds are exactly ids 0..15 — the
    // historical `vec_id < k` rule — so every declared output is unchanged
    val seeds = VectorOps.seedVectors(emb, 16)
    assert(seeds.map(_._1).toSeq == (0L until 16L),
      s"fixture seeds drifted: ${seeds.map(_._1).mkString(",")}")
    val old = emb.filter(col("vec_id") < 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    seeds.foreach { case (id, v) => assert(v.sameElements(old(id))) }
    // (2) gapped/offset ids: no contiguity assumed — a filtered frame
    // (every third id dropped, id 0 gone) still trains, seeded by the 16
    // smallest PRESENT ids
    val gapped = emb.filter(col("vec_id") % 3 =!= 0)
    val gseeds = VectorOps.seedVectors(gapped, 16)
    val expected = gapped.select(col("vec_id")).collect().map(_.getLong(0))
      .sorted.take(16).toSeq
    assert(gseeds.map(_._1).toSeq == expected)
    val gbooks = VectorOps.pqCodebooks(gapped, 8, 8, 16, iters = 1)
    assert(gbooks.length == 8 && gbooks.forall(_.length == 16))
    // (3) planted exact copies in the seed range: ids 1..4 carry id 0's
    // vector — the seed set skips the duplicates instead of wasting 4
    // codebook entries that would start identical and stay dead
    val v0 = emb.filter(col("vec_id") === 0L).collect().head.getSeq[Double](1).toArray
    val copyIds = (1L to 4L).toSet
    val planted = emb.filter(!col("vec_id").isin(copyIds.toSeq: _*))
      .unionByName(s.createDataFrame(
        s.sparkContext.parallelize(copyIds.toSeq.map(id => org.apache.spark.sql.Row(id, v0.toSeq))),
        emb.schema))
    val pseeds = VectorOps.seedVectors(planted, 16)
    assert(pseeds.map(_._1).toSeq == (Seq(0L) ++ (5L to 19L)),
      s"copy-aware seeding picked: ${pseeds.map(_._1).mkString(",")}")
    // (4) degenerate pool (< k distinct): falls back to duplicate seeds so
    // training still runs instead of aborting
    val tiny = emb.filter(col("vec_id") < 6)
      .select(col("vec_id"), transform(col("v"), x => lit(1.0)).as("v"))
    val tseeds = VectorOps.seedVectors(tiny, 4)
    assert(tseeds.length == 4 && tseeds.map(_._1).toSeq == (0L until 4L))
  }

  test("2 Lloyd rounds reconstruct no worse than the raw seed codebooks") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def totalMse(iters: Int): Double =
      VectorOps.pqAudit(emb, iters)
        .agg(sum(col("mse"))).collect().head.getDouble(0)
    val m0 = totalMse(0)
    val m2 = totalMse(2)
    assert(m2 <= m0 + 1e-9, s"Lloyd lost reconstruction quality: $m0 -> $m2")
  }
}
