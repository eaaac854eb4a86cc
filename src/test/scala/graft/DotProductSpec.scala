package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions
import graft.ops.VectorOps

/** The native DotProduct expression vs the HOF form: value equality on real
  * data, null semantics, SQL registration, and the optimizer fusion rule.
  */
class DotProductSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val vecs = graft.Tables.embeddings(s, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .limit(200).cache()

  test("native dot equals HOF dot bit-for-bit on embeddings") {
    val rows = vecs.crossJoin(vecs.select(col("v").as("w")).limit(5))
      .select(VectorOps.dot(col("v"), col("w")).as("native"),
        VectorOps.hofDot(col("v"), col("w")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null inputs yield null") {
    val r = s.sql("SELECT 1").select(
      VectorOps.dot(lit(null).cast("array<double>"),
        typedLit(Seq(1.0, 2.0))).as("d")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("length mismatch and null elements match HOF semantics (both NULL)") {
    // zip_with pads the shorter array with null and `acc + null` poisons the
    // aggregate — the fused expression must reproduce that, or DotFusionRule
    // would silently change user results (round-2 advisor finding)
    val cases = s.sql(
      """SELECT * FROM VALUES
        |  (array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d)),
        |  (array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d)),
        |  (array(1.0d, cast(null as double)), array(1.0d, 2.0d)),
        |  (array(1.0d, 2.0d), array(cast(null as double), 2.0d))
        |  AS t(a, b)""".stripMargin)
    val rows = cases.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.hofDot(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), s"native not null: $r")
      assert(r.isNullAt(1), s"hof not null: $r")
    }
  }

  test("empty arrays dot to 0.0, same as the HOF zero accumulator") {
    val r = s.sql("SELECT 1").select(
      VectorOps.dot(array().cast("array<double>"), array().cast("array<double>")).as("native"),
      VectorOps.hofDot(array().cast("array<double>"), array().cast("array<double>")).as("hof"))
      .collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("SparseDotProduct equals the HOF sparse dot bit-for-bit on random sparse rows") {
    import graft.bigclam.SparseF
    import graft.functions.SparseDotProduct
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(50) {
      def mk() = (0 until 20).filter(_ => rnd.nextBoolean())
        .map(i => (i, math.rint(rnd.nextDouble() * 100) / 16)).unzip
      val (ai, av) = mk(); val (bi, bv) = mk()
      (ai, av.map(_.toDouble), bi, bv.map(_.toDouble))
    }
    import s.implicits._
    val df = rows.toDF("ai", "av", "bi", "bv")
    val out = df.select(
      SparseDotProduct.dot(col("ai"), col("av"), col("bi"), col("bv")).as("native"),
      SparseF.sparseDot(col("ai"), col("av"), col("bi"), col("bv")).as("hof"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("SparseStepTermsExpr equals the HOF candidate-term fold bit-for-bit") {
    import graft.functions.SparseStepTermsExpr
    val p = graft.bigclam.BigClam.Params(k = 8)
    val steps = (0 to 15).map(i => math.pow(0.1, i)).toArray
    val stepsLit = array(steps.map(lit).toIndexedSeq: _*)
    val rnd = new scala.util.Random(29)
    def mk(neg: Boolean) = (0 until 8).filter(_ => rnd.nextBoolean())
      .map(i => (i, (if (neg && rnd.nextBoolean()) -1 else 1) * math.rint(rnd.nextDouble() * 64) / 16)).unzip
    import s.implicits._
    val rows = Seq.fill(50) {
      val (ui, uv) = mk(false); val (gi, gv) = mk(true); val (vi, vv) = mk(false)
      (ui, uv.map(_.toDouble), gi, gv.map(_.toDouble),
        vi.filter(_ => true), vv.map(_.toDouble))
    }
    val df = rows.toDF("ui", "uv", "gi", "gv", "vi", "vv")
    // the HOF reference form lineSearchSparse used before the native kernel
    val ma = map_from_arrays(col("ui"), col("uv"))
    val mg = map_from_arrays(col("gi"), col("gv"))
    val mv = map_from_arrays(col("vi"), col("vv"))
    val base = transform(array_sort(array_union(col("ui"), col("gi"))), i => struct(
      i.as("i"),
      coalesce(element_at(ma, i), lit(0.0)).as("a"),
      coalesce(element_at(mg, i), lit(0.0)).as("g")))
    val hofTerms = transform(stepsLit, t => {
      val fnew = filter(
        transform(base, s0 => struct(
          s0.getField("i").as("i"),
          least(greatest(s0.getField("a") + t * s0.getField("g"), lit(p.minF)),
            lit(p.maxF)).as("v"))),
        s0 => s0.getField("v") =!= 0.0)
      val dotv = aggregate(fnew, lit(0.0), (acc, s0) =>
        acc + s0.getField("v") * coalesce(element_at(mv, s0.getField("i")), lit(0.0)))
      val pc = least(greatest(exp(-dotv), lit(p.minP)), lit(p.maxP))
      log(lit(1.0) - pc) + dotv
    })
    val out = df.select(
      SparseStepTermsExpr.terms(col("ui"), col("uv"), col("gi"), col("gv"),
        col("vi"), col("vv"), stepsLit, p.minF, p.maxF, p.minP, p.maxP).as("native"),
      hofTerms.as("hof")).collect()
    out.foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a.size == 16 && a == b, s"native $a != hof $b")
    }
  }

  test("dot_product is callable from SQL after install") {
    GraftExtensions.install(s)
    val r = s.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("DotFusionRule rewrites the HOF pattern into the native expression") {
    GraftExtensions.install(s)
    val df = vecs.select(VectorOps.hofDot(col("v"), col("v")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), s"no fusion in:\n$optimized")
    assert(!optimized.contains("aggregate("), s"HOF survived in:\n$optimized")
    // and the rewritten plan still computes the right values
    val viaRule = df.collect().map(_.getDouble(0))
    val native = vecs.select(VectorOps.dot(col("v"), col("v")).as("d"))
      .collect().map(_.getDouble(0))
    assert(viaRule.toSeq == native.toSeq)
  }
}
