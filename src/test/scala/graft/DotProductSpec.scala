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
