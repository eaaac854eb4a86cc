package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.NearestCentroid
import graft.ops.VectorOps

/** The native [[graft.functions.NearestCentroid]] kernel replaced the
  * `greatest(struct(sim, -cid), ...)` argmax projection on the k-means/IVF
  * hot path; this spec pins (cell, sim) BIT-equality against that exact
  * form on the real embeddings table plus the adversarial branches the
  * oracle runs never reach: NaN vector components (all sims NaN — NaN
  * ranks largest in both forms, tie to smallest id), exact equal-sim ties
  * (duplicate centroids under different ids), and opposite-direction
  * vectors (sim = −1).
  *
  * Where the forms CANNOT agree, the divergence is pinned explicitly
  * instead of papered over: Spark division by zero is NULL (non-ANSI) or
  * DIVIDE_BY_ZERO (default ANSI) — never IEEE NaN — so on a zero-NORM
  * vector the kernel's (smallest id, NaN) matches the non-ANSI greatest
  * form's CELL but reports NaN where Spark reports NULL; a zero-norm
  * CENTROID is rejected at construction (NaN-largest ordering would make
  * it swallow every vector); and a vector/centroid dimension mismatch
  * throws instead of truncating to a partial dot. */
class VectorKernelsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val dim = 64
  private def e(i: Int) = Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0)

  /** Real vectors + adversarial rows (ids above the real id space). All
    * nonzero-norm — the zero-norm vector gets its own divergence test. */
  private def corpus: DataFrame = {
    val real = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val nanV = e(0); nanV(3) = Double.NaN
    val adv = Seq(
      (100001L, e(0)),          // exactly equidistant from dup centroids
      (100002L, e(0).map(-_)),  // sim = -1 to e0-aligned centroids
      (100003L, nanV))          // NaN component: every sim NaN, both forms
      .toDF("vec_id", "v")
    real.unionByName(adv)
  }

  /** The struct-greatest argmax the kernel replaced (pre-round-9 form). */
  private def hofAssign(df: DataFrame,
      cents: Seq[(Long, Array[Double], Double)]): DataFrame = {
    val sims = cents.map { case (cid, cv, cnrm) =>
      val lcv = array(cv.toIndexedSeq.map(lit): _*)
      struct((VectorOps.dot(col("v"), lcv) / (col("nrm") * lit(cnrm))).as("sim"),
        lit(-cid).as("nid"))
    }
    df.withColumn("nrm", VectorOps.l2norm(col("v")))
      .select(col("vec_id"), greatest(sims.toIndexedSeq: _*).as("g"))
      .select(col("vec_id"), (-col("g.nid")).as("cell"), col("g.sim").as("sim"))
  }

  private def nativeAssign(df: DataFrame,
      cents: Seq[(Long, Array[Double], Double)]): DataFrame =
    df.select(col("vec_id"),
      NearestCentroid.nearest(col("v"), cents).as("nc"))
      .select(col("vec_id"), col("nc.cell").as("cell"), col("nc.sim").as("sim"))

  /** Runs `body` with ANSI off: the kernel's Java `/` never throws, so the
    * comparison target is the non-ANSI (SQL-NULL-on-zero) greatest form —
    * on the nonzero-norm corpus the two ANSI modes agree bit for bit. */
  private def nonAnsi[A](body: => A): A = {
    val prev = s.conf.get("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.ansi.enabled", "false")
    try body finally s.conf.set("spark.sql.ansi.enabled", prev)
  }

  private def assertBitEqual(df: DataFrame,
      cents: Seq[(Long, Array[Double], Double)]): Unit = nonAnsi {
    val hof = hofAssign(df, cents)
    val nat = nativeAssign(df, cents)
      .withColumnRenamed("cell", "cell2").withColumnRenamed("sim", "sim2")
    // <=> is NaN-safe in Spark (NaN <=> NaN is true), so the NaN-component
    // branch compares instead of vacuously failing
    val diff = hof.join(nat, "vec_id")
      .filter(!(col("cell") <=> col("cell2")) || !(col("sim") <=> col("sim2")))
    assert(diff.count() == 0, diff.limit(5).collect().mkString("\n"))
  }

  private def asCent(id: Long, cv: Array[Double]): (Long, Array[Double], Double) =
    (id, cv, math.sqrt(cv.map(x => x * x).sum))

  test("NearestCentroid matches greatest(struct(sim,-cid)) bit for bit on real centroids") {
    val emb = Tables.embeddings(s, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // real k-means-refined centroids — the production path's model state
    val cents = VectorOps.kmeansCentroids(emb, 8, 2).toSeq
    assertBitEqual(corpus, cents)
  }

  test("equal-sim ties break to the smallest centroid id in both forms") {
    // centroids 5 and 9 are IDENTICAL — vector 100001 ties exactly
    val cents = Seq(asCent(5L, e(0)), asCent(9L, e(0)), asCent(7L, e(1)))
    assertBitEqual(corpus, cents)
    val row = nativeAssign(corpus, cents)
      .filter(col("vec_id") === 100001L).collect().head
    assert(row.getLong(1) == 5L, "tie must resolve to the smaller id")
    assert(row.getDouble(2) == 1.0)
  }

  test("zero-norm vector: same cell as the non-ANSI greatest form, sim NaN not NULL") {
    val cents = Seq(asCent(3L, e(0)), asCent(7L, e(1)))
    val zdf = Seq((100000L, Array.fill(dim)(0.0))).toDF("vec_id", "v")
    val nat = nativeAssign(zdf, cents).collect().head
    assert(nat.getLong(1) == 3L, "kernel: smallest centroid id")
    assert(nat.getDouble(2).isNaN, "kernel: IEEE 0/0 = NaN")
    nonAnsi {
      val hof = hofAssign(zdf, cents).collect().head
      // Spark: x/0 is NULL, every sim NULL, greatest falls to the same
      // smallest-id tiebreak — cells agree; sims differ (NULL vs NaN) by
      // design (Spark division cannot produce NaN from a zero divisor)
      assert(hof.getLong(1) == 3L)
      assert(hof.isNullAt(2))
    }
  }

  test("zero-norm centroid is rejected at construction (malformed model state)") {
    val ex = intercept[IllegalArgumentException] {
      NearestCentroid.nearest(col("v"),
        Seq(asCent(3L, e(0)), (11L, Array.fill(dim)(0.0), 0.0)))
    }
    assert(ex.getMessage.contains("zero/NaN-norm centroid"))
  }

  test("dimension mismatch throws instead of truncating to a partial dot") {
    val cents = Seq(asCent(1L, e(0)))
    val bad = Seq((1L, Array.fill(dim + 1)(1.0))).toDF("vec_id", "v")
    val ex = intercept[Throwable] { nativeAssign(bad, cents).collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("nearest_centroid")),
      s"expected nearest_centroid dim error, got: ${chain(ex).mkString(" | ")}")
  }
}
