package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted two-phase aggregation and salted-join equivalence with their
  * unsalted forms on a deliberately skewed dataset (one mega-key).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private lazy val skewed = {
    import s.implicits._
    // key 0 holds 90% of rows — the hot-key shape
    (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 7 + 1 else 0L, i.toLong, i * 1.5))
      .toDF("k", "id", "v").cache()
  }

  test("saltedAgg(count+sum) equals the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val salted = Skew.saltedAgg(skewed, col("k"), Seq(col("id")), salts = 8,
      partial = Seq(count(lit(1)).as("pc"),
        sum(col("v").cast("decimal(18,2)")).as("ps")),
      merge = Seq(sum(col("pc")).as("cnt"), sum(col("ps")).cast("double").as("sv")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals the plain join on a hot key") {
    import s.implicits._
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val salted = skewed
      .withColumn("salt_id", Skew.salt(4, col("id")))
      .join(Skew.explodeSalt(dim, 4), Seq("k", "salt_id"))
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt is deterministic and spreads the hot key") {
    val dist = skewed.filter(col("k") === 0)
      .select(Skew.salt(8, col("id")).as("s"))
      .groupBy("s").count().collect()
    assert(dist.length == 8) // all 8 salt buckets hit
    val again = skewed.filter(col("k") === 0)
      .select(Skew.salt(8, col("id")).as("s"))
      .groupBy("s").count().collect()
    assert(dist.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("hotDegCap bounds conductance ego expansion on a star graph") {
    import s.implicits._
    import graft.graph.GraphOps
    // star: hub 0 with 10^4 leaves. Uncapped, member=hub appears in every
    // leaf's ego AND expands the hub's 10^4 edges each time — ~10^8 rows
    // through one join key (don't run it). Capped at 64 the hub is dropped
    // from the leaves' egos: expansion = hub-self (10^4) + leaves in hub's
    // ego (10^4 · 1) + leaf-self (10^4 · 1) = 3·10^4, and in general
    // ≤ (cap+1)·2|E|.
    val n = 10000L
    val star = GraphOps.symEdges(
      s.range(1, n + 1).select(lit(0L).as("src"), col("id").as("dst")))
    val capped = GraphOps.egoExpanded(star, Some(64L)).count()
    assert(capped == 3 * n, s"expected ${3 * n} expansion rows, got $capped")
    assert(capped <= (64L + 1) * 2 * n)
    // capped conductance still completes and respects the guards; a leaf
    // whose ONLY neighbor is the dropped hub has a singleton truncated ego
    // — it must report the worst φ (1.0), never the vol_s=0 best-cut guard
    // (which would rank hub-adjacent leaves as top seeds)
    val phi = GraphOps.conductance(star, Some(64L))
      .agg(min(col("phi")), max(col("phi"))).collect()(0)
    assert(phi.getDouble(0) == 1.0 && phi.getDouble(1) <= 1.0,
      s"truncated-singleton ego must score phi=1.0, got min=${phi.getDouble(0)}")
  }

  test("hotDegCap is exact when no node exceeds the cap") {
    import s.implicits._
    import graft.graph.GraphOps
    val toy = GraphOps.symEdges(
      Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
        .toDF("src", "dst"))
    val exact = GraphOps.conductance(toy).orderBy("node").collect().map(_.toString)
    val capped = GraphOps.conductance(toy, Some(100L)).orderBy("node").collect().map(_.toString)
    assert(exact.toSeq == capped.toSeq)
  }
}
