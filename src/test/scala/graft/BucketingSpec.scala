package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffled storage layout so repeated joins on the
  * bucket key skip the exchange entirely — the co-located-join story for a
  * 100 TB fact/fact join that runs daily. The test writes orders and
  * lineitem bucketed by the join key and asserts the join plan contains no
  * shuffle on either side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("join of two tables bucketed on the key plans without an exchange") {
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(s, sf).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").format("parquet").saveAsTable("b_orders")
    Tables.lineitem(s, sf).write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").format("parquet").saveAsTable("b_lineitem")
    val joined = s.table("b_orders")
      .join(s.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus").count()
    // force a non-broadcast join so the bucket layout is what saves the shuffle
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\((o_orderkey|l_orderkey)"
      .r.findAllIn(plan).size
    assert(exchanges == 0, s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
