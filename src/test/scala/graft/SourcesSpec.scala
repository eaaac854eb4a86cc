package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink round trips beyond parquet: CSV and JSON lines with schema
  * round-tripping, plus partitioned parquet writes with partition pruning —
  * the lake-layout sink shape for 100 TB outputs.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round trip preserves rows and schema") {
    val out = tmp("graft-csv")
    val src = Tables.nation(s, sf)
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = s.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.agg(sum("n_nationkey")).collect()(0).getLong(0) ==
      src.agg(sum("n_nationkey")).collect()(0).getLong(0))
  }

  test("JSON lines round trip preserves values") {
    val out = tmp("graft-json")
    val src = Tables.region(s, sf)
    src.write.mode("overwrite").json(out)
    val back = s.read.json(out).select("r_regionkey", "r_name").orderBy("r_regionkey")
    assert(back.collect().map(_.toString).toSeq ==
      src.orderBy("r_regionkey").collect().map(_.toString).toSeq)
  }

  test("ORC round trip preserves values and pushes filters") {
    val out = tmp("graft-orc")
    val src = Tables.customer(s, sf)
    src.write.mode("overwrite").orc(out)
    val back = s.read.orc(out)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    val filtered = back.filter(col("c_custkey") < 100)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,100)]"),
      s"ORC scan did not push the filter:\n$plan")
    assert(filtered.count() == src.filter(col("c_custkey") < 100).count())
  }

  test("partitioned parquet sink prunes partitions on read") {
    val out = tmp("graft-part")
    Tables.orders(s, sf).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(out)
    val one = s.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition pruning in:\n$plan")
    assert(one.count() ==
      Tables.orders(s, sf).filter(col("o_orderstatus") === "F").count())
  }
}
