package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational surface: scans, filters, joins, sort/top-k, set ops.
  *
  * Design notes (100 TB stance):
  *  - Every query is a declarative DataFrame plan on top of a bare parquet
  *    scan, so Catalyst pushes filters/projections into the vectorized
  *    reader and AQE picks join strategies at runtime.
  *  - Small dimension tables (part, supplier, region, nation) are joined
  *    with explicit `broadcast()` hints where the query semantics make the
  *    small side obvious; everything else is left to the planner.
  *  - Determinism contract (SURVEY.md §2.c): every output ends in an
  *    `orderBy` over a unique key tuple and aggregated doubles go through
  *    DECIMAL(18,2) so Spark and the DuckDB oracle sum exactly.
  *
  * Reference lineage: filter/semi/anti shapes mirror the RDD
  * `filter(S.contains(_))` / `filter(!Sx.contains)` patterns at
  * /root/reference/codes/Bigclamv2.scala:68,152; the cross join mirrors the
  * line-search `cartesian` at Bigclamv2.scala:136.
  */
object Relational {

  /** Exact sum of 2-dp doubles: decimal arithmetic matches DuckDB bit-for-bit. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  def q_scan_project(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — order by
      // every output column so tied rows are identical under any order
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(1000)

  /** Whitespace/`#`-comment edge-list text parse — the `GraphLoader.edgeListFile`
    * contract (/root/reference/codes/Bigclamv2.scala:14) exercised on a
    * literal sample so the oracle can mirror it with VALUES. */
  def q_scan_edge_text(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lines = Seq(
      "# Undirected sample graph",
      "# Nodes: 6 Edges: 7",
      "0\t1", "1\t2", "0 2", "3\t4", "4 5", "3 5", "2\t3"
    ).toDF("line")
    lines
      .filter(!col("line").startsWith("#"))
      .select(split(trim(col("line")), "\\s+").as("t"))
      .select(
        element_at(col("t"), 1).cast("bigint").as("src"),
        element_at(col("t"), 2).cast("bigint").as("dst"))
      .orderBy("src", "dst")
  }

  def q_filter_pred(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(10, 20)
        && col("l_returnflag") === "R"
        && col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(1000)

  def q_filter_in_null(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") || col("o_orderstatus") === "P")
      .select(
        col("o_orderkey"),
        coalesce(col("o_orderpriority"), lit("none")).as("priority"),
        col("o_orderstatus"))
      .orderBy("o_orderkey")
      .limit(1000)

  def q_join_inner_hash(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy("c_nationkey")

  /** Two explicit broadcast hints — part and supplier are dimension-sized at
    * any scale factor, so the fact scan never shuffles. */
  def q_join_broadcast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_brand", "s_nationkey")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("p_brand", "s_nationkey")

  def q_join_left(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast("decimal(18,2)")), lit(0)).cast("double").as("total_spent"))
      .orderBy("c_custkey")
      .limit(2000)

  /** Full outer with genuinely unmatched rows on both sides: per-nation
    * customer counts vs per-nation supplier counts (suppliers cover few
    * nations at small sf). */
  def q_join_full(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    c.join(p, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  def q_join_semi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
      .limit(2000)

  /** Anti-join against the rare order status 'P' so the output is non-empty
    * at every scale factor (every customer has *some* order in the testdata,
    * so an unfiltered anti-join would pass vacuously with 0 rows). */
  def q_join_anti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
      .limit(2000)

  def q_join_cross(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d)
      .crossJoin(Tables.nation(s, d))
      .select("r_regionkey", "r_name", "n_nationkey", "n_name")
      .orderBy("r_regionkey", "n_nationkey")

  /** Equi-join on nation + range predicate — planner keys the shuffle on the
    * equi part and evaluates the inequality as a post-join filter (no BNLJ). */
  def q_join_theta_range(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(Tables.customer(s, d),
        col("s_nationkey") === col("c_nationkey") && col("s_acctbal") < col("c_acctbal"))
      .select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")
      .orderBy("s_suppkey", "c_custkey")
      .limit(2000)

  /** As-of join: for every event, the latest strictly-earlier 'click' of
    * the same user — as ONE running-max window pass over the per-user
    * timeline (click timestamps ride along as a conditional column; the
    * RANGE frame ending at −1 µs enforces the strict inequality exactly).
    * Linear per user: the naive all-earlier-pairs join + groupBy(max) is
    * O(events × clicks) per user and detonates on one hot user at 100 TB;
    * this plan is one shuffle on user_id and one sorted scan. */
  def q_join_asof(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tsus"))
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("tsus", unix_micros(col("ts").cast("timestamp"))) // session tz is UTC
      .select(col("event_id"), col("user_id"), col("ts"),
        max(when(col("event_type") === "click", col("ts"))).over(w).as("last_click_ts"))
      .orderBy("event_id")
      .limit(2000)
  }

  def q_sort_multi(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
      .orderBy(col("l_extendedprice").desc, col("l_shipdate").asc,
        col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(500)

  def q_topk_per_group(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
      .limit(2000)
  }

  def q_set_union(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .unionAll(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("nationkey")

  def q_set_intersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** EXCEPT with a guaranteed-non-empty result: supplier nations are a
    * subset of customer nations in the testdata, so the right side is
    * restricted to low-key nations — customer nations >= 13 must survive. */
  def q_set_except(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).filter(col("s_nationkey") < 13)
        .select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
}
