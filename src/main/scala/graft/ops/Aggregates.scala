package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Relational.dsum

/** Aggregation surface: hash aggs, distinct, min/max-by, multi-dim grouping,
  * stats, scalar aggs, the BigCLAM-critical element-wise array sum, and the
  * HLL sketch.
  *
  * All of these compile to partial+final hash aggregates (map-side combine),
  * so the shuffle carries one row per group per input partition — the shape
  * that survives a 100 TB fact table. Doubles that pass through `sum`/`avg`
  * are cast to DECIMAL first so the result is order-independent and matches
  * the DuckDB oracle exactly (SURVEY.md §2.c).
  *
  * Reference lineage: the element-wise array sum is the `sumF` / gradient
  * kernel of BigCLAM (/root/reference/codes/Bigclamv2.scala:95,121-133); the
  * scalar agg mirrors the total-volume reduce (Bigclamv2.scala:45).
  */
object Aggregates {

  /** TPC-H Q1 shape — also the flagship `entry` query. */
  def q_agg_hash(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)")).cast("double").as("sum_disc"),
        round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  def q_agg_distinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** min/max-by via lexicographic struct min/max — deterministic under ties
    * (ties broken by custkey), mirrored in the oracle by row_number windows. */
  def q_agg_minmax_by(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .agg(
        max(struct(col("c_acctbal"), col("c_custkey"))).as("mx"),
        min(struct(col("c_acctbal"), col("c_custkey"))).as("mn"))
      .select(
        col("c_nationkey"),
        col("mx.c_acctbal").as("max_bal"), col("mx.c_custkey").as("max_custkey"),
        col("mn.c_acctbal").as("min_bal"), col("mn.c_custkey").as("min_custkey"))
      .orderBy("c_nationkey")

  /** Grouping-null ambiguity sidestepped by coalescing to sentinels, so the
    * oracle needs no NULLS FIRST/LAST gymnastics. */
  def q_agg_rollup(s: SparkSession, d: String): DataFrame =
    // pre-agg before the rollup Expand — same additive two-level trick as
    // q_agg_cube (3 grouping sets over ~15 cells instead of 3 × |orders|)
    Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("pc"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("pt"))
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(sum(col("pc")).as("cnt"), sum(col("pt")).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("cnt"), col("total"))
      .orderBy("status", "priority")

  def q_agg_cube(s: SparkSession, d: String): DataFrame =
    // pre-aggregate to the (flag, status) cells BEFORE the cube: CUBE plans
    // as Expand — every input row duplicated once per grouping set (4× the
    // fact scan) before the partial agg. Cube is additive, so cubing the
    // ~6 pre-aggregated cells with sum-of-sums gives bit-identical results
    // (exact DECIMAL partials, exact count sums) while Expand runs over 6
    // rows, not 4 × |lineitem| (guide §2.3: aggregate before you shuffle).
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("pc"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("pq"))
      .cube("l_returnflag", "l_linestatus")
      .agg(sum(col("pc")).as("cnt"), sum(col("pq")).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("cnt"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** GROUPING SETS goes through the SQL entry point (spark.sql). */
  def q_agg_grouping_sets(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql("""
      SELECT coalesce(c_mktsegment, '(all)') AS segment,
             coalesce(c_nationkey, -1) AS nationkey,
             count(*) AS cnt,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
      ORDER BY segment, nationkey
    """)
  }

  /** Variance-family stats normalized by the (exact) mean so cross-engine
    * last-ulp drift cannot flip the 6-dp rounding. */
  def q_agg_stats(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(stddev_samp(col("o_totalprice")), 2).as("sd"),
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("mean_exact"),
        stddev_samp(col("o_totalprice")).as("sd_raw"),
        var_samp(col("o_totalprice")).as("var_raw"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        count(lit(1)).as("cnt"))
      .select(
        col("o_orderstatus"), col("sd"),
        round(col("sd_raw") / col("mean_exact"), 6).as("cv"),
        round(col("var_raw") / (col("mean_exact") * col("mean_exact")), 6).as("var_rel"),
        col("min_price"), col("max_price"), col("cnt"))
      .orderBy("o_orderstatus")

  /** Bivariate aggregates — corr / covar / regression slope per group (the
    * co-moment family; one partial-agg-friendly pass like any other agg).
    * corr is scale-free (|r| <= 1, cross-engine drift ~1e-12 << round 6);
    * covar/slope carry data magnitude so they round at 4. */
  def q_agg_corr(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")

  def q_agg_scalar(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))

  /** Element-wise sum of embedding vectors per label — the distributed form
    * of BigCLAM's sumF/gradient kernel, emitted as exploded (label, pos, sv)
    * rows (arrays never appear in a declared output — the driver comparator
    * can only sort scalar columns). The fit loop itself uses the typed
    * Aggregator (graft.ops.VectorOps.ArraySumAgg) which does the same sum
    * in one shuffle with no explode. */
  def q_agg_array_sum(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("label"), (col("pos0") + 1).as("pos"), col("v").cast("double").as("dv"))
      .groupBy("label", "pos")
      // plain double sum rounded to 4 dp: cross-engine sum-order drift is
      // ~1e-13, far below the rounding grid (a DECIMAL cast would be exact
      // but hits round-half-mode ties on floats' terminating expansions)
      .agg(round(sum(col("dv")), 4).as("sv"))
      .orderBy("label", "pos")

  /** Pivot: per-user event-type counts as columns (the wide-format
    * feature-table shape). Oracle mirrors it with conditional aggregation —
    * same result, engine-neutral SQL. */
  def q_pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "signup", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
      .limit(2000)

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition). */
  def q_agg_percentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** Fixed-width histogram of order totals: 20 buckets of 30k over
    * [0, 600k), last bucket open-ended. Bucket bounds are DATA-INDEPENDENT
    * on purpose — the scale-correct choice: data-dependent min/max bounds
    * cost an extra full pass (or a stale statistics dependency) before the
    * bucketing pass, while fixed bounds make the histogram a single
    * partial-agg-friendly groupBy that composes with incremental refresh.
    * One row per OCCUPIED bucket (empty buckets need a generate+left-join;
    * consumers densify if they must). */
  def q_agg_histogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(least(floor(col("o_totalprice") / 30000), lit(19L)).cast("int").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .withColumn("lo", (col("bucket") * 30000.0).cast("double"))
      .withColumn("hi", when(col("bucket") === 19, lit(null).cast("double"))
        .otherwise((col("bucket") + 1) * 30000.0))
      .select("bucket", "lo", "hi", "cnt", "sum_price")
      .orderBy("bucket")

  /** Modal value per group — the `mode()` aggregate Spark has no built-in
    * for, composed as count-then-top-1: a partial-agg-friendly groupBy on
    * (group, value) collapses the stream map-side, and the per-group
    * argmax is a window over the already-aggregated rows (one row per
    * distinct (group, value), not per input row). Deterministic tiebreak:
    * highest count, then lexicographically smallest value. */
  def q_agg_mode(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.orders(s, d)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("cnt").desc, col("o_orderstatus").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"),
        col("cnt"))
      .orderBy("o_orderpriority")
  }

  /** [no-oracle] HLL sketch next to the exact count; tests assert <5% error. */
  def q_agg_approx_distinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  /** The skew-proof aggregation, declared: the same per-type counts/sums a
    * plain groupBy(event_type) computes, but routed through Skew.saltedAgg's
    * two-phase (key, salt)-partial → key-final shape — the manual fallback
    * for the mega-key AQE cannot split (skewed AGGREGATIONS, unlike joins,
    * get no runtime skew handling). The oracle is the PLAIN GROUP BY: salting
    * must be a pure execution-strategy change with bit-identical results,
    * and this query makes that contract hash-checked every round.
    *
    * Scale stance: event_type has 5 values over ~10^6+ rows — the exact
    * hot-key regime; 16 salts spread each key over 16 reducers and the
    * final merge sees 5×16 rows. Sums ride DECIMAL partials so the
    * two-phase addition is exact (double partials would make the salted
    * and plain plans round differently). */
  def q_agg_salted(s: SparkSession, d: String): DataFrame =
    Skew.saltedAgg(
      Tables.events(s, d),
      key = col("event_type"),
      saltCols = Seq(col("event_id")),
      salts = 16,
      partial = Seq(count(lit(1)).as("pc"),
        sum(col("value").cast("decimal(18,6)")).as("ps"),
        min(col("value")).as("pmin"), max(col("value")).as("pmax")),
      merge = Seq(sum(col("pc")).as("n_events"),
        sum(col("ps")).cast("double").as("sum_value"),
        min(col("pmin")).as("min_value"), max(col("pmax")).as("max_value")))
      .select(col("skew_key").as("event_type"), col("n_events"),
        round(col("sum_value"), 6).as("sum_value"),
        col("min_value"), col("max_value"))
      .orderBy("event_type")

  /** Salted JOIN as a declared contract — the [[q_agg_salted]] discipline
    * for the join side of the skew toolbox: a cohort join (events × the
    * per-user first-seen-day dimension) where the fact side carries a
    * deterministic per-ROW salt and the dimension is replicated once per
    * salt value ([[Skew.explodeSalt]]), so a mega-user's rows spread over
    * 8 reducers instead of funneling one. Salting is semantics-preserving
    * by construction, and the oracle PROVES it: the DuckDB twin is the
    * PLAIN unsalted join — the hash check asserts the salted plan returns
    * byte-identical answers.
    *
    * Scale stance: the salt column is pure projection (no extra shuffle on
    * the fact side beyond the join's own), the dim inflation is ×salts on
    * the SMALL side only, and the final rollup is a bounded-key groupBy.
    * This is the manual fallback for skew AQE can't split (broadcast-side
    * hot keys, deterministic reproducibility requirements). */
  def q_join_salted(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts").cast("date").as("day"))
    val dim = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.withColumn("salt_id", Skew.salt(8, col("event_id")))
      .join(Skew.explodeSalt(dim, 8), Seq("user_id", "salt_id"))
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day")
  }
}
