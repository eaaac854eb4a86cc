package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface: string, date, math, JSON, array and map
  * functions — all `org.apache.spark.sql.functions` built-ins (codegen'd
  * Catalyst expressions, no UDFs), mirroring the reference's scala.math
  * usage (/root/reference/codes/Bigclamv2.scala:130,142,214,224) and the
  * clip expression `least(greatest(x, lo), hi)` (Bigclamv2.scala:99-102).
  */
object ScalarFns {

  def q_str_funcs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        substring(col("p_name"), 1, 5).as("pfx"),
        length(col("p_name")).as("len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        col("p_name").like("%bolt%").as("has_bolt"))
      .orderBy("p_partkey")
      .limit(2000)

  def q_date_funcs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).as("y"),
        month(col("l_shipdate")).as("m"),
        dayofmonth(col("l_shipdate")).as("dom"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month_start"),
        datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).as("days_since"))
      .orderBy("l_orderkey", "l_linenumber", "y", "m", "dom", "days_since")
      .limit(2000)

  /** The reference's clip `least(greatest(x,0),1000)` as a relational expr. */
  def q_math_funcs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        round(abs(col("o_totalprice") - 100000.0), 6).as("absdev"),
        round(sqrt(col("o_totalprice")), 6).as("sq"),
        round(log(col("o_totalprice") + 1.0), 6).as("lg"),
        round(exp(col("o_totalprice") / 200000.0), 6).as("ex"),
        round(least(greatest(col("o_totalprice") / 1000.0, lit(0.0)), lit(1000.0)), 6).as("clipped"))
      .orderBy("o_orderkey")
      .limit(2000)

  def q_json_extract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** Array functions incl. the argmax idiom `array_position(f, array_max(f))`
    * used for BigCLAM community assignment (Bigclamv2.scala:226-229). */
  def q_array_funcs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("n"),
        element_at(col("embedding"), 1).as("first_elem"),
        array_max(col("embedding")).as("max_v"),
        array_position(col("embedding"), array_max(col("embedding"))).cast("int").as("argmax"),
        // scalar output only (driver comparator cannot sort array cells):
        // the sorted-slice surface is exposed as exploded (pos, sorted_v) rows
        posexplode(sort_array(slice(col("embedding"), 1, 5))).as(Seq("pos0", "sorted_v")))
      .select(col("vec_id"), col("n"), col("first_elem"), col("max_v"), col("argmax"),
        (col("pos0") + 1).as("pos"), col("sorted_v"))
      .orderBy("vec_id", "pos")
      .limit(2000)

  /** MapType construction + explode; output is the hash-safe exploded form
    * (user_id, event_type, cnt, clicks) per SURVEY.md §2.b. */
  def q_map_funcs(s: SparkSession, d: String): DataFrame = {
    val cnts = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
    cnts
      .groupBy("user_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        explode(col("m")).as(Seq("event_type", "cnt")))
      .select("user_id", "event_type", "cnt", "clicks")
      .orderBy("user_id", "event_type")
      .limit(5000)
  }
}
