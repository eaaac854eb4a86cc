package graft

/** DuckDB oracle SQL, one entry per oracle-checkable key in
  * SparkEntry.queries. Discipline (SURVEY.md §2.c): identical ORDER BY on
  * unique keys, identical DECIMAL casts before double sums, identical
  * rounding points, integer aggregates cast to BIGINT/INT to match Spark's
  * types (DuckDB's sum(int) is HUGEINT otherwise).
  */
object Oracles {

  val sql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 1000""".stripMargin,

    "q_scan_edge_text" ->
      """SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
        |FROM (VALUES (0,1),(1,2),(0,2),(3,4),(4,5),(3,5),(2,3)) AS t(src, dst)
        |ORDER BY src, dst""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 1000""".stripMargin,

    "q_filter_in_null" ->
      """SELECT o_orderkey, coalesce(o_orderpriority, 'none') AS priority, o_orderstatus
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH') OR o_orderstatus = 'P'
        |ORDER BY o_orderkey LIMIT 1000""".stripMargin,

    "q_join_inner_hash" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_join_broadcast" ->
      """SELECT p_brand, s_nationkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_nationkey ORDER BY p_brand, s_nationkey""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey LIMIT 2000""".stripMargin,

    "q_join_full" ->
      """WITH c AS (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(nk_c, nk_s) AS nationkey, n_cust, n_supp
        |FROM c FULL OUTER JOIN s ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey LIMIT 2000""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey LIMIT 2000""".stripMargin,

    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "q_join_theta_range" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
        |ORDER BY s_suppkey, c_custkey LIMIT 2000""".stripMargin,

    "q_join_asof" ->
      """SELECT l.event_id, l.user_id, l.ts, max(r.ts) AS last_click_ts
        |FROM events l LEFT JOIN events r
        |  ON r.user_id = l.user_id AND r.event_type = 'click' AND r.ts < l.ts
        |GROUP BY l.event_id, l.user_id, l.ts
        |ORDER BY l.event_id LIMIT 2000""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_minmax_by" ->
      """WITH ranked AS (
        |  SELECT c_nationkey, c_acctbal, c_custkey,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
        |  FROM customer)
        |SELECT a.c_nationkey, a.c_acctbal AS max_bal, a.c_custkey AS max_custkey,
        |       b.c_acctbal AS min_bal, b.c_custkey AS min_custkey
        |FROM ranked a JOIN ranked b ON a.c_nationkey = b.c_nationkey
        |WHERE a.rmax = 1 AND b.rmin = 1
        |ORDER BY a.c_nationkey""".stripMargin,

    "q_agg_rollup" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_agg_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, '(all)') AS segment,
        |       coalesce(c_nationkey, -1) AS nationkey,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
        |ORDER BY segment, nationkey""".stripMargin,

    "q_agg_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 30000), 19) AS INT) AS bucket,
        |  CAST(least(floor(o_totalprice / 30000), 19) * 30000.0 AS DOUBLE) AS lo,
        |  CASE WHEN least(floor(o_totalprice / 30000), 19) = 19 THEN NULL
        |       ELSE CAST((least(floor(o_totalprice / 30000), 19) + 1) * 30000.0 AS DOUBLE) END AS hi,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2, 3 ORDER BY bucket""".stripMargin,

    "q_agg_mode" ->
      """SELECT o_orderpriority, o_orderstatus AS mode_status, count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |  ORDER BY count(*) DESC, o_orderstatus ASC) = 1
        |ORDER BY o_orderpriority""".stripMargin,

    // the salted two-phase agg must equal the PLAIN group-by — the oracle
    // deliberately knows nothing about salts
    "q_agg_salted" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the PLAIN unsalted join on purpose: the oracle proves the salted
    // plan is semantics-preserving
    "q_join_salted" ->
      """WITH dim AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |             FROM events GROUP BY user_id)
        |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN dim USING (user_id)
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,

    "q_agg_stats" ->
      """WITH base AS (
        |  SELECT o_orderstatus,
        |    round(stddev_samp(o_totalprice), 2) AS sd,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_exact,
        |    stddev_samp(o_totalprice) AS sd_raw,
        |    var_samp(o_totalprice) AS var_raw,
        |    min(o_totalprice) AS min_price,
        |    max(o_totalprice) AS max_price,
        |    count(*) AS cnt
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, sd,
        |  round(sd_raw / mean_exact, 6) AS cv,
        |  round(var_raw / (mean_exact * mean_exact), 6) AS var_rel,
        |  min_price, max_price, cnt
        |FROM base ORDER BY o_orderstatus""".stripMargin,

    "q_agg_scalar" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,

    "q_agg_array_sum" ->
      """SELECT label, pos, round(sum(CAST(v AS DOUBLE)), 4) AS sv
        |FROM (SELECT label, unnest(embedding) AS v,
        |             generate_subscripts(embedding, 1) AS pos FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view",
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS "error"
        |FROM events GROUP BY user_id ORDER BY user_id LIMIT 2000""".stripMargin,

    "q_agg_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        |  count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_win_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(c_custkey) OVER w AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey LIMIT 2000""".stripMargin,

    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
        |ORDER BY o_custkey, o_orderkey LIMIT 2000""".stripMargin,

    "q_win_rownum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |ORDER BY o_custkey, rn LIMIT 2000""".stripMargin,

    "q_win_running" ->
      """SELECT user_id, event_id, ts,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w3 AS DOUBLE)
        |        / count(*) OVER w3, 6) AS mov_avg
        |FROM events
        |WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id LIMIT 2000""".stripMargin,

    "q_win_lag_lead" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1, -1.0) OVER w AS prev_val,
        |  lead(value, 1, -1.0) OVER w AS next_val
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id LIMIT 2000""".stripMargin,

    "q_win_range_frame" ->
      """SELECT user_id, event_id, ts,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS hour_sum,
        |  count(*) OVER w AS hour_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id, ts LIMIT 2000""".stripMargin,

    "q_win_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INT) AS tile
        |FROM customer
        |ORDER BY c_mktsegment, tile, c_custkey LIMIT 2000""".stripMargin,

    "q_sort_multi" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 500""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 2000""".stripMargin,

    "q_set_union" ->
      """SELECT nationkey, count(*) AS n_rows FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier WHERE s_nationkey < 13
        |ORDER BY nationkey""".stripMargin,

    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up_name, substr(p_name, 1, 5) AS pfx,
        |  CAST(length(p_name) AS INT) AS len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  (p_name LIKE '%bolt%') AS has_bolt
        |FROM part ORDER BY p_partkey LIMIT 2000""".stripMargin,

    "q_date_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(year(l_shipdate) AS INT) AS y,
        |  CAST(month(l_shipdate) AS INT) AS m,
        |  CAST(day(l_shipdate) AS INT) AS dom,
        |  CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS INT) AS days_since
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, y, m, dom, days_since LIMIT 2000""".stripMargin,

    "q_math_funcs" ->
      """SELECT o_orderkey,
        |  round(abs(o_totalprice - 100000.0), 6) AS absdev,
        |  round(sqrt(o_totalprice), 6) AS sq,
        |  round(ln(o_totalprice + 1.0), 6) AS lg,
        |  round(exp(o_totalprice / 200000.0), 6) AS ex,
        |  round(least(greatest(o_totalprice / 1000.0, 0.0), 1000.0), 6) AS clipped
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS n,
        |  embedding[1] AS first_elem,
        |  list_aggregate(embedding, 'max') AS max_v,
        |  CAST(list_position(embedding, list_aggregate(embedding, 'max')) AS INT) AS argmax,
        |  CAST(generate_subscripts(list_sort(embedding[1:5]), 1) AS INT) AS pos,
        |  unnest(list_sort(embedding[1:5])) AS sorted_v
        |FROM embeddings ORDER BY vec_id, pos LIMIT 2000""".stripMargin,

    "q_map_funcs" ->
      """SELECT user_id, event_type, cnt,
        |  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN cnt END)
        |       OVER (PARTITION BY user_id), 0) AS BIGINT) AS clicks
        |FROM (SELECT user_id, event_type, count(*) AS cnt
        |      FROM events GROUP BY user_id, event_type)
        |ORDER BY user_id, event_type LIMIT 5000""".stripMargin,

    "q_events_tumbling" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // each event lies in exactly two 1h/30min sliding windows: the one
    // starting at its 30-min bucket and the one 30 min earlier. Spark's
    // window() epoch alignment and DuckDB's time_bucket 2000-01-01 origin
    // agree for 30-min buckets (both origins are midnight-aligned).
    "q_events_sliding" ->
      """SELECT win_start, count(*) AS cnt FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events)
        |GROUP BY win_start ORDER BY win_start LIMIT 3000""".stripMargin,

    "q_events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS start_ts, max(ts) AS end_ts,
        |  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS dur_us
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id LIMIT 5000""".stripMargin,

    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT cohort_day, CAST(ev.day - cohort_day AS INT) AS day_offset,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "q_events_streak" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT)
        |          AS anchor
        |      FROM days),
        |isl AS (SELECT user_id, anchor, count(*) AS len FROM r GROUP BY 1, 2)
        |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_anomaly" ->
      """WITH ev AS (SELECT user_id, event_id, ts, value,
        |              CAST(value AS DECIMAL(18,6)) AS dv FROM events),
        |m AS (SELECT user_id, count(*) AS n, sum(dv) AS s,
        |        sum(CAST(dv * dv AS DECIMAL(38,12))) AS sq
        |      FROM ev GROUP BY user_id),
        |st AS (SELECT user_id, CAST(s AS DOUBLE) / n AS mean,
        |         (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n
        |           AS variance
        |       FROM m WHERE (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n > 1e-12),
        |z AS (SELECT e.user_id, e.event_id, e.ts, e.value,
        |        (CAST(e.dv AS DOUBLE) - st.mean) / sqrt(st.variance) AS z
        |      FROM ev e JOIN st USING (user_id))
        |SELECT user_id, event_id, ts, round(value, 6) AS value, round(z, 6) AS z
        |FROM z WHERE abs(z) > 3.0
        |ORDER BY user_id, event_id, ts LIMIT 5000""".stripMargin,

    "q_events_transition" ->
      """WITH tr AS (SELECT user_id, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS prev_type
        |      FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 6) AS p
        |FROM c ORDER BY prev_type, next_type""".stripMargin,

    "q_events_top_paths" ->
      """WITH tr AS (SELECT user_id,
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    event_type AS e3
        |  FROM events)
        |SELECT e1 || '>' || e2 || '>' || e3 AS path,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM tr
        |WHERE e1 IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "q_events_attribution" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    last_value(CASE WHEN event_type IN ('click','view')
        |        THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w AS lt_us,
        |    last_value(CASE WHEN event_type IN ('click','view')
        |        THEN event_type END IGNORE NULLS)
        |      OVER w AS lt_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |pur AS (
        |  SELECT epoch_us(ts) - lt_us AS gap_us, lt_us, lt_type
        |  FROM base WHERE event_type = 'purchase'),
        |att AS (
        |  SELECT CASE WHEN lt_us IS NULL OR gap_us > 604800000000 THEN 'none'
        |              ELSE lt_type END AS attr_type,
        |         gap_us
        |  FROM pur)
        |SELECT attr_type, CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(coalesce(sum(CASE WHEN attr_type <> 'none' THEN gap_us END)
        |                  // count(*), -1) AS BIGINT) AS avg_gap_us
        |FROM att GROUP BY 1 ORDER BY attr_type""".stripMargin,

    "q_events_dau_wau" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM days GROUP BY day),
        |wau AS (SELECT day + CAST(off AS INT) AS day, user_id
        |        FROM days, (SELECT unnest(generate_series(0, 6)) AS off)),
        |wc AS (SELECT day, count(DISTINCT user_id) AS wau FROM wau GROUP BY day)
        |SELECT d.day, d.dau, w.wau,
        |  round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        |FROM dau d JOIN wc w USING (day)
        |ORDER BY d.day""".stripMargin,

    "q_events_ohlc" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |  struct_extract(min({'us': epoch_us(ts), 'event_id': event_id, 'value': value}),
        |                 'value') AS open,
        |  max(value) AS high, min(value) AS low,
        |  struct_extract(max({'us': epoch_us(ts), 'event_id': event_id, 'value': value}),
        |                 'value') AS close,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q_events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS first_click
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.first_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS first_purchase
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        |      GROUP BY e.user_id)
        |SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
        |  1 + (CASE WHEN c.first_click IS NOT NULL THEN 1 ELSE 0 END)
        |    + (CASE WHEN p.first_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id LIMIT 5000""".stripMargin,

    "q_events_late_dedup" ->
      """SELECT event_id, user_id, ts, event_type FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id, event_id ORDER BY ts, event_type) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_id LIMIT 2000""".stripMargin,

    "q_graph_degree" ->
      """WITH raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst FROM lineitem),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw))
        |SELECT src AS node, count(*) AS degree FROM edges
        |GROUP BY src ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_neighbors" ->
      """WITH raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst FROM lineitem),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw))
        |SELECT src AS node, array_to_string(list(dst ORDER BY dst), ',') AS neighbors,
        |       count(*) AS n_neighbors
        |FROM edges WHERE src < 100 GROUP BY src ORDER BY node""".stripMargin,

    "q_graph_common_neighbors" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS src, l_suppkey + 100000 AS dst
        |           FROM lineitem WHERE l_orderkey < 500)
        |SELECT a.src AS u, b.src AS v, count(*) AS common
        |FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        |GROUP BY a.src, b.src ORDER BY u, v LIMIT 5000""".stripMargin,

    "q_graph_triangle_count" ->
      """WITH raw AS (SELECT DISTINCT l_orderkey AS u, l_suppkey + 100000 AS s
        |             FROM lineitem WHERE l_orderkey < 300),
        |proj AS (SELECT DISTINCT a.u AS u, b.u AS v
        |         FROM raw a JOIN raw b ON a.s = b.s AND a.u < b.u),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM proj e1 JOIN proj e2 ON e1.v = e2.u
        |        JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, count(*) AS n_triangles
        |FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |      UNION ALL SELECT c FROM tri) t
        |GROUP BY node ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_link_predict" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS src, l_suppkey + 100000 AS dst
        |           FROM lineitem WHERE l_orderkey < 500),
        |sdeg AS (SELECT dst, count(*) AS sdeg FROM e GROUP BY dst),
        |odeg AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
        |pairs AS (
        |  SELECT a.src AS u, b.src AS v,
        |         count(*) AS n_common,
        |         sum(1.0 / ln(CAST(s.sdeg AS DOUBLE))) AS aa
        |  FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
        |  JOIN sdeg s ON s.dst = a.dst
        |  GROUP BY 1, 2)
        |SELECT p.u, p.v, p.n_common,
        |       du.odeg + dv.odeg - p.n_common AS n_union,
        |       round(CAST(p.n_common AS DOUBLE) /
        |             (du.odeg + dv.odeg - p.n_common), 6) AS jaccard,
        |       round(p.aa, 6) AS adamic_adar
        |FROM pairs p
        |JOIN odeg du ON du.src = p.u
        |JOIN odeg dv ON dv.src = p.v
        |ORDER BY u, v LIMIT 5000""".stripMargin,

    "q_graph_lpa" ->
      """WITH raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
        |             FROM lineitem WHERE l_orderkey < 2000),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
        |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
        |n1 AS (SELECT e.src AS node, l.lab, count(*) AS cnt
        |       FROM edges e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
        |l1 AS (SELECT node, lab FROM (
        |         SELECT node, lab, row_number() OVER
        |           (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn FROM n1)
        |       WHERE rn = 1),
        |n2 AS (SELECT e.src AS node, l.lab, count(*) AS cnt
        |       FROM edges e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
        |l2 AS (SELECT node, lab FROM (
        |         SELECT node, lab, row_number() OVER
        |           (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn FROM n2)
        |       WHERE rn = 1),
        |n3 AS (SELECT e.src AS node, l.lab, count(*) AS cnt
        |       FROM edges e JOIN l2 l ON l.node = e.dst GROUP BY 1, 2),
        |l3 AS (SELECT node, lab FROM (
        |         SELECT node, lab, row_number() OVER
        |           (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn FROM n3)
        |       WHERE rn = 1)
        |SELECT node, lab AS community FROM l3 ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_pagerank" ->
      """WITH raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
        |             FROM lineitem WHERE l_orderkey < 2000),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
        |deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
        |nn AS (SELECT count(*) AS n FROM deg),
        |pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM deg),
        |it1 AS (SELECT e.dst AS node, sum(p.pr / d.degree) AS inflow
        |        FROM edges e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.node = e.src
        |        GROUP BY e.dst),
        |pr1 AS (SELECT d.node, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
        |          + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, 0) AS pr
        |        FROM deg d LEFT JOIN it1 i ON i.node = d.node),
        |it2 AS (SELECT e.dst AS node, sum(p.pr / d.degree) AS inflow
        |        FROM edges e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.node = e.src
        |        GROUP BY e.dst),
        |pr2 AS (SELECT d.node, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
        |          + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, 0) AS pr
        |        FROM deg d LEFT JOIN it2 i ON i.node = d.node),
        |it3 AS (SELECT e.dst AS node, sum(p.pr / d.degree) AS inflow
        |        FROM edges e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.node = e.src
        |        GROUP BY e.dst),
        |pr3 AS (SELECT d.node, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
        |          + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, 0) AS pr
        |        FROM deg d LEFT JOIN it3 i ON i.node = d.node)
        |SELECT node, round(pr, 9) AS pr FROM pr3 ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_ppr" ->
      """WITH raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
        |             FROM lineitem WHERE l_orderkey < 2000),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
        |deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
        |ns AS (SELECT count(*) AS n FROM deg WHERE node % 100 = 0),
        |pr0 AS (SELECT node, CASE WHEN node % 100 = 0
        |          THEN CAST(1.0 AS DOUBLE) / (SELECT n FROM ns)
        |          ELSE CAST(0.0 AS DOUBLE) END AS pr FROM deg),
        |it1 AS (SELECT e.dst AS node, sum(p.pr / d.degree) AS inflow
        |        FROM edges e JOIN pr0 p ON p.node = e.src JOIN deg d ON d.node = e.src
        |        GROUP BY e.dst),
        |pr1 AS (SELECT d.node, CAST(0.15 AS DOUBLE) * (CASE WHEN d.node % 100 = 0
        |          THEN CAST(1.0 AS DOUBLE) / (SELECT n FROM ns) ELSE 0.0 END)
        |          + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, 0) AS pr
        |        FROM deg d LEFT JOIN it1 i ON i.node = d.node),
        |it2 AS (SELECT e.dst AS node, sum(p.pr / d.degree) AS inflow
        |        FROM edges e JOIN pr1 p ON p.node = e.src JOIN deg d ON d.node = e.src
        |        GROUP BY e.dst),
        |pr2 AS (SELECT d.node, CAST(0.15 AS DOUBLE) * (CASE WHEN d.node % 100 = 0
        |          THEN CAST(1.0 AS DOUBLE) / (SELECT n FROM ns) ELSE 0.0 END)
        |          + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, 0) AS pr
        |        FROM deg d LEFT JOIN it2 i ON i.node = d.node),
        |it3 AS (SELECT e.dst AS node, sum(p.pr / d.degree) AS inflow
        |        FROM edges e JOIN pr2 p ON p.node = e.src JOIN deg d ON d.node = e.src
        |        GROUP BY e.dst),
        |pr3 AS (SELECT d.node, CAST(0.15 AS DOUBLE) * (CASE WHEN d.node % 100 = 0
        |          THEN CAST(1.0 AS DOUBLE) / (SELECT n FROM ns) ELSE 0.0 END)
        |          + CAST(0.85 AS DOUBLE) * coalesce(i.inflow, 0) AS pr
        |        FROM deg d LEFT JOIN it3 i ON i.node = d.node)
        |SELECT node, CAST(floor(pr * 1000000000 + 0.5) AS BIGINT) AS ppr_e9
        |FROM pr3 ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_degree_dist" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT l_orderkey AS src, l_suppkey + 100000 AS dst FROM lineitem
        |    UNION ALL
        |    SELECT l_suppkey + 100000 AS src, l_orderkey AS dst FROM lineitem)),
        |deg AS (SELECT src, count(*) AS degree FROM e GROUP BY src)
        |SELECT degree, count(*) AS n_nodes FROM deg
        |GROUP BY degree ORDER BY degree""".stripMargin,

    "q_graph_clustering_coeff" ->
      """WITH raw AS (SELECT DISTINCT l_orderkey AS u, l_suppkey + 100000 AS s
        |             FROM lineitem WHERE l_orderkey < 300),
        |proj AS (SELECT DISTINCT a.u AS u, b.u AS v
        |         FROM raw a JOIN raw b ON a.s = b.s AND a.u < b.u),
        |deg AS (SELECT node, count(*) AS degree FROM
        |          (SELECT u AS node FROM proj UNION ALL SELECT v FROM proj) t
        |        GROUP BY node),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM proj e1 JOIN proj e2 ON e1.v = e2.u
        |        JOIN proj e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tcnt AS (SELECT node, count(*) AS n_triangles
        |         FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |               UNION ALL SELECT c FROM tri) t
        |         GROUP BY node)
        |SELECT d.node, d.degree, coalesce(t.n_triangles, 0) AS n_triangles,
        |  round(CAST(coalesce(t.n_triangles, 0) * 2 AS DOUBLE) /
        |        (d.degree * (d.degree - 1)), 6) AS clustering_coeff
        |FROM deg d LEFT JOIN tcnt t ON d.node = t.node
        |WHERE d.degree >= 2
        |ORDER BY d.node LIMIT 5000""".stripMargin,

    "q_graph_assortativity" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT l_orderkey AS src, l_suppkey + 100000 AS dst FROM lineitem
        |    UNION ALL
        |    SELECT l_suppkey + 100000 AS src, l_orderkey AS dst FROM lineitem)),
        |deg AS (SELECT src AS node, count(*) AS degree FROM e GROUP BY src),
        |j AS (SELECT CAST(dx.degree AS DECIMAL(18,0)) AS degree_x,
        |             CAST(dy.degree AS DECIMAL(18,0)) AS degree_y
        |      FROM e JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node),
        |m AS (SELECT count(*) AS n_edges,
        |        sum(degree_x) AS sx, sum(degree_y) AS sy,
        |        sum(CAST(degree_x * degree_y AS DECIMAL(38,0))) AS sxy,
        |        sum(CAST(degree_x * degree_x AS DECIMAL(38,0))) AS sxx,
        |        sum(CAST(degree_y * degree_y AS DECIMAL(38,0))) AS syy
        |      FROM j)
        |SELECT n_edges,
        |  round((CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS assortativity
        |FROM m""".stripMargin,

    "q_graph_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
        |  FROM lineitem WHERE l_orderkey < 2000
        |  UNION
        |  SELECT l_suppkey + 100000 AS src, l_orderkey AS dst
        |  FROM lineitem WHERE l_orderkey < 2000),
        |bfs(node, dist) AS (
        |  SELECT CAST(1 AS BIGINT) AS node, 0 AS dist
        |  UNION
        |  SELECT e.dst AS node, bfs.dist + 1 AS dist
        |  FROM bfs JOIN e ON e.src = bfs.node WHERE bfs.dist < 10)
        |SELECT node, CAST(min(dist) AS INT) AS dist
        |FROM bfs GROUP BY node ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_cc" ->
      """WITH RECURSIVE raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
        |                       FROM lineitem WHERE l_orderkey < 2000),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.node = e.dst)
        |SELECT node, min(r) AS component FROM reach
        |GROUP BY node ORDER BY node LIMIT 5000""".stripMargin,

    "q_graph_modularity" ->
      """WITH RECURSIVE raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
        |                       FROM lineitem WHERE l_orderkey < 1000),
        |edges AS (SELECT DISTINCT src, dst FROM
        |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
        |reach(node, r) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.node = e.dst),
        |cc AS (SELECT node, min(r) AS lab FROM reach GROUP BY node),
        |hashlab AS (SELECT DISTINCT src AS node, src % 10 AS lab FROM edges),
        |el_cc AS (SELECT a.lab AS la, b.lab AS lb FROM edges e
        |          JOIN cc a ON a.node = e.src JOIN cc b ON b.node = e.dst),
        |el_h AS (SELECT a.lab AS la, b.lab AS lb FROM edges e
        |         JOIN hashlab a ON a.node = e.src JOIN hashlab b ON b.node = e.dst),
        |tot_cc AS (SELECT count(*) AS m2,
        |             CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS w
        |           FROM el_cc),
        |d2_cc AS (SELECT sum(CAST(dc * dc AS DECIMAL(38,0))) AS sumd2,
        |            count(*) AS n_parts
        |          FROM (SELECT CAST(count(*) AS DECIMAL(18,0)) AS dc
        |                FROM el_cc GROUP BY la)),
        |tot_h AS (SELECT count(*) AS m2,
        |            CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS w
        |          FROM el_h),
        |d2_h AS (SELECT sum(CAST(dc * dc AS DECIMAL(38,0))) AS sumd2,
        |           count(*) AS n_parts
        |         FROM (SELECT CAST(count(*) AS DECIMAL(18,0)) AS dc
        |               FROM el_h GROUP BY la))
        |SELECT 'cc' AS partition, n_parts, CAST(m2 / 2 AS BIGINT) AS m,
        |  round(CAST(w AS DOUBLE) / m2 -
        |    CAST(sumd2 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6) AS q
        |FROM tot_cc, d2_cc
        |UNION ALL
        |SELECT 'mod10' AS partition, n_parts, CAST(m2 / 2 AS BIGINT) AS m,
        |  round(CAST(w AS DOUBLE) / m2 -
        |    CAST(sumd2 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6) AS q
        |FROM tot_h, d2_h
        |ORDER BY partition""".stripMargin,

    "q_graph_conductance" -> conductanceSql(
      "SELECT node, cut, vol_s, vol_t, round(phi, 6) AS phi FROM phi_t ORDER BY node"),

    "q_graph_seed_rank" -> conductanceSql(
      """, closed AS (SELECT src AS node, dst AS member FROM edges
        |             UNION ALL SELECT node, node FROM deg)
        |, sel AS (SELECT c.node AS base, p.node AS seed, p.phi,
        |            row_number() OVER (PARTITION BY c.node ORDER BY p.phi, p.node) AS rn
        |          FROM closed c JOIN phi_t p ON p.node = c.member)
        |, winners AS (SELECT DISTINCT seed, round(phi, 6) AS phi FROM sel WHERE rn = 1)
        |, ranked AS (SELECT seed, phi,
        |               CAST(row_number() OVER (ORDER BY phi, seed) AS INT) AS rank
        |             FROM winners)
        |SELECT seed, phi, rank FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin),

    "q_text_ngram_freq" ->
      """WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT lang, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i FROM toks),
        |grams AS (SELECT lang, array_to_string(t[i:i+2], ' ') AS gram FROM idx),
        |counted AS (SELECT lang, gram, count(*) AS cnt FROM grams GROUP BY lang, gram),
        |ranked AS (SELECT lang, gram, cnt,
        |             CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram) AS INT) AS rank
        |           FROM counted)
        |SELECT lang, gram, cnt, rank FROM ranked WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

    "q_text_tokenize" ->
      """SELECT lang, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
        |  CAST(sum(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END) AS BIGINT) AS len_ok,
        |  round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 6) AS avg_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_corpus_stats" ->
      """SELECT source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
        |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, n_tokens,
        |  round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
        |  avg_token_len,
        |  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) *
        |        (1.0 - abs(CAST(n_stop AS DOUBLE) / n_tokens - 0.1)), 6) AS quality
        |FROM (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN tok IN ('the','a','of','and','to','in','is','on')
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
        |    round(CAST(sum(length(tok)) AS DOUBLE) / count(*), 6) AS avg_token_len
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id)
        |ORDER BY doc_id LIMIT 2000""".stripMargin,

    // argmax semantics mirror Spark's greatest(struct(score, lang)): highest
    // score wins, ties go to the lexicographically LARGEST lang — hence the
    // CASE chain testing langs in descending name order; 'und' when no
    // marker hit at all
    "q_text_chunk" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        |           FROM documents WHERE len(string_split(text, ' ')) > 0),
        |c AS (SELECT doc_id, n_tok, unnest(range((n_tok + 47) // 48)) AS chunk_id FROM d)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  CAST(chunk_id * 48 AS INT) AS start_tok,
        |  CAST(least(64, n_tok - chunk_id * 48) AS INT) AS n_chunk_tok
        |FROM c ORDER BY doc_id, chunk_id LIMIT 5000""".stripMargin,

    "q_text_langid" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sc AS (SELECT doc_id, any_value(lang) AS lang,
        |         sum(CASE WHEN tok IN ('the','a','of','and','is') THEN 1 ELSE 0 END) AS s_en,
        |         sum(CASE WHEN tok IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS s_de,
        |         sum(CASE WHEN tok IN ('el','la','los','y','es') THEN 1 ELSE 0 END) AS s_es,
        |         sum(CASE WHEN tok IN ('le','la','les','et','est') THEN 1 ELSE 0 END) AS s_fr,
        |         sum(CASE WHEN tok IN ('de','shi','zai','he','le') THEN 1 ELSE 0 END) AS s_zh
        |       FROM tok GROUP BY doc_id)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
        |       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'zh'
        |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |       ELSE 'de' END AS pred
        |FROM sc ORDER BY doc_id LIMIT 2000""".stripMargin,

    "q_text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, tf, df,
        |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score
        |  FROM tf JOIN df USING (tok) CROSS JOIN n)
        |SELECT doc_id, tok, tf, df, score FROM scored
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) <= 3
        |ORDER BY doc_id, score DESC, tok LIMIT 3000""".stripMargin,


    // bigrams via the positioned-token self-join (b.pos = a.pos + 1) —
    // identical pairs to Spark's 2-token ngram slices; every log argument
    // is a ratio of exact integer counts, so only avg()'s float-sum order
    // crosses engines (1e-15 vs the 1e-6 rounding grid)
    "q_text_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |v AS (SELECT count(DISTINCT tok) AS vocab FROM tok),
        |bg AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |       FROM tok a JOIN tok b
        |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |cbg AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |cctx AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |scored AS (
        |  SELECT g.doc_id, ln((c2 + 1.0) / (c1 + vocab)) AS logp
        |  FROM bg g JOIN cbg USING (w1, w2) JOIN cctx USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(avg(logp), 6) AS avg_logp
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
        |FROM documents WHERE doc_id % 10 < 3
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_token_bpe" ->
      """SELECT lang,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))) AS BIGINT) AS n_bpe_tokens,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) ORDER BY h LIMIT 5000""".stripMargin,

    "q_dedup_shingle" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM idx),
        |freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f ON s.shingle = f.shingle
        |         WHERE f.df BETWEEN 2 AND 10)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id ORDER BY doc_a, doc_b LIMIT 5000""".stripMargin,

    "q_dedup_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM idx),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f ON s.shingle = f.shingle
        |         WHERE f.df BETWEEN 2 AND 10),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
        |          FROM pairs p JOIN sh x ON x.doc_id = p.doc_a
        |          JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
        |          GROUP BY p.doc_a, p.doc_b)
        |SELECT i.doc_a, i.doc_b, i.n_inter,
        |  round(CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter), 6) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
        |JOIN sizes sb ON sb.doc_id = i.doc_b
        |ORDER BY doc_a, doc_b LIMIT 5000""".stripMargin,

    "q_dedup_prefix" ->
      """SELECT md5(array_to_string(string_split(text, ' ')[1:64], ' ')) AS h,
        |  count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY h LIMIT 5000""".stripMargin,

    "q_dedup_incremental" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM idx),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f ON s.shingle = f.shingle
        |         WHERE f.df BETWEEN 2 AND 10),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
        |          FROM pairs p JOIN sh x ON x.doc_id = p.doc_a
        |          JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
        |          GROUP BY p.doc_a, p.doc_b),
        |jac AS (SELECT i.doc_a, i.doc_b,
        |          round(CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter), 6) AS j
        |        FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
        |        JOIN sizes sb ON sb.doc_id = i.doc_b),
        |newdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |corph AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 <> 0),
        |ex AS (SELECT doc_id FROM newdocs WHERE md5(text) IN (SELECT h FROM corph)),
        |near AS (SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_id,
        |           count(*) AS n
        |         FROM jac
        |         WHERE ((doc_a % 10 = 0) <> (doc_b % 10 = 0)) AND j >= 0.5
        |         GROUP BY 1)
        |SELECT n.doc_id,
        |  CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
        |  CAST(coalesce(nr.n, 0) AS BIGINT) AS n_near,
        |  CAST(CASE WHEN e.doc_id IS NULL AND nr.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM newdocs n LEFT JOIN ex e USING (doc_id) LEFT JOIN near nr USING (doc_id)
        |ORDER BY doc_id LIMIT 5000""".stripMargin,

    "q_dedup_lines" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(0, (len(t) - 1) // 8)) AS i
        |        FROM toks),
        |lt AS (SELECT doc_id, array_to_string(t[i*8+1:i*8+8], ' ') AS line FROM idx),
        |lw AS (SELECT doc_id, line,
        |         CAST(len(string_split(line, ' ')) AS BIGINT) AS n_toks FROM lt),
        |df AS (SELECT line, count(*) AS ndocs
        |       FROM (SELECT DISTINCT doc_id, line FROM lw) GROUP BY line)
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines,
        |  CAST(sum(CASE WHEN ndocs < 2 THEN n_toks ELSE 0 END) AS BIGINT) AS n_kept_tokens
        |FROM lw JOIN df USING (line)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 5000""".stripMargin,

    "q_dedup_containment" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM idx),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f ON s.shingle = f.shingle
        |         WHERE f.df BETWEEN 2 AND 10),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
        |          FROM pairs p JOIN sh x ON x.doc_id = p.doc_a
        |          JOIN sh y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
        |          GROUP BY p.doc_a, p.doc_b),
        |scored AS (SELECT i.doc_a, i.doc_b, i.n_inter,
        |    round(CAST(i.n_inter AS DOUBLE) / sa.sz, 6) AS cont_a,
        |    round(CAST(i.n_inter AS DOUBLE) / sb.sz, 6) AS cont_b
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
        |  JOIN sizes sb ON sb.doc_id = i.doc_b)
        |SELECT doc_a, doc_b, n_inter, cont_a, cont_b
        |FROM scored WHERE greatest(cont_a, cont_b) >= 0.5
        |ORDER BY doc_a, doc_b LIMIT 5000""".stripMargin,

    // Connected components of the candidate-pair graph via a recursive
    // reachability CTE: tiny per-cluster node sets by construction (blocking
    // caps fan-out), so enumerating (node, reachable) pairs is bounded.
    // min(reachable ∪ self) per node = the same canonical label hash-min
    // label propagation converges to.
    "q_dedup_cluster" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 4, 0))) AS i FROM toks),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle FROM idx),
        |freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f ON s.shingle = f.shingle
        |         WHERE f.df BETWEEN 2 AND 10),
        |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |          FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
        |          UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach(node, r) AS (
        |  SELECT DISTINCT src AS node, src AS r FROM edges
        |  UNION
        |  SELECT re.node, e.dst AS r FROM reach re JOIN edges e ON e.src = re.r),
        |canon AS (SELECT node AS doc_id, min(r) AS canon_id FROM reach GROUP BY node),
        |sizes AS (SELECT canon_id, count(*) AS n_cluster FROM canon GROUP BY canon_id)
        |SELECT c.doc_id, c.canon_id, s.n_cluster
        |FROM canon c JOIN sizes s USING (canon_id)
        |ORDER BY doc_id LIMIT 5000""".stripMargin,

    // the stub media payload is the UTF-8 text bytes, so md5(text) here
    // equals Spark's md5 over the BINARY column
    "q_multimodal_dedup" ->
      """WITH m AS (SELECT
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    md5(text) AS h
        |  FROM documents)
        |SELECT kind, count(*) AS n_media, count(DISTINCT h) AS n_distinct,
        |  CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_dups
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    "q_text_quality_gopher" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |ts AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
        |       FROM tok GROUP BY doc_id),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bidx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i FROM toks),
        |bc AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g, count(*) AS cnt
        |       FROM bidx GROUP BY doc_id, g),
        |bs AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bigrams FROM bc GROUP BY doc_id),
        |r AS (SELECT ts.doc_id, CAST(ts.n_tokens AS BIGINT) AS n_tokens,
        |        round(1.0 - CAST(ts.n_distinct AS DOUBLE) / ts.n_tokens, 6) AS rep_ratio,
        |        round(coalesce(CAST(bs.top_cnt AS DOUBLE) / bs.n_bigrams, 0.0), 6) AS top_bigram_frac
        |      FROM ts LEFT JOIN bs USING (doc_id))
        |SELECT doc_id, n_tokens, rep_ratio, top_bigram_frac,
        |  CAST(CASE WHEN n_tokens >= 20 AND rep_ratio <= 0.6 AND top_bigram_frac <= 0.05
        |       THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM r ORDER BY doc_id LIMIT 2000""".stripMargin,

    // single-window form: the global per-lang top-25 by (md5(text), doc_id)
    // equals the Spark side's two-phase shard-then-global selection — each
    // global winner is necessarily within its shard's top-25
    "q_sample_quota" ->
      """WITH h AS (SELECT lang, doc_id, md5(text) AS h FROM documents),
        |r AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk FROM h)
        |SELECT lang, CAST(rk AS INT) AS rk, doc_id
        |FROM r WHERE rk <= 25 ORDER BY lang, rk""".stripMargin,

    "q_sample_mixture" ->
      """WITH t AS (SELECT source, doc_id,
        |    CASE CAST(substr(source, 4) AS INT) % 4
        |      WHEN 0 THEN 1000000 WHEN 1 THEN 500000
        |      WHEN 2 THEN 250000 ELSE 125000 END AS thr
        |  FROM documents),
        |k AS (SELECT source, thr,
        |        CASE WHEN (doc_id * 2654435761) % 1000000 < thr THEN 1 ELSE 0 END AS keep
        |      FROM t)
        |SELECT source, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_kept,
        |  round(CAST(min(thr) AS DOUBLE) / 1000000, 6) AS target_rate,
        |  round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS achieved_rate
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    // the planted-PII salt mirrors the Spark side exactly; patterns are in
    // the Java-regex/RE2 common subset so both engines match identically;
    // DuckDB regexp_replace needs the 'g' option (Spark replaces all by
    // default), and counts come from len(regexp_extract_all) pre-mask
    "q_text_pii_mask" ->
      """WITH s AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |  '@mail.example.com tel +1-555-' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS masked,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\+\d{1,3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips
        |FROM s ORDER BY doc_id LIMIT 2000""".stripMargin,

    "q_embed_quantize" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |st AS (SELECT vec_id, any_value(label) AS label, max(abs(v)) AS maxabs,
        |              count(*) AS n FROM ex GROUP BY vec_id),
        |er AS (SELECT e.vec_id,
        |         abs(floor(e.v / (s.maxabs / 127.0) + 0.5) * (s.maxabs / 127.0) - e.v) AS err
        |       FROM ex e JOIN st s USING (vec_id) WHERE s.maxabs > 0)
        |SELECT vec_id, s.label, round(s.maxabs / 127.0, 6) AS scale,
        |  round(max(er.err), 6) AS max_err,
        |  round(sum(er.err * er.err) / s.n, 9) AS mse
        |FROM er JOIN st s USING (vec_id)
        |GROUP BY vec_id, s.label, s.maxabs, s.n
        |ORDER BY vec_id LIMIT 2000""".stripMargin,

    "q_text_pack" ->
      """WITH t AS (SELECT source, doc_id % 4 AS shard, doc_id,
        |             len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT source, shard, doc_id, n_tok,
        |      coalesce(sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM t)
        |SELECT source, shard, CAST(floor(cum_before / 512.0) AS BIGINT) AS bin,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY source, shard, bin
        |ORDER BY source, shard, bin""".stripMargin,

    "q_text_contamination" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, source, t,
        |        unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i FROM toks),
        |gr AS (SELECT DISTINCT doc_id, source, array_to_string(t[i:i+7], ' ') AS g FROM idx),
        |bench AS (SELECT doc_id AS bench_id, g FROM gr WHERE source = 'src0'),
        |corpus AS (SELECT doc_id, g FROM gr WHERE source <> 'src0')
        |SELECT c.doc_id, b.bench_id, count(*) AS n_shared
        |FROM corpus c JOIN bench b USING (g)
        |GROUP BY c.doc_id, b.bench_id
        |ORDER BY doc_id, bench_id LIMIT 5000""".stripMargin,

    "q_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sig AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok),
        |signs AS (
        |  SELECT s.doc_id, g.j,
        |    CASE WHEN CAST(floor(
        |        (CASE WHEN ascii(substr(s.h, CAST(g.j // 4 AS INT) + 1, 1)) <= 57
        |              THEN ascii(substr(s.h, CAST(g.j // 4 AS INT) + 1, 1)) - 48
        |              ELSE ascii(substr(s.h, CAST(g.j // 4 AS INT) + 1, 1)) - 87 END)
        |        / pow(2, g.j % 4)) AS BIGINT) % 2 = 1
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM sig s, range(0, 64) g(j)),
        |perbit AS (SELECT doc_id, j,
        |             CASE WHEN sum(sgn) >= 0 THEN 1 ELSE 0 END AS bit
        |           FROM signs GROUP BY doc_id, j)
        |SELECT doc_id, CAST(j // 16 AS INT) AS band,
        |  CAST(sum(bit * CAST(pow(2, j % 16) AS BIGINT)) AS BIGINT) AS bucket
        |FROM perbit GROUP BY doc_id, CAST(j // 16 AS INT)
        |ORDER BY doc_id, band""".stripMargin,

    "q_sim_neardup_cosine" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
        |                   generate_subscripts(embedding, 1) AS pos FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
        |dots AS (SELECT a.vec_id AS u, b.vec_id AS w, sum(a.v * b.v) AS dot
        |         FROM ex a JOIN ex b
        |           ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
        |         GROUP BY a.vec_id, b.vec_id),
        |cosd AS (SELECT u, w, round(dot / (nu.nrm * nw.nrm), 6) AS cosine
        |         FROM dots JOIN norms nu ON nu.vec_id = u JOIN norms nw ON nw.vec_id = w)
        |SELECT u AS vec_id_a, w AS vec_id_b, cosine
        |FROM cosd WHERE cosine >= 0.35 ORDER BY vec_id_a, vec_id_b""".stripMargin,

    "q_sim_cosine_topk" ->
      """WITH ex AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
        |                   generate_subscripts(embedding, 1) AS pos FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ex GROUP BY vec_id),
        |probes AS (SELECT * FROM ex WHERE vec_id < 100),
        |dots AS (SELECT p.vec_id AS u, c.vec_id AS w, sum(p.v * c.v) AS dot
        |         FROM probes p JOIN ex c
        |           ON p.pos = c.pos AND p.label = c.label AND p.vec_id <> c.vec_id
        |         GROUP BY p.vec_id, c.vec_id),
        |cosd AS (SELECT u, w, round(dot / (nu.nrm * nw.nrm), 6) AS cosine
        |         FROM dots JOIN norms nu ON nu.vec_id = u JOIN norms nw ON nw.vec_id = w),
        |ranked AS (SELECT u, w, cosine,
        |             row_number() OVER (PARTITION BY u ORDER BY cosine DESC, w) AS rn
        |           FROM cosd)
        |SELECT u AS vec_id, w AS neighbor_id, cosine, CAST(rn AS INT) AS rank
        |FROM ranked WHERE rn <= 5 ORDER BY vec_id, rank""".stripMargin
  )

  /** Shared conductance CTE pipeline over the orderkey<2000 subgraph; the
    * final SELECT (or additional CTEs + SELECT) is appended. */
  private def conductanceSql(tail: String): String =
    """WITH raw AS (SELECT l_orderkey AS src, l_suppkey + 100000 AS dst
      |             FROM lineitem WHERE l_orderkey < 2000),
      |edges AS (SELECT DISTINCT src, dst FROM
      |  (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
      |deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src),
      |tot AS (SELECT CAST(sum(degree) AS BIGINT) AS total_deg FROM deg),
      |members AS (SELECT src AS ego, dst AS member FROM edges
      |            UNION ALL SELECT node, node FROM deg),
      |expand AS (SELECT m.ego, e.dst AS x FROM members m JOIN edges e ON m.member = e.src),
      |flags AS (SELECT ex.ego, CASE WHEN mm.member IS NULL THEN 1 ELSE 0 END AS outside
      |          FROM expand ex LEFT JOIN members mm ON mm.ego = ex.ego AND mm.member = ex.x),
      |stats AS (SELECT ego, CAST(count(*) AS BIGINT) AS vol_full,
      |                 CAST(sum(outside) AS BIGINT) AS cut
      |          FROM flags GROUP BY ego),
      |cond AS (SELECT s.ego AS node, s.cut, s.vol_full - s.cut AS vol_s,
      |                t.total_deg - (s.vol_full - s.cut) - 2 * s.cut AS vol_t
      |         FROM stats s CROSS JOIN tot t),
      |phi_t AS (SELECT node, cut, vol_s, vol_t,
      |            CASE WHEN vol_s = 0 THEN 0.0 WHEN vol_t = 0 THEN 1.0
      |                 ELSE CAST(cut AS DOUBLE) / least(vol_s, vol_t) END AS phi
      |          FROM cond)
      |""".stripMargin + tail
}
