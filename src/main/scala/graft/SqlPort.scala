package graft

/** Spark-dialect SQL for the gated keys whose DuckDB oracle text uses a
  * construct Spark SQL does not parse (quantile_cont, unnest/list ops,
  * string_split, epoch_us, ASOF JOIN, `//` integer division, …).
  *
  * Together with the 57 dialect-portable oracle texts that
  * SqlFrontendSpec already replays verbatim, every key in this map
  * gives a SQL-only consumer the engine's gated semantics as plain
  * `spark.sql(...)` text over the SqlFrontend temp views — no Scala
  * API required. SqlFrontendSpec replays each entry against the Scala
  * API plan and requires row-for-row equality, so these texts are
  * conformance-tested, not documentation.
  *
  * Dialect mapping used (DuckDB → Spark): quantile_cont →
  * percentile_cont WITHIN GROUP; json_extract_string →
  * get_json_object; list/array_to_string/list_sort →
  * collect_list/collect_set/sort_array/array_join; unnest → explode;
  * string_split → split; epoch_us/make_timestamp → unix_micros/
  * timestamp_micros; strpos → instr; regexp_replace(…,'g') → Spark's
  * replace-all default; `//` → div; ASOF JOIN → time-conditioned join
  * + ROW_NUMBER pick; WITH RECURSIVE is shared syntax on Spark 4.
  */
object SqlPort {

  val sparkSql: Map[String, String] = Map(
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS med_qty,
        |  CAST(ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS p90_qty,
        |  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS DOUBLE) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up,
        |  substring(c_name, 1, 8) AS prefix,
        |  lpad(CAST(c_custkey AS STRING), 9, '0') AS padded,
        |  regexp_replace(c_name, '[0-9]', '#') AS masked,
        |  CAST(instr(c_name, '1') AS BIGINT) AS pos1,
        |  reverse(c_name) AS rev,
        |  CAST(length(c_name) AS BIGINT) AS nlen
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_array_agg" ->
      """SELECT user_id,
        |  array_join(sort_array(collect_list(event_type)), ',') AS types_sorted,
        |  array_join(sort_array(collect_set(event_type)), ',') AS types_distinct,
        |  COUNT(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sliding_window" ->
      """SELECT wstart, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT explode(array(
        |      timestamp_micros((unix_micros(ts) div 1800000000) * 1800000000),
        |      timestamp_micros((unix_micros(ts) div 1800000000) * 1800000000 - 1800000000))) AS wstart,
        |    event_type, value
        |  FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y,
        |  CAST(month(ts) AS BIGINT) AS m,
        |  CAST(dayofmonth(ts) AS BIGINT) AS dom,
        |  CAST(dayofweek(ts) AS BIGINT) AS dow,
        |  CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(minute(ts) AS BIGINT) AS mi,
        |  ts + INTERVAL 7 DAY AS week_later,
        |  date_trunc('hour', ts) AS hour_bucket,
        |  CAST(last_day(ts) AS STRING) AS month_end
        |FROM events ORDER BY event_id""".stripMargin,

    "q_explode" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "q_window_frames" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |         CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) AS day_no,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT o_custkey, o_orderkey, day_no,
        |  CAST(first_value(price) OVER w_whole AS DOUBLE) AS first_price,
        |  CAST(last_value(price)  OVER w_whole AS DOUBLE) AS last_price,
        |  CAST(nth_value(price, 2) OVER w_whole AS DOUBLE) AS second_price,
        |  CAST(ntile(4) OVER w_ord AS BIGINT) AS quartile,
        |  percent_rank() OVER w_ord AS pct_rank,
        |  cume_dist() OVER w_ord AS cume,
        |  CAST(lag(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS DOUBLE) AS prev_price,
        |  CAST(lead(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS DOUBLE) AS next_price,
        |  CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY day_no
        |       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30_spend
        |FROM o
        |WINDOW
        |  w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  w_whole AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE pr AS (
        |  SELECT p_partkey AS id, CAST(p_partkey div 7 AS BIGINT) AS parent
        |  FROM part),
        |cc(id, anc, depth) AS (
        |  SELECT id, id, 0 FROM pr WHERE parent < 1
        |  UNION ALL
        |  SELECT pr.id, cc.anc, cc.depth + 1
        |  FROM pr JOIN cc ON pr.parent = cc.id
        |  WHERE pr.parent >= 1)
        |SELECT id, anc AS root, CAST(depth AS BIGINT) AS depth
        |FROM cc ORDER BY id""".stripMargin,

    "graph_pagerank" ->
      """WITH n AS (SELECT p_partkey AS id, CAST(p_partkey div 7 AS BIGINT) AS parent
        |           FROM part),
        |r0 AS (SELECT id, parent, CAST(1000000 AS BIGINT) AS score FROM n),
        |a1 AS (SELECT parent AS t, CAST(SUM((score * 85) div 100) AS BIGINT) AS m
        |       FROM r0 WHERE parent >= 1 GROUP BY parent),
        |r1 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
        |       FROM n LEFT JOIN a1 ON n.id = a1.t),
        |a2 AS (SELECT parent AS t, CAST(SUM((score * 85) div 100) AS BIGINT) AS m
        |       FROM r1 WHERE parent >= 1 GROUP BY parent),
        |r2 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
        |       FROM n LEFT JOIN a2 ON n.id = a2.t),
        |a3 AS (SELECT parent AS t, CAST(SUM((score * 85) div 100) AS BIGINT) AS m
        |       FROM r2 WHERE parent >= 1 GROUP BY parent),
        |r3 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
        |       FROM n LEFT JOIN a3 ON n.id = a3.t)
        |SELECT id, score FROM r3 ORDER BY id""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, user_id, ts, value, click_ts, click_id, click_value
        |FROM (
        |  SELECT p.event_id, p.user_id, p.ts, p.value,
        |    c.ts AS click_ts, c.click_id, c.click_value,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts DESC NULLS LAST, c.click_id DESC NULLS LAST) AS rn
        |  FROM (SELECT user_id, ts, event_id, value FROM events
        |        WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT user_id, ts, event_id AS click_id, value AS click_value
        |             FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts) t
        |WHERE rn = 1
        |ORDER BY user_id, ts, event_id""".stripMargin)
}
