package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2A core relational query surface.
  *
  * Every query is a declarative DataFrame plan — Catalyst handles
  * predicate pushdown, column pruning and join planning; dimension
  * joins are explicitly broadcast so the 100 TB plan never shuffles a
  * fact table against a dimension.
  *
  * Oracle parity notes (SURVEY.md §6): money math is done in exact
  * DECIMAL and cast to double at the end, so Spark and DuckDB produce
  * bit-identical doubles regardless of summation order; every query
  * has a total deterministic ORDER BY mirrored in the oracle SQL.
  */
object Relational {

  /** Exact money arithmetic: 2-dp doubles → DECIMAL(18,2). */
  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Discount/tax in [0, 0.10], 2-dp → DECIMAL(4,2). */
  private def r2(c: Column): Column = c.cast(DecimalType(4, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  /** extendedprice * (1 - discount), exact. */
  private def discPrice(): Column = d2(col("l_extendedprice")) * (one - r2(col("l_discount")))

  type Q = (SparkSession, String) => DataFrame

  // --- TPC-H Q1: pricing summary ------------------------------------
  val q1Agg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(d2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice()).cast("double").as("sum_disc_price"),
        sum(discPrice() * (one + r2(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(d2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(d2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(r2(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Oracle note — the STRING hop on product sums. Spark's
    * decimal→double cast is correctly rounded at any magnitude
    * (BigDecimal.doubleValue), but DuckDB's is two-step — (double)
    * unscaled int128, then ÷10^scale — which double-rounds once the
    * unscaled value exceeds 2^53 (observed as the r9 10×-gate q1_agg
    * sum_charge ulp: scale-6 totals pass 2^53 at ~9e9). Casting the
    * exact decimal sum through VARCHAR/STRING (an alias both dialects
    * parse) makes DuckDB's conversion correctly rounded too, so the
    * two engines agree bit-exactly at every data scale. Applied to
    * every SUM over a decimal PRODUCT (scale ≥ 4); plain scale-2 money
    * sums keep the direct cast (exact below 9e13 totals).
    */
  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --- TPC-H Q6: pushdown filter + agg ------------------------------
  val q6FilterAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(d2(col("l_extendedprice")) * r2(col("l_discount"))).cast("double").as("revenue"))

  val q6FilterAggSql: String =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --- TPC-H Q3: shipping priority (3-way join, top-k) --------------
  val q3Shipping: Q = (s, d) => {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-06-01"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1997-06-01"))
    // orders/customer scale with SF — no broadcast hints; AQE picks the
    // join strategy from the runtime sizes of the filtered sides.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice()).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT l_orderkey,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01' AND l_shipdate > TIMESTAMP '1997-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // --- TPC-H Q5-style: revenue by region/nation (6-way join) --------
  val q5LocalSupplier: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(discPrice()).cast("double").as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q5LocalSupplierSql: String =
    """SELECT r_name, n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // --- Window: top-3 orders per customer ----------------------------
  val qWindowRank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // --- Window: running sum + lag over events ------------------------
  val qWindowRunning: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("running_value",
        sum(d2(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val qWindowRunningSql: String =
    """SELECT event_id, user_id, ts, value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  // --- Exact distinct counts ----------------------------------------
  val qDistinct: Q = (s, d) =>
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))

  val qDistinctSql: String =
    """SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_rows FROM lineitem""".stripMargin

  // --- Semi join: customers with an urgent order --------------------
  val qSemiJoin: Q = (s, d) => {
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // --- Anti join: customers with no large order ---------------------
  val qAntiJoin: Q = (s, d) => {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // --- Rollup agg ----------------------------------------------------
  val qRollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // --- Pivot events by type -----------------------------------------
  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  val qPivot: Q = (s, d) => {
    val p = Tables.events(s, d)
      .groupBy(col("user_id")).pivot("event_type", eventTypes).count()
    eventTypes.foldLeft(p)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("user_id"))
  }

  val qPivotSql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- Union + distinct ----------------------------------------------
  val qUnionDedup: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.select(col("l_partkey").as("key"))
      .union(li.select(col("l_suppkey").as("key")))
      .distinct()
      .orderBy(col("key"))
  }

  val qUnionDedupSql: String =
    """SELECT l_partkey AS key FROM lineitem UNION SELECT l_suppkey FROM lineitem ORDER BY key""".stripMargin

  // --- Global top-k (TakeOrderedAndProject, no full sort at scale) --
  val qTopkOrder: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val qTopkOrderSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // --- Exact percentiles per group ----------------------------------
  val qPercentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("med_qty"),
        round(percentile(col("l_quantity"), lit(0.9)), 6).as("p90_qty"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("med_price"))
      .orderBy(col("l_returnflag"))

  val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(quantile_cont(l_quantity, 0.5), 6) AS DOUBLE) AS med_qty,
      |  CAST(ROUND(quantile_cont(l_quantity, 0.9), 6) AS DOUBLE) AS p90_qty,
      |  CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS med_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- JSON extraction from events.props ----------------------------
  val qJsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val qJsonExtractSql: String =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- Date bucketing (batch twin of the streaming window agg) ------
  val qDateBucket: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(d2(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  val qDateBucketSql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- Small cartesian -----------------------------------------------
  val qCrossSmall: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  val qCrossSmallSql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q6_filter_agg" -> q6FilterAgg,
    "q3_shipping" -> q3Shipping,
    "q5_local_supplier" -> q5LocalSupplier,
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_distinct" -> qDistinct,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_rollup" -> qRollup,
    "q_pivot" -> qPivot,
    "q_union_dedup" -> qUnionDedup,
    "q_topk_order" -> qTopkOrder,
    "q_percentiles" -> qPercentiles,
    "q_json_extract" -> qJsonExtract,
    "q_date_bucket" -> qDateBucket,
    "q_cross_small" -> qCrossSmall)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q6_filter_agg" -> q6FilterAggSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q_window_rank" -> qWindowRankSql,
    "q_window_running" -> qWindowRunningSql,
    "q_distinct" -> qDistinctSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_rollup" -> qRollupSql,
    "q_pivot" -> qPivotSql,
    "q_union_dedup" -> qUnionDedupSql,
    "q_topk_order" -> qTopkOrderSql,
    "q_percentiles" -> qPercentilesSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_date_bucket" -> qDateBucketSql,
    "q_cross_small" -> qCrossSmallSql)
}
