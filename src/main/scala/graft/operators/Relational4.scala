package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth coverage batch: scalar math battery, datetime battery,
  * boolean/conditional aggregates, GROUPING SETS. Parity notes:
  * transcendental results are rounded (JVM StrictMath vs libm differ
  * in the last ulp); day-of-week numbering is normalized (Spark is
  * 1=Sunday, DuckDB 0=Sunday).
  */
object Relational4 {
  type Q = (SparkSession, String) => DataFrame

  // --- q_math_funcs ---------------------------------------------------
  val qMathFuncs: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        sqrt(col("o_totalprice")).as("sqrt_price"), // IEEE-exact both engines
        abs(col("o_totalprice") - 250000).as("abs_diff"),
        ceil(col("o_totalprice") / 1000).cast("long").as("ceil_k"),
        floor(col("o_totalprice") / 1000).cast("long").as("floor_k"),
        signum(col("o_totalprice") - 250000).as("sign_diff"),
        pmod(col("o_orderkey"), lit(97)).as("mod97"),
        // Transcendentals can differ by 1 ulp between JVM and libm, and
        // Spark round() (HALF_UP) vs DuckDB round() (HALF_EVEN) diverge on
        // exact .5 boundaries. Use the identical IEEE-exact formula
        // floor(x*1e6 + 0.5)/1e6 on BOTH sides: multiply/add/floor/divide
        // are bit-deterministic, and the result can never be -0.0.
        (floor(log(col("o_totalprice")) * 1e6 + 0.5) / 1e6).as("ln_price"),
        (floor((pow(col("o_totalprice"), 0.5) - sqrt(col("o_totalprice"))) * 1e6 + 0.5) / 1e6)
          .as("pow_check"))
      .orderBy(col("o_orderkey"))

  val qMathFuncsSql: String =
    """SELECT o_orderkey,
      |  sqrt(o_totalprice) AS sqrt_price,
      |  abs(o_totalprice - 250000) AS abs_diff,
      |  CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
      |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
      |  CAST(sign(o_totalprice - 250000) AS DOUBLE) AS sign_diff,
      |  o_orderkey % 97 AS mod97,
      |  floor(ln(o_totalprice) * 1e6 + 0.5) / 1e6 AS ln_price,
      |  floor((pow(o_totalprice, 0.5) - sqrt(o_totalprice)) * 1e6 + 0.5) / 1e6 AS pow_check
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --- q_datetime_funcs -----------------------------------------------
  val qDatetimeFuncs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("dom"),
        dayofweek(col("ts")).cast("long").as("dow"), // 1 = Sunday
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        (col("ts") + expr("INTERVAL 7 DAYS")).as("week_later"),
        date_trunc("hour", col("ts")).as("hour_bucket"),
        last_day(col("ts")).cast("string").as("month_end"))
      .orderBy(col("event_id"))

  val qDatetimeFuncsSql: String =
    """SELECT event_id,
      |  CAST(year(ts) AS BIGINT) AS y,
      |  CAST(month(ts) AS BIGINT) AS m,
      |  CAST(dayofmonth(ts) AS BIGINT) AS dom,
      |  CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
      |  CAST(hour(ts) AS BIGINT) AS h,
      |  CAST(minute(ts) AS BIGINT) AS mi,
      |  ts + INTERVAL 7 DAY AS week_later,
      |  date_trunc('hour', ts) AS hour_bucket,
      |  CAST(last_day(ts) AS VARCHAR) AS month_end
      |FROM events ORDER BY event_id""".stripMargin

  // --- q_conditional_agg ----------------------------------------------
  // Exact cents * 1e9 headroom keeps orderkeys unique up to 1e9 rows
  // (sf ≈ 167) without overflowing Long (max cents ~5.6e7 → key ~5.6e16).
  private val centsKey: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long") *
      1000000000L + col("o_orderkey")

  val qConditionalAgg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count_if(col("o_totalprice") > 300000).as("n_big"),
        bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        // Exact-integer composite key (price-cents, orderkey). The cents
        // come from a double→DECIMAL(18,2) cast, never round(double*100):
        // price*100 in FP can land exactly on an n+0.5 boundary where
        // Spark HALF_UP and DuckDB HALF_EVEN disagree, but a half-cent
        // (k/1000, 5 last digit) is never binary-representable, so the
        // decimal cast rounds identically in both engines.
        max_by(col("o_orderkey"), centsKey).as("max_price_key"),
        min_by(col("o_orderkey"), centsKey).as("min_price_key"))
      .orderBy(col("o_orderstatus"))

  val qConditionalAggSql: String =
    """SELECT o_orderstatus,
      |  CAST(count_if(o_totalprice > 300000) AS BIGINT) AS n_big,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      |  max_by(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 1000000000 + o_orderkey) AS max_price_key,
      |  min_by(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 1000000000 + o_orderkey) AS min_price_key
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --- q_grouping_sets (SQL surface + GROUPING()) ---------------------
  val qGroupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus) AS g_status, grouping(o_orderpriority) AS g_prio,
        |  COUNT(*) AS n
        |FROM graft_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS TINYINT) AS g_prio,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // --- q_correlated: correlated scalar subquery ----------------------
  // Customers whose account balance exceeds their own average order
  // value — a per-row correlated aggregate, which Catalyst decorrelates
  // into a join (no per-row re-execution at scale).
  val qCorrelated: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("graft_cust_corr")
    Tables.orders(s, d).createOrReplaceTempView("graft_ord_corr")
    s.sql(
      """SELECT c_custkey, c_acctbal
        |FROM graft_cust_corr
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) / 50
        |                   FROM graft_ord_corr WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  val qCorrelatedSql: String =
    """SELECT c_custkey, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) / 50
      |                   FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_correlated" -> qCorrelated,
    "q_math_funcs" -> qMathFuncs,
    "q_datetime_funcs" -> qDatetimeFuncs,
    "q_conditional_agg" -> qConditionalAgg,
    "q_grouping_sets" -> qGroupingSets)

  val oracles: Map[String, String] = Map(
    "q_correlated" -> qCorrelatedSql,
    "q_math_funcs" -> qMathFuncsSql,
    "q_datetime_funcs" -> qDatetimeFuncsSql,
    "q_conditional_agg" -> qConditionalAggSql,
    "q_grouping_sets" -> qGroupingSetsSql)
}
