package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2A extension: the wider TPC-H-style query battery plus statistics,
  * string, array-aggregation and cube coverage. Same oracle-parity
  * discipline as Relational (decimal-exact money math, rounded
  * iterative aggregates, total deterministic ordering).
  */
object Relational2 {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  private def discPrice(): Column =
    d2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(4, 2)))
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  // --- TPC-H Q7-style: trade volume between nation pairs by year ----
  val q7Volume: Q = (s, d) => {
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      // supplier/customer scale linearly with SF — leave the strategy to AQE
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(discPrice()).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7VolumeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(CAST(SUM($discPriceSql) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --- TPC-H Q10-style: top returners ---------------------------------
  // Revenue aggregates by o_custkey BEFORE the customer join:
  // c_custkey is unique in customer (c_name is functionally dependent),
  // so grouping the lineitem⋈orders rows first and then attaching
  // (c_custkey, c_name) 1:1 yields the identical decimal sums with the
  // customer join probing one row per customer instead of one per
  // lineitem, and the wide (custkey, name) aggregation disappears
  // (guide §2.3 aggregate-before-shuffle).
  val q10Returns: Q = (s, d) =>
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(discPrice()).cast("double").as("revenue"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10ReturnsSql: String =
    s"""SELECT c_custkey, c_name, CAST(CAST(SUM($discPriceSql) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --- TPC-H Q14-style: promo revenue share ---------------------------
  val q14Promo: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg((sum(when(col("p_type") === "PROMO", discPrice())
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") * 100.0 /
        sum(discPrice()).cast("double")).as("promo_revenue_pct"))

  val q14PromoSql: String =
    s"""SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discPriceSql
      |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) * 100.0 /
      |  CAST(CAST(SUM($discPriceSql) AS STRING) AS DOUBLE) AS promo_revenue_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  // --- TPC-H Q18-style: large-quantity orders -------------------------
  val q18Large: Q = (s, d) => {
    // wide() on the aggregation key: the per-orderkey quantity rollup
    // was bounded by the scan's row-group split count locally (3
    // tasks); hashing by l_orderkey up front IS the aggregation's own
    // exchange, so the groupBy adds none (no-op once the scan has
    // enough splits)
    val bigOrders = Tables.wide(Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity")), col("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum(d2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    Tables.orders(s, d)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  val q18LargeSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey) li ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE sum_qty > 250
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin

  // --- TPC-H Q22-style: rich customers with no urgent orders ---------
  // TPC-H's "customers with no orders at all" predicate is vacuous on
  // the driver corpus (every customer has ≥1 order at every SF, so the
  // anti-join was structurally empty and the gate row proved nothing).
  // Restricting the anti-join side to 1-URGENT orders keeps the exact
  // Q22 plan shape — broadcast scalar subquery + anti-join + group —
  // while making the output non-empty at the gated scales.
  val q22Balance: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(d2(col("c_acctbal"))).cast("double") / count(lit(1))).as("a"))
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, d)
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(d2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val q22BalanceSql: String =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |                   FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // --- statistics aggregates -----------------------------------------
  val qStatsAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
      .orderBy(col("l_returnflag"))

  val qStatsAggSql: String =
    """SELECT l_returnflag,
      |  CAST(ROUND(stddev_samp(l_quantity), 6) AS DOUBLE) AS sd_qty,
      |  CAST(ROUND(var_samp(l_quantity), 6) AS DOUBLE) AS var_qty,
      |  CAST(ROUND(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS corr_qty_price,
      |  CAST(ROUND(covar_samp(l_quantity, l_discount), 6) AS DOUBLE) AS covar_qty_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- string function battery ----------------------------------------
  val qStringFuncs: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        substring(col("c_name"), 1, 8).as("prefix"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        instr(col("c_name"), "1").cast("long").as("pos1"),
        reverse(col("c_name")).as("rev"),
        length(col("c_name")).cast("long").as("nlen"))
      .orderBy(col("c_custkey"))

  val qStringFuncsSql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS up,
      |  substring(c_name, 1, 8) AS prefix,
      |  lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      |  CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
      |  reverse(c_name) AS rev,
      |  CAST(length(c_name) AS BIGINT) AS nlen
      |FROM customer ORDER BY c_custkey""".stripMargin

  // --- array aggregation (order-stable via sort) ----------------------
  val qArrayAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",", array_sort(collect_list(col("event_type")))).as("types_sorted"),
        concat_ws(",", array_sort(array_distinct(collect_list(col("event_type"))))).as("types_distinct"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))

  val qArrayAggSql: String =
    """SELECT user_id,
      |  array_to_string(list_sort(list(event_type)), ',') AS types_sorted,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_distinct,
      |  COUNT(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- cube ------------------------------------------------------------
  val qCube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(d2(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  val queries: Map[String, Q] = Map(
    "q7_volume" -> q7Volume,
    "q10_returns" -> q10Returns,
    "q14_promo" -> q14Promo,
    "q18_large" -> q18Large,
    "q22_balance" -> q22Balance,
    "q_stats_agg" -> qStatsAgg,
    "q_string_funcs" -> qStringFuncs,
    "q_array_agg" -> qArrayAgg,
    "q_cube" -> qCube)

  val oracles: Map[String, String] = Map(
    "q7_volume" -> q7VolumeSql,
    "q10_returns" -> q10ReturnsSql,
    "q14_promo" -> q14PromoSql,
    "q18_large" -> q18LargeSql,
    "q22_balance" -> q22BalanceSql,
    "q_stats_agg" -> qStatsAggSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_array_agg" -> qArrayAggSql,
    "q_cube" -> qCubeSql)
}
