package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2A extension 3: the remaining TPC-H query shapes, adapted to the
  * test star schema (no partsupp / commitdate / shipmode columns —
  * substitutions noted per query). Same parity discipline as
  * Relational: decimal-exact money math, doubles only at the output
  * boundary, total deterministic ordering.
  */
object Relational6 {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  private def discPrice(): Column =
    d2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(4, 2)))
  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  // --- q4_priority (TPC-H Q4): order-priority checking ----------------
  // EXISTS rewritten as a left-semi join (the scalable decorrelated
  // plan). "Late" adapted to shipdate > orderdate + 60 days (the
  // schema has no commit/receipt dates). The semi join's right side
  // carries only (l_orderkey, l_shipdate) — column pruning reaches
  // the scan; the probe side is a quarter of orders.
  val q4Priority: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val late = Tables.lineitem(s, d)
      .join(o.select(col("o_orderkey").as("ok"), col("o_orderdate").as("od")),
        col("l_orderkey") === col("ok"))
      .filter(col("l_shipdate") > col("od") + expr("INTERVAL 60 DAYS"))
      .select(col("ok"))
    o.join(late, o("o_orderkey") === late("ok"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --- q8_market_share (TPC-H Q8): national market share --------------
  // Share of one supplier nation's revenue among a region's customers
  // for one part type, by year. The numerator/denominator sums stay
  // DECIMAL until the final division. nation/region are bounded
  // dimensions → broadcast; the four linear-scale joins carry no
  // hints (AQE decides).
  val q8MarketShare: Q = (s, d) => {
    val asia = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cust_nk"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "STANDARD"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asia), col("c_nationkey") === col("cust_nk"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("supp_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_5", discPrice())
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
        sum(discPrice()).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN $discPriceSql
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS STRING) AS DOUBLE) /
      |  CAST(CAST(SUM($discPriceSql) AS STRING) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- q9_profit (TPC-H Q9): product-type profit by nation × year -----
  // Profit adapted: supply cost proxied as 90% of p_retailprice (the
  // schema has no partsupp.ps_supplycost). All arithmetic stays
  // DECIMAL — (18,2)×(18,2)×(3,2) widens without precision loss —
  // so the nation×year sums are bit-identical across engines.
  val q9Profit: Q = (s, d) => {
    val amount = discPrice() -
      d2(col("p_retailprice")) * d2(col("l_quantity")) * lit(0.90).cast(DecimalType(3, 2))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("%gear%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String =
    s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
      |  CAST(CAST(SUM($discPriceSql -
      |    CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))
      |      * CAST(0.90 AS DECIMAL(3,2))) AS STRING) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // --- q13_order_dist (TPC-H Q13): customer order-count histogram -----
  // Left outer join with an extra non-equi ON predicate (priority
  // filter belongs to the JOIN, not a WHERE — customers with only
  // urgent orders must count as zero), then a second aggregation over
  // the first's keys. Two shuffles, both on high-cardinality keys.
  val q13OrderDist: Q = (s, d) => {
    val perCust = Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13OrderDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --- q15_top_supplier (TPC-H Q15): top revenue supplier -------------
  // Quarter revenue per supplier; keep the ties-safe "revenue equals
  // the maximum" semantics. The max rides a broadcast scalar
  // aggregate; revenue comparison happens in exact DECIMAL (a double
  // equality would be engine-dependent). Doubles only at output.
  val q15TopSupplier: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discPrice()).as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev))
      .filter(col("total_rev") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    s"""WITH rev AS (
      |  SELECT l_suppkey, SUM($discPriceSql) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(CAST(total_rev AS STRING) AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // --- q16_supplier_cnt (TPC-H Q16): supplier count by part attrs -----
  // partsupp proxied by DISTINCT (part, supplier) pairs observed in
  // lineitem. The multi-distinct count per (brand, type, size) group
  // goes through Catalyst's Expand rewrite — scalable two-phase
  // distinct, never a per-group set.
  val q16SupplierCnt: Q = (s, d) => {
    Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 36)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 36)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --- q17_small_qty (TPC-H Q17): small-quantity revenue --------------
  // The correlated "qty < 0.2 * per-part average" rewritten as exact
  // integer-free decimal algebra over a per-part window:
  // qty < 0.2·(sum/cnt) ⇔ 5·qty·cnt < sum — no double average, no
  // rounding boundary, identical row set in both engines.
  val q17SmallQty: Q = (s, d) => {
    val perPart = Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_brand") === "Brand#3"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("sum_qty", sum(d2(col("l_quantity"))).over(perPart))
      .withColumn("cnt_qty", count(lit(1)).over(perPart))
      .filter(d2(col("l_quantity")) * lit(5) * col("cnt_qty") < col("sum_qty"))
      .agg((sum(d2(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"))
  }

  val q17SmallQtySql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM (
      |  SELECT l_extendedprice, l_quantity,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey) AS sum_qty,
      |    COUNT(*) OVER (PARTITION BY l_partkey) AS cnt_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3') t
      |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_qty < sum_qty""".stripMargin

  // --- q19_disjunctive (TPC-H Q19): disjunctive predicate revenue -----
  // Three OR-ed conjunct groups over the joined row. Catalyst pushes
  // the common l_quantity bounds and the join key; the disjunction
  // itself evaluates inside one codegen stage — no triple scan.
  val q19Disjunctive: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(discPrice()).cast("double").as("revenue"))
  }

  val q19DisjunctiveSql: String =
    s"""SELECT CAST(CAST(SUM($discPriceSql) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --- q21_waiting (TPC-H Q21): suppliers who kept orders waiting -----
  // The EXISTS / NOT EXISTS pair over per-order other-supplier line
  // sets collapses to ONE window pass: per order, the distinct
  // supplier set and the distinct LATE supplier set (collect_set over
  // the order partition — bounded: an order has a handful of
  // suppliers, never corpus-scale). A late row waits iff the order
  // has ≥2 suppliers and exactly one late supplier (itself). One scan
  // of lineitem, one shuffle by order key — versus the literal
  // translation's three joins. "Late" adapted as shipdate >
  // orderdate + 60 days.
  val q21Waiting: Q = (s, d) => {
    val perOrder = Window.partitionBy(col("l_orderkey"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(perOrder)))
      .withColumn("n_late",
        size(collect_set(when(col("late"), col("l_suppkey"))).over(perOrder)))
      .filter(col("late") && col("n_supp") >= 2 && col("n_late") === 1)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21WaitingSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, COUNT(*) AS numwait
      |FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM li l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM li l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  // --- event_funnel: ordered-stage conversion analysis ----------------
  // The event-analytics staple missing from plain windowed aggs: how
  // many users progressed view → click → purchase IN ORDER, each
  // conversion within a 1-day attribution window of the previous
  // stage. Three chained conditional-min windows over ONE user
  // partitioning (one shuffle, three window execs, no self-joins).
  // Output: users per reached stage.
  val eventFunnel: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    val staged = Tables.events(s, d)
      .withColumn("t_view", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click", min(when(col("event_type") === "click" &&
        col("ts") > col("t_view") &&
        col("ts") <= col("t_view") + expr("INTERVAL 1 DAY"), col("ts"))).over(w))
      .withColumn("t_buy", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t_click") &&
        col("ts") <= col("t_click") + expr("INTERVAL 1 DAY"), col("ts"))).over(w))
      .select(col("user_id"),
        when(col("t_buy").isNotNull, 3).when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1).otherwise(0).cast("long").as("stage"))
      .distinct()
    staged.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  val eventFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, event_type, ts,
      |    min(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t_view
      |  FROM events),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view
      |      AND ts <= t_view + INTERVAL 1 DAY THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_click
      |  FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click
      |      AND ts <= t_click + INTERVAL 1 DAY THEN ts END)
      |    OVER (PARTITION BY user_id) AS t_buy
      |  FROM s2),
      |staged AS (
      |  SELECT DISTINCT user_id,
      |    CAST(CASE WHEN t_buy IS NOT NULL THEN 3
      |              WHEN t_click IS NOT NULL THEN 2
      |              WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
      |  FROM s3)
      |SELECT stage, COUNT(*) AS n_users FROM staged
      |GROUP BY stage ORDER BY stage""".stripMargin

  // --- q_running_distinct: running count-distinct per partition -------
  // The naive formulation (count(DISTINCT) over a running frame) is
  // quadratic and unsupported; the scalable rewrite marks each key's
  // FIRST occurrence with a row_number window, then running-sums the
  // 0/1 flags — two windows + one dedup over the same partitioning,
  // linear work. Granularity is the ORDER (parts deduped within an
  // order first): (o_orderdate, l_orderkey) is a unique, total order
  // per customer, so the running count is engine-deterministic —
  // lineitem line numbers are NOT unique in this schema and would tie.
  val qRunningDistinct: Q = (s, d) => {
    val op = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_custkey") % 25 === 0),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate"), col("l_orderkey"), col("l_partkey"))
      .distinct()
    val firstSeen = Window.partitionBy(col("o_custkey"), col("l_partkey"))
      .orderBy(col("o_orderdate"), col("l_orderkey"))
    val perOrder = op
      .withColumn("is_first", when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .groupBy(col("o_custkey"), col("o_orderdate"), col("l_orderkey"))
      .agg(sum(col("is_first")).as("n_new_parts"))
    val running = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("l_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perOrder
      .withColumn("distinct_parts_so_far", sum(col("n_new_parts")).over(running))
      .select(col("o_custkey"), col("l_orderkey"), col("n_new_parts"),
        col("distinct_parts_so_far"))
      .orderBy(col("o_custkey"), col("l_orderkey"))
  }

  val qRunningDistinctSql: String =
    """WITH op AS (
      |  SELECT DISTINCT o_custkey, o_orderdate, l_orderkey, l_partkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_custkey % 25 = 0),
      |f AS (
      |  SELECT *, CASE WHEN row_number() OVER (PARTITION BY o_custkey, l_partkey
      |      ORDER BY o_orderdate, l_orderkey) = 1 THEN 1 ELSE 0 END AS is_first
      |  FROM op),
      |per_order AS (
      |  SELECT o_custkey, o_orderdate, l_orderkey,
      |    CAST(SUM(is_first) AS BIGINT) AS n_new_parts
      |  FROM f GROUP BY 1, 2, 3)
      |SELECT o_custkey, l_orderkey, n_new_parts,
      |  CAST(SUM(n_new_parts) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, l_orderkey
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_parts_so_far
      |FROM per_order ORDER BY o_custkey, l_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q4_priority" -> q4Priority,
    "q8_market_share" -> q8MarketShare,
    "q9_profit" -> q9Profit,
    "q13_order_dist" -> q13OrderDist,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_supplier_cnt" -> q16SupplierCnt,
    "q17_small_qty" -> q17SmallQty,
    "q19_disjunctive" -> q19Disjunctive,
    "q21_waiting" -> q21Waiting,
    "event_funnel" -> eventFunnel,
    "q_running_distinct" -> qRunningDistinct)

  val oracles: Map[String, String] = Map(
    "q4_priority" -> q4PrioritySql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_profit" -> q9ProfitSql,
    "q13_order_dist" -> q13OrderDistSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
    "q17_small_qty" -> q17SmallQtySql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q21_waiting" -> q21WaitingSql,
    "event_funnel" -> eventFunnelSql,
    "q_running_distinct" -> qRunningDistinctSql)
}
