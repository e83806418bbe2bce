package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational6

class Relational6Spec extends AnyFunSuite {
  import TestSpark._

  test("q4_priority plans a semi join and covers every priority class") {
    val df = Relational6.q4Priority(spark, sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "EXISTS must decorrelate to a left-semi join")
    val rows = df.collect()
    assert(rows.length == 5, "all five priority classes have late orders")
    assert(rows.map(_.getLong(1)).forall(_ > 0))
  }

  test("q8_market_share is a valid share in (0,1) per year") {
    val rows = Relational6.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("q13_order_dist conserves customers and counts urgent-only as zero") {
    val rows = Relational6.q13OrderDist(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.customer(spark, sf).count(),
      "histogram buckets must partition the customer set")
  }

  test("q15_top_supplier returns exactly the max-revenue suppliers") {
    val rows = Relational6.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, "every returned supplier ties the maximum")
  }

  test("q16_supplier_cnt: single distinct plans as two-phase aggregate, counts check out") {
    val df = Relational6.q16SupplierCnt(spark, sf)
    // one distinct aggregate → partial-distinct two-phase plan (two
    // nested Aggregates), never a per-group set collection
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set"))
    val r = df.orderBy(col("p_brand"), col("p_type"), col("p_size")).first()
    val want = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === r.getString(0) && col("p_type") === r.getString(1) &&
        col("p_size") === r.getInt(2))
      .select(col("l_suppkey")).distinct().count()
    assert(r.getLong(3) == want)
  }

  test("q17_small_qty window is part-partitioned (no global window)") {
    val df = Relational6.q17SmallQty(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(") ||
      plan.contains("windowspecdefinition(l_partkey"))
    assert(df.first().getDouble(0) > 0.0)
  }

  test("q19_disjunctive evaluates the OR chain in one scan of lineitem") {
    val df = Relational6.q19Disjunctive(spark, sf)
    val scans = df.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Scan parquet"))
    assert(scans <= 2, "one lineitem scan + one part scan — no per-branch rescan")
  }

  test("event_funnel: stages differentiate and sum to the user universe") {
    val rows = Relational6.eventFunnel(spark, sf).collect()
    assert(rows.length >= 2, "attribution windows must split the users")
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, sf)
      .select(col("user_id")).distinct().count())
  }

  test("q_running_distinct: final running value equals exact distinct per customer") {
    val rows = Relational6.qRunningDistinct(spark, sf).collect()
    val last = rows.groupBy(_.getLong(0)).map { case (c, rs) =>
      c -> rs.map(_.getLong(3)).max
    }
    val exact = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_custkey") % 25 === 0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("l_partkey")).as("nd")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last == exact, "running count must converge to the exact distinct count")
  }

  test("q21_waiting: every flagged supplier was the sole late supplier") {
    val rows = Relational6.q21Waiting(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).forall(_ > 0))
    // ordering: descending by numwait then name
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted(Ordering[Long].reverse))
  }
}
