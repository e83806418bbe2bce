package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational5

class Relational5Spec extends AnyFunSuite {
  import TestSpark._

  test("q_window_frames: all windows are customer-partitioned (no global window)") {
    val df = Relational5.qWindowFrames(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(") ||
      plan.contains("windowspecdefinition(o_custkey"),
      "every window spec must partition by o_custkey")
    val n = Tables.orders(spark, sf).filter(col("o_custkey") % 10 === 0).count()
    assert(df.count() == n, "one output row per filtered order")
  }

  test("q_window_frames: frame semantics spot-checks") {
    val rows = Relational5.qWindowFrames(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val firsts = sorted.map(_.getDouble(3)).distinct
      assert(firsts.length == 1, "first_price constant within a customer")
      // trailing-30-day sum is at least the current order's contribution
      sorted.foreach { r =>
        assert(r.getDouble(11) > 0.0)
        assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0) // cume_dist
      }
    }
  }

  test("q_multi_distinct uses the Expand-based rewrite and matches direct counts") {
    val df = Relational5.qMultiDistinct(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("Expand"),
      "multi-distinct must go through Catalyst's Expand rewrite")
    val li = Tables.lineitem(spark, sf)
    val want = li.filter(col("l_returnflag") === "R")
      .agg(countDistinct(col("l_partkey"))).first().getLong(0)
    val got = df.filter(col("l_returnflag") === "R").first().getLong(1)
    assert(got == want)
  }
}
