package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Rank

class RankSpec extends AnyFunSuite {
  import TestSpark._

  test("globalRowNumber matches the naive global window ranking") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    val keys = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val naive = orders
      .withColumn("priority", row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select("o_orderkey", "priority")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scalable = Rank.globalRowNumber(orders, keys, "priority")
      .select("o_orderkey", "priority")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scalable == naive)
  }

  test("globalRowNumber plan is one range shuffle, no Window, no SinglePartition") {
    val orders = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    val plan = Rank.globalRowNumber(
      orders, Seq(col("o_totalprice").desc, col("o_orderkey")), "priority")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected a range shuffle:\n$plan")
    // local rank is a projection over the range-sorted slices
    // (monotonically_increasing_id low bits) — no Window operator, and
    // the offsets running sum is a broadcast theta-join over the
    // bounded counts frame — no SinglePartition anywhere
    assert(!plan.contains("Window"), s"rank must be projection-derived:\n$plan")
    assert(!plan.contains("SinglePartition"), s"no stage may serialize:\n$plan")
    assert(plan.contains("monotonically_increasing_id"), s"local-rank projection missing:\n$plan")
    graft.Caches.release(blocking = true)
  }

  test("globalRowNumber handles empty input") {
    val empty = Tables.orders(spark, sf).filter(lit(false))
    assert(Rank.globalRowNumber(empty, Seq(col("o_orderkey")), "priority").count() == 0L)
  }
}
