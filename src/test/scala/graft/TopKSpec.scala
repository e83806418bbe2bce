package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK

class TopKSpec extends AnyFunSuite {
  import TestSpark._

  test("topKPerGroup matches the window row_number formulation") {
    val orders = Tables.orders(spark, sf)
    val viaTopK = TopK.topKPerGroup(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTopK == viaWindow)
  }

  test("plan uses TopKPerGroupExec with a partial stage before the shuffle") {
    val df = TopK.topKPerGroup(Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", true)), 2)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, s"plan:\n$plan")
    assert(plan.contains("Exchange"), "must shuffle on group keys between stages")
  }

  test("final output is best-first within each group") {
    val df = TopK.topKPerGroup(Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    df.select("o_custkey", "o_totalprice").collect()
      .groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val prices = rows.map(_.getDouble(1))
        assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
      }
  }

  test("k larger than group size returns whole groups") {
    val n = Tables.orders(spark, sf).count()
    val df = TopK.topKPerGroup(Tables.orders(spark, sf), Seq("o_custkey"),
      Seq(("o_totalprice", true)), 10000)
    assert(df.count() == n)
  }
}
