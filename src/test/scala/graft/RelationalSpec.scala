package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and returns a schema on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // executes the plan; q_anti_join may be 0 rows at sf0.001
    }
  }

  test("every query has matching oracle column coverage") {
    // oracleSql keys must be a subset of queries keys
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1_agg aggregates match a hand computation") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length >= 3)
    val li = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <= "1998-09-02")
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == li.count())
  }

  test("q_topk_order is ordered descending") {
    val prices = SparkEntry.queries("q_topk_order")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("pushdown: q6 scan keeps filters at the source") {
    val plan = SparkEntry.queries("q6_filter_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed"))
  }
}
