package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for round-4 operators: the optimizer must
  * produce the scale shape the operator was designed around, not just
  * correct rows. (Same style as IndexSpec's dynamic-partition-pruning
  * assertion and TrainOps2Spec's no-broadcast-hint assertion.)
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("stream_interval_join is an equi-join on user, not a cartesian") {
    val plan = executedPlan("stream_interval_join")
    assert(!plan.toLowerCase.contains("cartesian"),
      s"interval join degenerated to a cartesian product:\n${plan.take(1500)}")
    // the user-key equality must be a join key (hash/sort-merge), with
    // the time interval as a post-join or join-condition filter
    assert(plan.contains("Join") || plan.contains("join"), plan.take(500))
  }

  test("etl_merge_upsert is one shuffle by key (window), no join") {
    val plan = executedPlan("etl_merge_upsert")
    assert(plan.contains("Window"), "merge must be a window, not a join")
    assert(!plan.contains("SortMergeJoin") && !plan.toLowerCase.contains("broadcasthashjoin"),
      s"merge-upsert must not join:\n${plan.take(1500)}")
  }

  test("etl_merge_upsert scan prunes to the referenced columns only") {
    val plan = executedPlan("etl_merge_upsert")
    val readSchema = "o_orderkey|o_custkey|o_orderdate|o_totalprice"
    // o_orderpriority / o_orderstatus must not be read
    assert(!plan.contains("o_orderpriority"),
      s"unpruned column o_orderpriority in scan:\n${plan.take(1500)}")
  }

  test("q_hierarchy rounds keep equi-joins (no broadcast of the full state)") {
    val plan = executedPlan("q_hierarchy")
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(1000))
  }

  test("text_entropy plan is shuffle-free up to the final sort") {
    val physical = SparkEntry.queries("text_entropy")(spark, sf)
      .queryExecution.executedPlan.toString
    // exactly one exchange: the range partitioning of the final orderBy
    val exchanges = "(?i)exchange".r.findAllIn(physical).length
    assert(exchanges <= 1,
      s"per-row entropy must not shuffle before the final sort ($exchanges exchanges):\n${physical.take(1500)}")
  }
}
