package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("graph_pagerank: leaves sit at the restart floor, internal nodes above it") {
    val rows = GraphOps.graphPagerank(spark, sf).collect()
    assert(rows.length == Tables.part(spark, sf).count())
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = byId.keySet.max
    // a node whose children are all beyond the key space is a leaf:
    // after 3 rounds it holds exactly the restart mass
    val leaves = byId.keys.filter(_ * 7 > n)
    assert(leaves.nonEmpty && leaves.forall(byId(_) == 150000L))
    // internal nodes accumulate their children's damped mass
    val internal = byId.keys.filter(id => id >= 1 && id * 7 + 6 <= n)
    assert(internal.nonEmpty && internal.forall(byId(_) > 150000L))
    // a parent of ≥1 leaf holds ≥ 150000 + floor(150000·0.85)·1 at round 3
    val leafParent = leaves.map(_ / 7).filter(_ >= 1).head
    assert(byId(leafParent) >= 150000L + 127500L)
  }

  test("graph_pagerank plan: fixed rounds, no cartesian, no driver collects") {
    val df = GraphOps.graphPagerank(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"))
  }
}
