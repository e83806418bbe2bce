package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("GraftExtensions wires functions + TopK strategy into a conf-built session") {
    val base = spark // force TestSpark init so a context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try {
      SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
    assert(s2 ne base, "extension session must be a fresh session")

    // custom expressions resolve by SQL name with no Registry call
    val hash = s2.sql("SELECT simhash64(array('alpha', 'beta')) AS h")
      .collect()(0).getLong(0)
    val viaRegistry = {
      graft.functions.Registry.registerAll(base)
      base.sql("SELECT simhash64(array('alpha', 'beta')) AS h").collect()(0).getLong(0)
    }
    assert(hash == viaRegistry, "extension-injected kernel ≡ registry kernel")
    assert(s2.sql("SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()(0).getDouble(0) == 11.0)

    // the planner strategy is present WITHOUT TopK.topKPerGroup's
    // imperative injection: plan a TopKPerGroup node directly
    import s2.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
    val top = graft.plans.TopK.topKPerGroup(df, Seq("g"), Seq(("v", true)), 1)
    assert(top.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L), ("b", 9L)))
  }
}
