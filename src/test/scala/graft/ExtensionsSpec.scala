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

    try {
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
      assert(s2.sql("SELECT sig_agree_count(array(1L, 2L, 3L), array(1L, 5L, 3L)) AS k")
        .collect()(0).getInt(0) == 2)

      // k accepts any foldable integral (BIGINT literal, folded tree);
      // a non-foldable k is a clear analysis error, not a CCE/NPE
      // md5 minhash twin resolves with the same k hardening
      assert(s2.sql("SELECT size(md5_minhash_sig(array('a', 'b'), 16)) AS n")
        .collect()(0).getInt(0) == 16)
      assert(s2.sql("SELECT size(minhash_signature(array('a'), CAST(8 AS BIGINT))) AS n")
        .collect()(0).getInt(0) == 8)
      assert(s2.sql("SELECT size(minhash_signature(array('a'), 4 + 4)) AS n")
        .collect()(0).getInt(0) == 8)
      val err = intercept[Exception] {
        s2.sql("SELECT minhash_signature(array('a'), length(rand()::string))").collect()
      }
      assert(err.getMessage.contains("minhash_signature"),
        s"error must name the function: ${err.getMessage}")

      // the planner strategy is present WITHOUT TopK.topKPerGroup's
      // imperative injection: plan a TopKPerGroup node directly
      import s2.implicits._
      val df = Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "v")
      val top = graft.plans.TopK.topKPerGroup(df, Seq("g"), Seq(("v", true)), 1)
      assert(top.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 3L), ("b", 9L)))
    } finally {
      // re-pin the shared TestSpark session even if getOrCreate or an
      // assertion above re-activated s2 — later suites must never
      // observe the extension session (order-dependent failures)
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
