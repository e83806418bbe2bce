package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, ScaleOps, Similarity}

class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_topk_group matches the window-rank formulation row for row") {
    val got = ScaleOps.qTopkGroup(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val want = li.select(col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("rank"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("q_topk_group plan uses the custom operator, not a window sort") {
    val plan = ScaleOps.qTopkGroup(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom operator missing:\n$plan")
  }

  test("q_skew_join equals the unsalted rollup") {
    val got = ScaleOps.qSkewJoin(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val sup = Tables.supplier(spark, sf)
    val want = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("ann_quantized ranking agrees with float brute-force at rank 1") {
    // Quantization keeps ~6 significant digits; the float ranking can
    // only diverge where two scores differ below 1e-6 — assert the
    // unambiguous part: the nearest neighbor per query.
    val quant = Similarity.annQuantized(spark, sf)
      .filter(col("rank") === 1).select("query_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val float = Similarity.annBruteforce(spark, sf)
      .filter(col("rank") === 1).select("query_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(quant == float)
  }

  test("dedup_jaccard_block pairs are true near-dups and include exact dups") {
    val pairs = Dedup.dedupJaccardBlock(spark, sf)
    val bad = pairs.filter(col("jaccard") < 0.8 || col("jaccard") > 1.0).count()
    assert(bad == 0)
    // every exact-dup pair (identical normalized text) must be found:
    // identical docs share every shingle, including the minimal one
    val exact = Tables.documents(spark, sf)
      .select(col("doc_id"),
        regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("t"))
    val exactPairs = exact.as("a").join(exact.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val missed = exactPairs.join(pairs, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0, s"$missed exact-dup pairs missed by blocking")
  }
}
