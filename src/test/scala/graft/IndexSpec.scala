package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class IndexSpec extends AnyFunSuite {
  import TestSpark._

  private val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_spec"

  test("persisted IVF index matches in-memory IVF recall and layout") {
    val corpus = Tables.embeddings(spark, sf)
    val (nCent, nProbe) = Similarity.buildIvfIndex(corpus, path)
    assert(nCent >= 16 && nProbe >= 2)
    // corpus is laid out as one directory per cell
    val cells = new java.io.File(s"$path/corpus").listFiles()
      .filter(_.getName.startsWith("cent_id=")).length
    assert(cells > 0 && cells <= nCent)
    val qs = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = Similarity.queryIvfIndex(spark, path, qs, nProbe, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = Similarity.annBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"persisted-index recall@10 $recall below 0.9")
  }

  test("index probe plan uses dynamic partition pruning on cent_id") {
    val qs = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val plan = Similarity.queryIvfIndex(spark, path, qs, 4, 10)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"probe scan must prune cent_id partitions dynamically:\n${plan.take(2000)}")
  }
}
