package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("cleanCorpus filters by tokens, punctuation, language, and dedups") {
    val spark2 = spark
    import spark2.implicits._
    val many = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, many, "en"),            // survives
      (2L, many, "en"),            // exact dup of 1 → dropped
      (3L, "short doc", "en"),     // too few tokens
      (4L, many, "fr"),            // wrong language
      (5L, many + " !!!???!!..." * 30, "en") // punctuation-heavy
    ).toDF("doc_id", "text", "lang")
    val out = Pipeline.cleanCorpus(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L))
  }

  test("cleanCorpus config loosening keeps more documents") {
    val base = Pipeline.cleanCorpus(Tables.documents(spark, sf)).count()
    val loose = Pipeline.cleanCorpus(Tables.documents(spark, sf),
      Pipeline.Config(minTokens = 1, keepLangs = Seq("en", "es", "fr", "de", "zh"))).count()
    assert(loose >= base)
    assert(loose == Tables.documents(spark, sf).count()) // all docs distinct + low punct
  }

  test("verify + reviewQueue flow honors the tolerance knob") {
    val spark2 = spark
    import spark2.implicits._
    def run(v: String) = {
      val vision = Seq(("t1", "P", "Value", "100")).toDF("k", "param", "field", "value")
      val rule = Seq(("t1", "P", "Value", v)).toDF("k", "param", "field", "value")
      Pipeline.verify(vision, rule, Seq("k"))._2.collect()(0)
    }
    assert(run("100.5").getAs[Long]("n_conflicts") == 0L) // within 1%
    assert(run("103").getAs[Long]("n_conflicts") == 1L)   // outside 1%
    // loosened tolerance accepts the 3% difference
    val vision = Seq(("t1", "P", "Value", "100")).toDF("k", "param", "field", "value")
    val rule = Seq(("t1", "P", "Value", "103")).toDF("k", "param", "field", "value")
    val loose = Pipeline.verify(vision, rule, Seq("k"),
      Pipeline.Config(numericTolerance = 0.05))._2.collect()(0)
    assert(loose.getAs[Long]("n_conflicts") == 0L)
  }

  test("reviewQueue ranks worst confidence first") {
    val spark2 = spark
    import spark2.implicits._
    val vision = Seq(
      ("a", "VIN_MAX", "Value", "100"), ("b", "P", "Value", "100")
    ).toDF("k", "param", "field", "value")
    val rule = Seq(
      ("a", "VIN_MAX", "Value", "150"), ("b", "P", "Value", "100")
    ).toDF("k", "param", "field", "value")
    val (_, summary) = Pipeline.verify(vision, rule, Seq("k"))
    val queue = Pipeline.reviewQueue(summary, Seq("k")).collect()
    assert(queue.length == 1) // only the critical large-diff key needs review
    assert(queue(0).getAs[String]("k") == "a")
    assert(queue(0).getAs[Long]("priority") == 1L)
  }
}
