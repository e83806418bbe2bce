package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ExtractPipeline

class ExtractPipelineSpec extends AnyFunSuite {
  import TestSpark._

  lazy val out = ExtractPipeline.pipeExtractE2E(spark, sf).collect()

  test("e2e pipeline verifies both fields for every validated document") {
    assert(out.nonEmpty)
    // every doc surviving inference validation compares mpn + voltage
    assert(out.forall(_.getAs[Long]("n_fields") == 2L))
  }

  test("planted rule-run disagreements surface as conflicts") {
    val mpnConflicts = out.filter(r => r.getAs[Long]("doc_id") % 13 == 0)
    assert(mpnConflicts.nonEmpty)
    assert(mpnConflicts.forall(_.getAs[Long]("n_conflicts") >= 1L),
      "MPN-X rewrites must conflict")
    // 3.1% voltage perturbation exceeds the 1% tolerance
    val vConflicts = out.filter { r =>
      val id = r.getAs[Long]("doc_id")
      id % 7 == 0 && id % 13 != 0 && (id % 50) != 0 // voltage 0.0 stays 0.0
    }
    assert(vConflicts.nonEmpty && vConflicts.forall(_.getAs[Long]("n_conflicts") >= 1L))
  }

  test("clean documents come out verified with full confidence, no priority") {
    val clean = out.filter { r =>
      val id = r.getAs[Long]("doc_id")
      id % 7 != 0 && id % 13 != 0
    }
    assert(clean.nonEmpty)
    clean.foreach { r =>
      assert(r.getAs[Long]("n_conflicts") == 0L)
      assert(r.getAs[String]("status") == "verified")
      assert(r.getAs[Double]("confidence") == 1.0)
      assert(r.isNullAt(r.fieldIndex("priority")))
    }
  }

  test("review-queue priorities are dense, unique and worst-first") {
    val queued = out.filter(!_.isNullAt(5)).sortBy(_.getAs[Long]("priority"))
    if (queued.nonEmpty) {
      val ps = queued.map(_.getAs[Long]("priority"))
      assert(ps.toSeq == (1L to ps.length).toSeq, "priorities must be dense from 1")
      val confs = queued.map(_.getAs[Double]("confidence"))
      assert(confs.sameElements(confs.sorted), "queue must be worst-confidence-first")
    }
  }
}
