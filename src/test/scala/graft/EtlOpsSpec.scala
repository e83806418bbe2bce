package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EtlOps

class EtlOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("etl_parse_values extracts numbers and normalizes units") {
    val rows = EtlOps.etlParseValues(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("parsed_value"))))
    val units = rows.map(_.getAs[String]("unit_norm")).toSet
    assert(units.subsetOf(Set("mV", "V", "µA", "Ω", "kHz")), s"unexpected units: $units")
  }

  test("etl_fill_down fills every gap that has a predecessor") {
    val df = EtlOps.etlFillDown(spark, sf)
    // a filled value must never be null unless no prior non-null exists
    val bad = df.filter(col("value_gapped").isNotNull &&
      col("value_filled") =!= col("value_gapped")).count()
    assert(bad == 0, "non-gap rows must keep their own value")
  }

  test("etl_double_verify statuses are consistent with rel_diff") {
    val rows = EtlOps.etlDoubleVerify(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rd = r.getAs[Double]("rel_diff")
      val st = r.getAs[String]("status")
      assert((rd <= 0.01) == (st == "verified"), s"rd=$rd st=$st")
    }
  }

  test("etl_confidence is in [0,1] and 1.0 iff no conflicts") {
    val rows = EtlOps.etlConfidence(spark, sf).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("confidence")
      assert(c >= 0.0 && c <= 1.0)
      if (r.getAs[Long]("n_conflicts") == 0L) assert(c == 1.0)
    }
  }

  test("etl_review_queue is ordered worst-first") {
    val diffs = EtlOps.etlReviewQueue(spark, sf).collect().map(_.getAs[Double]("rel_diff"))
    assert(diffs.sameElements(diffs.sorted(Ordering[Double].reverse)))
  }

  test("etl_clean_cells roundtrips every document") {
    val notOk = EtlOps.etlCleanCells(spark, sf).filter(!col("roundtrip_ok")).count()
    assert(notOk == 0)
  }

  test("etl_header_detect classifies standard headers") {
    val m = EtlOps.etlHeaderDetect(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("Parameter") == "Parameter")
    assert(m("min.") == "Min")
    assert(m("Typical") == "Typ")
    assert(m("MAX") == "Max")
    assert(m("units") == "Unit")
    assert(m("Test Condition") == "Test_Conditions")
  }
}
