package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.FieldVerify

/** The reference's own test vectors (tests/test_comprehensive.py)
  * ported against our distributed operators — the engine must agree
  * with the reference on the reference's tests.
  */
class RefVectorsSpec extends AnyFunSuite {
  import TestSpark._

  private def evalBool(c: org.apache.spark.sql.Column): Boolean = {
    spark.range(1).select(c.as("r")).collect()(0).getBoolean(0)
  }

  test("numeric comparator vectors (test_comprehensive.py:28)") {
    val cases = Seq(
      ("3.3", "3.3", true), ("3.3", "3.30", true), ("3.3", "3.33", true),
      ("3.3", "3.5", false), ("0", "0", true), ("100", "101", true),
      ("100", "102", false), ("1.5V", "1.5", true), ("-5", "-5.0", true))
    cases.foreach { case (a, b, want) =>
      assert(evalBool(FieldVerify.numericMatch(lit(a), lit(b))) == want, s"'$a' vs '$b'")
    }
  }

  test("unit comparator vectors (test_comprehensive.py:60)") {
    val cases = Seq(
      ("µA", "uA", true), ("µA", "μA", true), ("mA", "milliamp", true),
      ("V", "volt", true), ("kHz", "kilohertz", true), ("°C", "C", true),
      ("MHz", "mhz", true), ("V", "A", false), ("mV", "V", false))
    cases.foreach { case (a, b, want) =>
      assert(evalBool(FieldVerify.unitMatch(lit(a), lit(b))) == want, s"'$a' vs '$b'")
    }
  }

  private def longForm(rows: Seq[(String, String, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("param", "field", "value").withColumn("table_id", lit("t1"))
  }

  test("perfect match verifies at confidence 1.0 (test_comprehensive.py:92)") {
    val vision = longForm(Seq(
      ("VIN", "Min", "4.2"), ("VIN", "Max", "36"), ("VIN", "Unit", "V"),
      ("IOUT", "Min", ""), ("IOUT", "Max", "3"), ("IOUT", "Unit", "A")))
    val out = FieldVerify.verifySummary(
      FieldVerify.fieldConflicts(vision, vision, Seq("table_id")), Seq("table_id"))
      .collect()(0)
    assert(out.getAs[String]("status") == "verified")
    assert(out.getAs[Double]("confidence") == 1.0)
    assert(out.getAs[Long]("n_conflicts") == 0L)
  }

  test("µA vs uA is no conflict (test_comprehensive.py:134)") {
    val vision = longForm(Seq(("IQ", "Value", "25"), ("IQ", "Unit", "µA")))
    val rule = longForm(Seq(("IQ", "Value", "25"), ("IQ", "Unit", "uA")))
    val out = FieldVerify.verifySummary(
      FieldVerify.fieldConflicts(vision, rule, Seq("table_id")), Seq("table_id"))
      .collect()(0)
    assert(out.getAs[String]("status") == "verified")
    assert(out.getAs[Double]("confidence") >= 0.95)
  }

  test("numeric conflict on critical param resolves vision_wins (test_comprehensive.py:174)") {
    val vision = longForm(Seq(("VIN_MAX", "Value", "36")))
    val rule = longForm(Seq(("VIN_MAX", "Value", "35")))
    val conflicts = FieldVerify.fieldConflicts(vision, rule, Seq("table_id"))
      .filter(!col("is_match")).collect()
    assert(conflicts.length == 1)
    assert(conflicts(0).getAs[String]("resolution") == "vision_wins")
    assert(conflicts(0).getAs[String]("resolved_value") == "36")
    assert(conflicts(0).getAs[String]("severity") == "critical") // VIN_MAX is critical
    val summary = FieldVerify.verifySummary(
      FieldVerify.fieldConflicts(vision, rule, Seq("table_id")), Seq("table_id"))
      .collect()(0)
    // 2.8% diff: critical but not large → stays verified at 0.90
    assert(summary.getAs[String]("status") == "verified")
    assert(math.abs(summary.getAs[Double]("confidence") - 0.90) < 1e-9)
  }

  test("large critical difference needs review (test_comprehensive.py:218)") {
    val vision = longForm(Seq(("Vin_max", "Value", "36"), ("Iout_max", "Value", "3")))
    val rule = longForm(Seq(("Vin_max", "Value", "24"), ("Iout_max", "Value", "3")))
    val summary = FieldVerify.verifySummary(
      FieldVerify.fieldConflicts(vision, rule, Seq("table_id")), Seq("table_id"))
      .collect()(0)
    assert(summary.getAs[String]("status") == "needs_review")
    assert(summary.getAs[Long]("n_conflicts") == 1L)
  }

  test("text comparator normalization") {
    assert(evalBool(FieldVerify.textMatch(lit("  Hello,  World! "), lit("hello world"))))
    assert(!evalBool(FieldVerify.textMatch(lit("alpha"), lit("beta"))))
  }
}
