package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EtlOps2

class EtlOps2Spec extends AnyFunSuite {
  import TestSpark._

  test("isCategoryHeader follows pattern-then-alpha-ratio semantics") {
    val spark2 = spark
    import spark2.implicits._
    val cases = Seq(
      ("Electrical Characteristics", true),  // pattern: ^electrical + characteristics$
      ("Recommended Operating Conditions", true),
      ("DC Characteristics", true),          // ^(dc|ac)\s
      ("3.3 V typ", false),                  // numeric, alpha ratio low
      ("x7R 0402", false),
      ("General Notes", true),               // no pattern, alpha ratio > 0.8
      ("", false)
    ).toDF("text", "expected")
    cases.withColumn("got", EtlOps2.isCategoryHeader(col("text"))).collect()
      .foreach(r => assert(r.getAs[Boolean]("got") == r.getAs[Boolean]("expected"),
        s"'${r.getAs[String]("text")}'"))
  }

  test("header merge fills groups forward but only merges onto value columns") {
    val rows = EtlOps2.etlHeaderMerge(spark, sf)
      .filter(col("table_id") === 1L).orderBy(col("col_idx")).collect()
      .map(_.getAs[String]("header"))
    assert(rows.toSeq == Seq("Parameter", "Test Condition",
      "Output Voltage - Min", "Output Voltage - Typ", "Output Voltage - Max", "Unit"))
  }

  test("footnote links resolve markers and leave unmarked cells null") {
    val out = EtlOps2.etlFootnoteLink(spark, sf).collect()
    out.foreach { r =>
      if (r.getAs[String]("param") == "IQ") {
        val noteId = r.getAs[Long]("note_id")
        assert(noteId == r.getAs[Long]("doc_id") % 3 + 1)
        assert(r.getAs[String]("note_text") == s"Measured at VIN = ${noteId * 4}V, TA = 25C")
      } else {
        assert(r.isNullAt(r.fieldIndex("note_id")))
        assert(r.isNullAt(r.fieldIndex("note_text")))
      }
    }
  }

  test("category inference covers all four branches with correct precedence") {
    // sf0.001's retailprice range never trips the efficiency rule; the
    // four-branch coverage check needs the sf0.01 part table
    val cats = EtlOps2.etlInferCategory(spark, "/root/testdata/sf0.01").collect()
      .map(_.getAs[String]("category")).groupBy(identity).view.mapValues(_.length).toMap
    assert(Set("Buck Converter", "DC-DC Converter", "LDO", "Unknown").subsetOf(cats.keySet),
      s"missing branches: $cats")
  }
}
