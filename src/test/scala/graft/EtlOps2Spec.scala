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

  test("category inference covers all four branches with correct precedence") {
    // sf0.001's retailprice range never trips the efficiency rule; the
    // four-branch coverage check needs the sf0.01 part table
    val cats = EtlOps2.etlInferCategory(spark, "/root/testdata/sf0.01").collect()
      .map(_.getAs[String]("category")).groupBy(identity).view.mapValues(_.length).toMap
    assert(Set("Buck Converter", "DC-DC Converter", "LDO", "Unknown").subsetOf(cats.keySet),
      s"missing branches: $cats")
  }
}
