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

  test("review payload: mapping, confidence fallback chain, methods vote, source ref") {
    // sf0.01: parts (2000) outnumber documents (500), so the
    // no-assembled-table fallback branch actually fires
    val rows = EtlOps2.etlReviewPayload(spark, "/root/testdata/sf0.01").collect()
    val params = rows.map(_.getAs[String]("param")).toSet
    assert(params == Set("v_in_min", "v_in_typ", "v_in_max", "i_out_max"),
      s"PARAM_MAPPING must rename every synthetic param: $params")
    val tableConf = Set(0.9, 0.6)
    rows.foreach { r =>
      val (doc, conf) = (r.getAs[Long]("doc"), r.getAs[Double]("confidence"))
      val src = r.getAs[String]("source_ref")
      if (src == "unknown")
        // no assembled table -> the doc's field-verify confidence
        assert(!tableConf.contains(conf) || conf <= 1.0)
      else {
        assert(src == s"page_1_table_p${doc}_${doc % 3}", s"bad source ref $src")
        assert(tableConf.contains(conf), s"doc $doc with a table must use its confidence")
      }
      assert(r.getAs[Boolean]("needs_review") == (conf < 0.95))
      val vb = r.getAs[String]("verified_by")
      val want = (doc % 4) match {
        case 0 => "vision,pdfplumber" // vision_double_verified
        case 1 => "rule_based"        // rule_based_v03
        case 2 => "vision"            // vision_only
        case _ => "unknown"           // manual_entry
      }
      assert(vb == want, s"doc $doc method vote: got $vb want $want")
      if (r.getAs[String]("param") == "i_out_max")
        assert(r.getAs[String]("unit") == "", "unitless param must carry ''")
    }
    // both needs_review branches must be exercised on this corpus
    assert(rows.exists(_.getAs[Boolean]("needs_review")))
    assert(rows.exists(!_.getAs[Boolean]("needs_review")))
  }

  test("export csv: static rule-set columns, absent params as empty string") {
    val df = EtlOps2.etlExportCsv(spark, sf)
    // columns are the STATIC rule set, so the schema is corpus-
    // independent (a data-driven union would diverge from the static
    // oracle on any corpus where a rule matches zero rows — sf0.001
    // trips no efficiency rule, and that column must be all-'')
    assert(df.columns.toSeq == Seq("source_file", "confidence", "status",
      "efficiency_typ", "quiescent_current_typ", "switching_frequency_typ"),
      s"columns must be base + sorted rule set: ${df.columns.toSeq}")
    val p = Tables.part(spark, sf)
    if (p.filter(col("p_retailprice") > 970).count() == 0)
      assert(df.collect().forall(_.getAs[String]("efficiency_typ") == ""),
        "unmatched rule column must be all empty strings")
    val rows = df.collect()
    assert(rows.length == Tables.part(spark, sf).count(),
      "every result gets a row, params or not")
    rows.foreach { r =>
      val sw = r.getAs[String]("switching_frequency_typ")
      assert(sw == "" || sw.toLong % 10 == 0, s"sw value shape: $sw")
    }
    // both presence states must occur for at least one key
    assert(rows.exists(_.getAs[String]("switching_frequency_typ") == ""))
    assert(rows.exists(_.getAs[String]("switching_frequency_typ") != ""))
  }

  test("category inference covers all four branches with correct precedence") {
    // sf0.001's retailprice range never trips the efficiency rule; the
    // four-branch coverage check needs the sf0.01 part table
    val cats = EtlOps2.etlInferCategory(spark, "/root/testdata/sf0.01").collect()
      .map(_.getAs[String]("category")).groupBy(identity).view.mapValues(_.length).toMap
    assert(Set("Buck Converter", "DC-DC Converter", "LDO", "Unknown").subsetOf(cats.keySet),
      s"missing branches: $cats")
  }

  test("etl_scd2: versions chain into gap-free validity intervals, one current per key") {
    val rows = EtlOps2.etlScd2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).sameElements(1L to vs.length.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u: interval gap between v${a.getAs[Long]("version")} and next")
        case _ =>
      }
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1, s"user $u current count")
      assert(sorted.last.getAs[Boolean]("is_current"))
    }
  }
}
