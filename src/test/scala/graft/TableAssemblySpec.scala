package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TableAssembly

class TableAssemblySpec extends AnyFunSuite {
  import TestSpark._

  lazy val out = TableAssembly.etlTableAssemble(spark, sf).collect()

  test("every document yields exactly one assembled table") {
    assert(out.length == Tables.documents(spark, sf).count())
    assert(out.map(_.getAs[String]("table_id")).distinct.length == out.length)
  }

  test("injected titles are detected, others fall back to positional") {
    out.foreach { r =>
      val page = r.getAs[Long]("page_num")
      val title = r.getAs[String]("title")
      if (page % 3 == 0)
        assert(!title.startsWith("Table "), s"page $page should detect an injected title, got $title")
      else
        assert(title == s"Table ${page % 3 + 1}", s"page $page fallback title wrong: $title")
    }
  }

  test("standard header rows normalize and earn 0.9 confidence") {
    out.filter(_.getAs[Long]("page_num") % 4 == 0).foreach { r =>
      assert(r.getAs[String]("headers") == "Parameter,Symbol,Min,Typ,Max")
      assert(r.getAs[Double]("confidence") == 0.9)
    }
    // non-injected docs have random-token headers → 0.6
    assert(out.filter(r => r.getAs[Long]("page_num") % 4 != 0)
      .forall(_.getAs[Double]("confidence") == 0.6))
  }

  test("n_rows matches the 5-column body row count") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.filter(r => r.getAs[Long]("page_num") % 3 != 0).foreach { r =>
      val n = docs(r.getAs[Long]("page_num"))
      assert(r.getAs[Long]("n_rows") == math.max(0, math.ceil((n - 5) / 5.0).toLong))
    }
  }
}
