package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir = Files.createTempDirectory("sources").toString
  private lazy val nation = Tables.nation(spark, sf)

  test("csv roundtrip with explicit schema") {
    Sources.exportSingleCsv(nation, s"$dir/nation_csv")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = Sources.readCsv(spark, s"$dir/nation_csv", schema)
    assert(back.count() == nation.count())
    assert(back.schema.fieldNames.sameElements(nation.schema.fieldNames))
    // single-file export: exactly one csv part
    val parts = new java.io.File(s"$dir/nation_csv").listFiles().count(_.getName.endsWith(".csv"))
    assert(parts == 1)
  }

  test("json roundtrip with explicit schema") {
    Sources.exportJson(nation, s"$dir/nation_json")
    val back = Sources.readJson(spark, s"$dir/nation_json", nation.schema)
    assert(back.count() == nation.count())
    assert(back.select(sum(col("n_nationkey"))).collect()(0).getLong(0) ==
      nation.select(sum(col("n_nationkey"))).collect()(0).getLong(0))
  }

  test("orc roundtrip") {
    nation.write.mode("overwrite").orc(s"$dir/nation_orc")
    assert(Sources.readOrc(spark, s"$dir/nation_orc").count() == nation.count())
  }

  test("partitioned write creates partition directories and prunes") {
    Sources.writePartitioned(nation, s"$dir/nation_part", Seq("n_regionkey"))
    val dirs = new java.io.File(s"$dir/nation_part").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("n_regionkey="))
    assert(dirs.length == 5)
    val pruned = Sources.readParquet(spark, s"$dir/nation_part")
      .filter(col("n_regionkey") === 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == nation.filter(col("n_regionkey") === 2).count())
    // partition filter must reach the scan, not a post-filter
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"),
      s"partition pruning missing from plan:\n$plan")
  }

  test("flattenStruct expands struct fields into columns") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, ("x", 2.0))).toDF("id", "meta")
    val flat = Sources.flattenStruct(df, "meta")
    assert(flat.columns.toSet == Set("id", "meta__1", "meta__2"))
  }

  test("versioned table: reader-under-writer isolation, time travel, half-commits invisible, retention") {
    import graft.sources.VersionedTable
    val spark2 = spark
    import spark2.implicits._
    val path = Files.createTempDirectory("tblv").toString + "/t"
    // v0 commit + a reader that resolves it
    assert(VersionedTable.commitTable(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), path) == 0)
    val pinned = VersionedTable.readTable(spark, path, Some(0))
    assert(pinned.count() == 2)
    // a writer lands v1 while the reader holds v0: the pinned read
    // stays fully-old (v0 files are immutable), the default read is
    // fully-new — never a mix
    assert(VersionedTable.commitTable(
      Seq((1L, "a2"), (3L, "c")).toDF("doc_id", "text"), path) == 1)
    assert(pinned.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (2L, "b")), "pinned reader saw the new snapshot")
    assert(VersionedTable.readTable(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a2"), (3L, "c")))
    // a half-written snapshot (no _SUCCESS) is invisible to resolution
    // and refused by time travel
    Seq((9L, "junk")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$path/table_v2")
    assert(new java.io.File(s"$path/table_v2/_SUCCESS").delete())
    assert(VersionedTable.committedTableVersion(spark, path).contains(1),
      "uncommitted snapshot leaked into version resolution")
    intercept[IllegalArgumentException] {
      VersionedTable.readTable(spark, path, Some(2))
    }
    // retention: keep-last window retires old versions under grace;
    // the retired version refuses time travel, vacuum deletes it
    VersionedTable.retainTable(spark, path, keepLast = 1, graceMs = 1L)
    intercept[IllegalArgumentException] {
      VersionedTable.readTable(spark, path, Some(0))
    }
    assert(VersionedTable.readTable(spark, path).count() == 2)
    Thread.sleep(10)
    assert(VersionedTable.vacuumTable(spark, path, 0L) == Seq("table_v0"))
    assert(VersionedTable.readTable(spark, path).count() == 2)
  }
}
