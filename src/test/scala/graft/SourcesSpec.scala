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

  test("optimizeTable: compacts small files into disjoint z-ranges, reader-under-optimize stays isolated, data unchanged") {
    import graft.sources.VersionedTable
    val spark2 = spark
    import spark2.implicits._
    val path = Files.createTempDirectory("tblo").toString + "/t"
    // a fragmented v0: 64 hash-scattered files of (doc_id, text)
    val rows = (0L until 512L).map(i => (i, "x" * (i % 97).toInt + "y"))
    assert(VersionedTable.commitTable(
      rows.toDF("doc_id", "text").repartition(64, col("doc_id")), path) == 0)
    def parts(v: Int) = new java.io.File(s"$path/table_v$v").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(0).length > 16, s"v0 not fragmented: ${parts(0).length} files")
    // a reader pins v0, then OPTIMIZE lands v1 underneath it
    val pinned = VersionedTable.readTable(spark, path, Some(0))
    val zx = (col("doc_id") % 65536L).cast("long")
    val zy = (length(col("text")) % 65536).cast("long")
    assert(VersionedTable.optimizeTable(spark, path, zx, zy, targetFiles = 4) == 1)
    assert(pinned.count() == 512, "pinned reader disturbed by optimize")
    // compaction: v1 holds at most targetFiles data files
    assert(parts(1).length <= 4, s"v1 not compacted: ${parts(1).length} files")
    // rewrite changed LAYOUT only — the row set is identical
    val before = rows.toSet
    val after = VersionedTable.readTable(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "optimize changed table data")
    // z-clustering: per-FILE z-ranges are disjoint (range partitioning
    // on the Morton value), which is what lets min/max stats prune
    val ranges = parts(1).map { f =>
      val mm = spark.read.parquet(f.getAbsolutePath)
        .select(graft.operators.ScaleOps.mortonZ(zx, zy).as("z"))
        .agg(min(col("z")), max(col("z"))).collect()(0)
      (mm.getLong(0), mm.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping per-file z-ranges: ${ranges.mkString(", ")}")
      case _ =>
    }
  }
}
