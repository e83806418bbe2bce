package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** §2D sources & sinks.
  *
  * The reference's batch_export.py writes JSON and flattened CSV for
  * downstream import; at scale the same surface is: schema-explicit
  * readers (schema inference reads the whole file — never at 100 TB),
  * partitioned columnar sinks, and a single-file export only for
  * small, final result sets.
  */
object Sources {

  /** Schema-explicit CSV reader — no inference pass. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Schema-explicit JSON-lines reader. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parquet reader (schema from footer — cheap). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC reader. An explicit schema keeps a zero-file directory (the
    * write of an empty frame) readable — inference would throw.
    */
  def readOrc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(spark.read.schema(_)).orc(path)

  /** Columnar sink partitioned by the given columns — the layout that
    * makes downstream partition pruning free. `maxRecordsPerFile`
    * bounds file size at scale.
    */
  def writePartitioned(df: DataFrame, path: String, partitionBy: Seq[String],
      format: String = "parquet", maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .format(format)
      .save(path)

  /** The reference's CSV export (batch_export.py ExportConfig
    * flatten_params): one file, header row — only for final small
    * results; the coalesce(1) is intentional and documented.
    */
  def exportSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** JSON-lines export (batch_export.py JSON path). */
  def exportJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed managed table: pre-shuffled on the join/agg key so
    * downstream equi-joins between tables bucketed the same way run
    * with NO exchange — the 100 TB co-location strategy for repeated
    * fact-fact joins.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Flatten a struct column into top-level columns (CSV-compatible
    * rows, reference flatten_params).
    */
  def flattenStruct(df: DataFrame, structCol: String): DataFrame = {
    val fields = df.schema(structCol).dataType.asInstanceOf[StructType].fieldNames
    val flat = fields.map(f => col(s"$structCol.$f").as(s"${structCol}_$f"))
    df.select(df.columns.filter(_ != structCol).map(col) ++ flat: _*)
  }
}
