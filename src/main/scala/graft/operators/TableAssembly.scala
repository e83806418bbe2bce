package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table/title assembly — re-expresses the reference's rule-based table
  * extraction (extractor_v03.py:130 extract_tables_from_page,
  * :244 _detect_headers, :280 _detect_table_title,
  * :275 _has_standard_headers): raw page cells become
  * (table_id, title, normalized headers, row count, confidence)
  * records. Everything is columnar (when-chains + array transforms
  * inside whole-stage codegen); one row per table, no shuffle besides
  * the final order.
  *
  * Input model for the registered query: each document is one raw
  * table — row 0 is the header row (a standard datasheet header is
  * injected for doc_id % 4 == 0 to exercise normalization; otherwise
  * the doc's own first five tokens), the remaining tokens form 5-column
  * body rows, and the page text doubles as title-detection context
  * (a rotating known title is prepended for doc_id % 3 == 0).
  */
object TableAssembly {
  type Q = (SparkSession, String) => DataFrame

  /** TABLE_TITLE_PATTERNS with their canonical title-cased form. */
  private val titlePatterns = Seq(
    "electrical\\s*characteristics" -> "Electrical Characteristics",
    "absolute\\s*maximum\\s*ratings" -> "Absolute Maximum Ratings",
    "recommended\\s*operating\\s*conditions" -> "Recommended Operating Conditions",
    "thermal\\s*information" -> "Thermal Information",
    "pin\\s*functions" -> "Pin Functions",
    "device\\s*comparison" -> "Device Comparison")

  /** _detect_headers normalization for one cell. */
  private def normalizeHeader(c: Column): Column = {
    val l = lower(trim(c))
    when(length(l) === 0, "Unknown")
      .when(l.rlike("param"), "Parameter")
      .when(l.rlike("symbol"), "Symbol")
      .when(l.rlike("test.*cond|condition"), "Test_Conditions")
      .when(l.rlike("^min"), "Min")
      .when(l.rlike("^typ"), "Typ")
      .when(l.rlike("^max"), "Max")
      .when(l.rlike("unit"), "Unit")
      .when(l.rlike("desc"), "Description")
      .otherwise(trim(c))
  }

  /** _detect_table_title: first matching pattern wins, else the
    * positional fallback "Table {idx+1}".
    */
  private def detectTitle(pageText: Column, tableIdx: Column): Column = {
    val l = lower(pageText)
    titlePatterns.foldRight(concat(lit("Table "), tableIdx + 1): Column) {
      case ((pat, canon), elseCol) => when(l.rlike(pat), canon).otherwise(elseCol)
    }
  }

  val etlTableAssemble: Q = (s, d) => {
    val injectedTitle = element_at(
      array(titlePatterns.map(p => lit(p._2)): _*),
      (pmod(col("doc_id"), lit(6)) + 1).cast("int"))
    // Fully-null text behaves as '' (the reference's _clean_cell maps
    // None -> '', extractor_v03.py:288) — mirrored in the DuckDB oracle
    // and the SqlPort Spark text so all three surfaces agree.
    val text0 = coalesce(col("text"), lit(""))
    val base = Tables.documents(s, d)
      .withColumn("page_text",
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(injectedTitle, lit(" "), text0)).otherwise(text0))
      .withColumn("toks", split(col("page_text"), " "))
      .withColumn("table_idx", pmod(col("doc_id"), lit(3)).cast("long"))
    val headerCells = when(pmod(col("doc_id"), lit(4)) === 0,
        array(lit("Parameter"), lit("Symbol"), lit("min."), lit("Typical"), lit("MAX")))
      .otherwise(slice(col("toks"), 1, 5))
    val headers = transform(headerCells, normalizeHeader(_))
    val nStd = size(array_intersect(array_distinct(headers),
      array(lit("Parameter"), lit("Min"), lit("Typ"), lit("Max"), lit("Unit"))))
    base.select(
        concat(lit("table_p"), col("doc_id"), lit("_"), col("table_idx")).as("table_id"),
        col("doc_id").as("page_num"),
        detectTitle(col("page_text"), col("table_idx")).as("title"),
        concat_ws(",", headers).as("headers"),
        greatest(lit(0L),
          ceil((size(col("toks")) - 5).cast("double") / 5).cast("long")).as("n_rows"),
        when(nStd >= 3, 0.9).otherwise(0.6).as("confidence"))
      .orderBy(col("page_num"))
  }

  val etlTableAssembleSql: String = {
    val titleCase = titlePatterns.map { case (pat, canon) =>
      s"WHEN regexp_matches(lower(page_text), '$pat') THEN '$canon'"
    }.mkString("\n      |       ")
    val titles = titlePatterns.map(p => s"'${p._2}'").mkString(", ")
    s"""WITH aug AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |         THEN [$titles][CAST(doc_id % 6 AS INT) + 1] || ' ' || coalesce(text, '')
      |         ELSE coalesce(text, '') END AS page_text,
      |    doc_id % 3 AS table_idx
      |  FROM documents),
      |cells AS (
      |  SELECT *, string_split(page_text, ' ') AS toks,
      |    CASE WHEN doc_id % 4 = 0
      |         THEN ['Parameter', 'Symbol', 'min.', 'Typical', 'MAX']
      |         ELSE string_split(page_text, ' ')[1:5] END AS header_cells
      |  FROM aug),
      |normed AS (
      |  SELECT *, list_transform(header_cells, c ->
      |    CASE WHEN length(lower(trim(c))) = 0 THEN 'Unknown'
      |         WHEN regexp_matches(lower(trim(c)), 'param') THEN 'Parameter'
      |         WHEN regexp_matches(lower(trim(c)), 'symbol') THEN 'Symbol'
      |         WHEN regexp_matches(lower(trim(c)), 'test.*cond|condition') THEN 'Test_Conditions'
      |         WHEN regexp_matches(lower(trim(c)), '^min') THEN 'Min'
      |         WHEN regexp_matches(lower(trim(c)), '^typ') THEN 'Typ'
      |         WHEN regexp_matches(lower(trim(c)), '^max') THEN 'Max'
      |         WHEN regexp_matches(lower(trim(c)), 'unit') THEN 'Unit'
      |         WHEN regexp_matches(lower(trim(c)), 'desc') THEN 'Description'
      |         ELSE trim(c) END) AS headers
      |  FROM cells)
      |SELECT 'table_p' || doc_id || '_' || table_idx AS table_id,
      |  doc_id AS page_num,
      |  CASE $titleCase
      |       ELSE 'Table ' || (table_idx + 1) END AS title,
      |  array_to_string(headers, ',') AS headers,
      |  greatest(0, CAST(ceil(CAST(len(toks) - 5 AS DOUBLE) / 5) AS BIGINT)) AS n_rows,
      |  CASE WHEN len(list_intersect(list_distinct(headers),
      |    ['Parameter', 'Min', 'Typ', 'Max', 'Unit'])) >= 3 THEN 0.9 ELSE 0.6 END AS confidence
      |FROM normed ORDER BY page_num""".stripMargin
  }

  val queries: Map[String, Q] = Map("etl_table_assemble" -> etlTableAssemble)
  val oracles: Map[String, String] = Map("etl_table_assemble" -> etlTableAssembleSql)
}
