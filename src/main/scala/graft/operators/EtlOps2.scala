package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second reference-ETL batch: component-category inference
  * (batch_export.py:340 _infer_category — parameter-presence
  * precedence chain with the LDO quiescent-current threshold) and
  * category-header detection (merge_detector.py:256
  * _is_category_header — pattern list then alpha-ratio fallback).
  * Both fully columnar with exact DuckDB oracles.
  */
object EtlOps2 {
  type Q = (SparkSession, String) => DataFrame

  // --- etl_infer_category --------------------------------------------
  // Long-form params per part (deterministic presence rules mirrored in
  // the oracle), regrouped per key, then the reference's precedence:
  // switching_frequency_typ → Buck Converter; efficiency_typ → DC-DC
  // Converter; quiescent_current_typ < 100 → LDO; else Unknown.
  val etlInferCategory: Q = (s, d) => {
    val p = Tables.part(s, d)
    val params = p.filter(col("p_size") > 40)
        .select(col("p_partkey"), lit("switching_frequency_typ").as("param"),
          (col("p_size") * 10).cast("double").as("value"))
      .unionByName(p.filter(col("p_retailprice") > 970)
        .select(col("p_partkey"), lit("efficiency_typ").as("param"),
          lit(0.9).cast("double").as("value")))
      .unionByName(p.filter(col("p_brand").startsWith("Brand#1"))
        .select(col("p_partkey"), lit("quiescent_current_typ").as("param"),
          (col("p_size") * 3).cast("double").as("value")))
    params.groupBy(col("p_partkey"))
      .agg(
        max(when(col("param") === "switching_frequency_typ", 1).otherwise(0)).as("has_sw"),
        max(when(col("param") === "efficiency_typ", 1).otherwise(0)).as("has_eff"),
        max(when(col("param") === "quiescent_current_typ", col("value"))).as("iq"))
      .select(col("p_partkey"),
        when(col("has_sw") === 1, "Buck Converter")
          .when(col("has_eff") === 1, "DC-DC Converter")
          .when(col("iq").isNotNull && col("iq") < 100, "LDO")
          .otherwise("Unknown").as("category"))
      .orderBy(col("p_partkey"))
  }

  val etlInferCategorySql: String =
    """WITH params AS (
      |  SELECT p_partkey, 'switching_frequency_typ' AS param,
      |    CAST(p_size * 10 AS DOUBLE) AS value FROM part WHERE p_size > 40
      |  UNION ALL
      |  SELECT p_partkey, 'efficiency_typ', CAST(0.9 AS DOUBLE) FROM part WHERE p_retailprice > 970
      |  UNION ALL
      |  SELECT p_partkey, 'quiescent_current_typ', CAST(p_size * 3 AS DOUBLE)
      |  FROM part WHERE p_brand LIKE 'Brand#1%'),
      |g AS (
      |  SELECT p_partkey,
      |    MAX(CASE WHEN param = 'switching_frequency_typ' THEN 1 ELSE 0 END) AS has_sw,
      |    MAX(CASE WHEN param = 'efficiency_typ' THEN 1 ELSE 0 END) AS has_eff,
      |    MAX(CASE WHEN param = 'quiescent_current_typ' THEN value END) AS iq
      |  FROM params GROUP BY p_partkey)
      |SELECT p_partkey,
      |  CASE WHEN has_sw = 1 THEN 'Buck Converter'
      |       WHEN has_eff = 1 THEN 'DC-DC Converter'
      |       WHEN iq IS NOT NULL AND iq < 100 THEN 'LDO'
      |       ELSE 'Unknown' END AS category
      |FROM g ORDER BY p_partkey""".stripMargin

  // --- etl_category_header -------------------------------------------
  /** _is_category_header: pattern list first, then the mostly-alphabetic
    * fallback (alpha ratio > 0.8).
    */
  def isCategoryHeader(text: Column): Column = {
    val t = trim(text)
    val l = lower(t)
    val patterns = Seq(
      "^(input|output|power|thermal|timing|electrical)",
      "characteristics$",
      "^(absolute|recommended|operating)",
      "conditions$",
      "^(dc|ac)\\s")
    val patternHit = patterns.map(l.rlike(_)).reduce(_ || _)
    val alphaRatio =
      length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") / length(t)
    when(length(t) === 0, false).otherwise(patternHit || alphaRatio > 0.8)
  }

  private val seedPhrases = Seq(
    "Electrical Characteristics", "DC Characteristics",
    "Absolute Maximum Ratings", "Recommended Operating Conditions",
    "Input Voltage Range", "Thermal Information", "AC Timing",
    "3.3 V typ", "100 mA max", "x7R 0402", "")

  val etlCategoryHeader: Q = (s, d) => {
    import s.implicits._
    val phrases = Tables.documents(s, d)
      .select(concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("phrase"))
      .union(seedPhrases.toDF("phrase"))
      .distinct()
    phrases
      .select(col("phrase"), isCategoryHeader(col("phrase")).as("is_header"))
      .orderBy(col("phrase"))
  }

  val etlCategoryHeaderSql: String = {
    val values = seedPhrases.map(p => s"('$p')").mkString(", ")
    s"""WITH phrases AS (
      |  SELECT DISTINCT array_to_string(string_split(text, ' ')[1:3], ' ') AS phrase FROM documents
      |  UNION SELECT * FROM (VALUES $values) v(phrase))
      |SELECT phrase,
      |  CASE WHEN length(trim(phrase)) = 0 THEN false
      |       ELSE (regexp_matches(lower(trim(phrase)), '^(input|output|power|thermal|timing|electrical)')
      |          OR regexp_matches(lower(trim(phrase)), 'characteristics$$')
      |          OR regexp_matches(lower(trim(phrase)), '^(absolute|recommended|operating)')
      |          OR regexp_matches(lower(trim(phrase)), 'conditions$$')
      |          OR regexp_matches(lower(trim(phrase)), '^(dc|ac)\\s')
      |          OR CAST(length(regexp_replace(trim(phrase), '[^A-Za-z]', '', 'g')) AS DOUBLE)
      |             / length(trim(phrase)) > 0.8) END AS is_header
      |FROM phrases ORDER BY phrase""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "etl_infer_category" -> etlInferCategory,
    "etl_category_header" -> etlCategoryHeader)
  val oracles: Map[String, String] = Map(
    "etl_infer_category" -> etlInferCategorySql,
    "etl_category_header" -> etlCategoryHeaderSql)
}
