package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2B — the reference pipeline's data-processing semantics,
  * re-expressed as distributed Spark operators.
  *
  * The reference runs these per-document on one node; here each is a
  * declarative plan over arbitrarily many rows:
  *
  *  - value parsing / unit normalization  (double_verifier.py:104,168)
  *  - merged-cell fill-down               (merge_detector.py:303,371)
  *  - double verification with tolerance  (double_verifier.py:79,412)
  *  - conflict severity                   (double_verifier.py:511)
  *  - confidence scoring                  (double_verifier.py:601)
  *  - review queue                        (review_adapter.py:81)
  *  - batch stats                         (batch_export.py:34)
  *  - header detection                    (extractor_v03.py:244)
  *  - cell cleaning                       (extractor_v03.py:288)
  *
  * All scalar logic is native Catalyst functions (codegen'd) — no
  * UDFs; confidence penalties are summed in DECIMAL so the oracle
  * hash matches regardless of aggregation order.
  */
object EtlOps {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))
  private val one = lit(1).cast(DecimalType(3, 2))

  // --- etl_parse_values: "123.45 mv" → (123.45, "mV") ---------------
  // Mirrors NumericComparator._extract_number (strip non-numeric
  // chars, parse float) and UnitComparator.normalize (alias → canon).
  private val unitAliases = Seq("mv", "millivolt", "V", "volt", "ua", "uA", "ohm", "khz")

  /** alias → canonical unit, as a lower-case when-chain (codegen'd). */
  private def normalizeUnit(u: Column): Column = {
    val l = lower(trim(u))
    when(l.isin("mv", "millivolt"), "mV")
      .when(l.isin("v", "volt", "volts"), "V")
      .when(l.isin("ua", "microamp", "micro-amp"), "µA")
      .when(l.isin("ma", "milliamp", "milli-amp"), "mA")
      .when(l.isin("ohm", "ohms", "r"), "Ω")
      .when(l.isin("khz", "kilohertz"), "kHz")
      .when(l.isin("mhz", "megahertz"), "MHz")
      .otherwise(trim(u))
  }

  /** Extract the numeric part of a cell: keep digits . - + e E. */
  private def extractNumber(c: Column): Column =
    regexp_replace(trim(c), "[^0-9.eE+-]", "").cast("double")

  val etlParseValues: Q = (s, d) => {
    val p = Tables.part(s, d)
    val unit = element_at(
      array(unitAliases.map(lit): _*), (pmod(col("p_partkey"), lit(8)) + 1).cast("int"))
    p.select(col("p_partkey"),
        concat(col("p_retailprice").cast("string"), lit(" "), unit).as("cell"))
      .select(col("p_partkey"),
        extractNumber(col("cell")).as("parsed_value"),
        normalizeUnit(regexp_replace(col("cell"), "[0-9.eE+-]", "")).as("unit_norm"))
      .orderBy(col("p_partkey"))
  }

  val etlParseValuesSql: String =
    """WITH cells AS (
      |  SELECT p_partkey,
      |    CAST(p_retailprice AS VARCHAR) || ' ' ||
      |      (['mv','millivolt','V','volt','ua','uA','ohm','khz'])[(p_partkey % 8) + 1] AS cell
      |  FROM part)
      |SELECT p_partkey,
      |  CAST(regexp_replace(trim(cell), '[^0-9.eE+-]', '', 'g') AS DOUBLE) AS parsed_value,
      |  CASE lower(trim(regexp_replace(cell, '[0-9.eE+-]', '', 'g')))
      |    WHEN 'mv' THEN 'mV' WHEN 'millivolt' THEN 'mV'
      |    WHEN 'v' THEN 'V' WHEN 'volt' THEN 'V' WHEN 'volts' THEN 'V'
      |    WHEN 'ua' THEN 'µA' WHEN 'ma' THEN 'mA'
      |    WHEN 'ohm' THEN 'Ω' WHEN 'ohms' THEN 'Ω' WHEN 'r' THEN 'Ω'
      |    WHEN 'khz' THEN 'kHz' WHEN 'mhz' THEN 'MHz'
      |    ELSE trim(regexp_replace(cell, '[0-9.eE+-]', '', 'g')) END AS unit_norm
      |FROM cells ORDER BY p_partkey""".stripMargin

  // --- etl_fill_down: merged-cell category propagation --------------
  // merge_detector.resolve_merges fills a value down until the next
  // non-empty cell; here: last non-null over an ordered partition.
  val etlFillDown: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("value_gapped",
        when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      .withColumn("value_filled", last(col("value_gapped"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("ts"), col("value_gapped"), col("value_filled"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val etlFillDownSql: String =
    """SELECT event_id, user_id, ts,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_gapped,
      |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
      |FROM events ORDER BY user_id, ts, event_id""".stripMargin

  // --- etl_double_verify: two runs, tolerance compare, severity -----
  // Primary "extraction" = orders.o_totalprice; secondary = the charge
  // recomputed from lineitem. NumericComparator: match iff
  // |a-b|/max(|a|,|b|) <= 0.01; severity thresholds per
  // _assess_severity (>10% high, >5% medium, else low).
  // two zero extractions are EQUAL (rel_diff 0), not a 0/0 ANSI error —
  // the zero-amount order is a real row shape (cancelled orders)
  private def relDiff(a: Column, b: Column): Column = {
    val mx = greatest(abs(a), abs(b))
    when(mx === 0.0, lit(0.0)).otherwise(abs(a - b) / mx)
  }

  /** The double-verify comparison with caller-chosen extra order
    * columns carried through the ONE orders⋈charge join — so consumers
    * keyed by another orders column (etl_confidence on o_custkey)
    * don't pay a second orders scan + join to re-attach it
    * (guide §2.4). Same join, same per-row expressions.
    */
  private def doubleVerifyWith(s: SparkSession, d: String,
      extra: Seq[String]): DataFrame = {
    val charge = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(d2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(4, 2)))
        * (one + col("l_tax").cast(DecimalType(4, 2)))).cast("double").as("secondary_value"))
    val rd = relDiff(col("primary_value"), col("secondary_value"))
    Tables.orders(s, d)
      .select(col("o_orderkey") +: col("o_totalprice").as("primary_value") +:
        extra.map(col): _*)
      .join(charge, col("o_orderkey") === col("l_orderkey"))
      .select(Seq(col("o_orderkey"), col("primary_value"), col("secondary_value"),
        rd.as("rel_diff"),
        when(rd <= 0.01, "verified").otherwise("conflict").as("status"),
        when(rd > 0.1, "high").when(rd > 0.05, "medium").otherwise("low").as("severity"))
        ++ extra.map(col): _*)
  }

  val etlDoubleVerify: Q = (s, d) =>
    doubleVerifyWith(s, d, Nil).orderBy(col("o_orderkey"))

  private val doubleVerifySqlBody =
    """SELECT o_orderkey, primary_value, secondary_value, rel_diff,
      |  CASE WHEN rel_diff <= 0.01 THEN 'verified' ELSE 'conflict' END AS status,
      |  CASE WHEN rel_diff > 0.1 THEN 'high'
      |       WHEN rel_diff > 0.05 THEN 'medium'
      |       ELSE 'low' END AS severity
      |FROM (
      |  SELECT o_orderkey, o_totalprice AS primary_value, secondary_value,
      |    CASE WHEN greatest(abs(o_totalprice), abs(secondary_value)) = 0 THEN 0.0
      |         ELSE abs(o_totalprice - secondary_value)
      |              / greatest(abs(o_totalprice), abs(secondary_value)) END AS rel_diff
      |  FROM orders JOIN (
      |    SELECT l_orderkey,
      |      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |           * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS STRING) AS DOUBLE) AS secondary_value
      |    FROM lineitem GROUP BY l_orderkey) li ON o_orderkey = l_orderkey) rd""".stripMargin

  val etlDoubleVerifySql: String = doubleVerifySqlBody + "\nORDER BY o_orderkey"

  // --- etl_confidence: per-customer confidence score ----------------
  // _calculate_confidence: 1.0 minus per-conflict severity penalty
  // (low .02 / medium .05 / high .10), halved when resolved; clamped
  // to [0,1]. Penalties summed in DECIMAL for engine parity.
  val etlConfidence: Q = (s, d) => {
    // o_custkey rides the doubleVerify join itself instead of a second
    // orders scan + join to re-attach it (the verified frame is keyed
    // o_orderkey, unique in orders — same rows either way)
    val verified = doubleVerifyWith(s, d, Seq("o_custkey"))
    val penalty = when(col("status") === "conflict",
        when(col("severity") === "high", lit(BigDecimal("0.050")))
          .when(col("severity") === "medium", lit(BigDecimal("0.025")))
          .otherwise(lit(BigDecimal("0.010"))))
      .otherwise(lit(BigDecimal("0.000"))).cast(DecimalType(6, 3))
    verified
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_checks"),
        sum(when(col("status") === "conflict", 1L).otherwise(0L)).as("n_conflicts"),
        greatest(lit(0.0), least(lit(1.0),
          (one - sum(penalty)).cast("double"))).as("confidence"))
      .orderBy(col("o_custkey"))
  }

  val etlConfidenceSql: String =
    s"""WITH v AS ($doubleVerifySqlBody)
      |SELECT o_custkey,
      |  COUNT(*) AS n_checks,
      |  CAST(SUM(CASE WHEN status = 'conflict' THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts,
      |  greatest(0.0, least(1.0, CAST(CAST(1 AS DECIMAL(3,2)) - SUM(CAST(
      |    CASE WHEN status = 'conflict' THEN
      |      CASE severity WHEN 'high' THEN 0.050 WHEN 'medium' THEN 0.025 ELSE 0.010 END
      |    ELSE 0.000 END AS DECIMAL(6,3))) AS DOUBLE))) AS confidence
      |FROM orders o JOIN v USING (o_orderkey)
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // --- etl_review_queue: conflicts ranked worst-first ---------------
  // review_adapter: needs_review when confidence below threshold;
  // queue ordered by how bad the disagreement is.
  val etlReviewQueue: Q = (s, d) => {
    // Scalable global rank (range-partition + two-phase row_number) —
    // the queue is big precisely when a batch goes bad, so no
    // single-partition Window here.
    val conflicts = etlDoubleVerify(s, d).filter(col("status") === "conflict")
    Rank.globalRowNumber(conflicts, Seq(col("rel_diff").desc, col("o_orderkey")), "priority")
      .select(col("priority"), col("o_orderkey"), col("rel_diff"), col("severity"))
      .orderBy(col("priority"))
  }

  val etlReviewQueueSql: String =
    s"""WITH v AS ($doubleVerifySqlBody)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rel_diff DESC, o_orderkey) AS BIGINT) AS priority,
      |  o_orderkey, rel_diff, severity
      |FROM v WHERE status = 'conflict' ORDER BY priority""".stripMargin

  // --- etl_batch_stats: BatchResult rollup per source ---------------
  val etlBatchStats: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("skipped"),
        sum(when(col("lang") === "en" && col("n_chars") >= 200, 1L).otherwise(0L)).as("success"),
        sum(when(col("lang") === "en" && col("n_chars") < 200, 1L).otherwise(0L)).as("failed"))
      .withColumn("success_rate", col("success").cast("double") / col("total"))
      .orderBy(col("source"))

  val etlBatchStatsSql: String =
    """SELECT source, COUNT(*) AS total,
      |  CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS skipped,
      |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS success,
      |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS failed,
      |  CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS success_rate
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // --- etl_batch_report: generate_batch_report breakdown ------------
  // batch_export.py:363: the batch report renders a success-rate
  // summary plus the failure list. Re-expressed as one long-form
  // report frame: per-success-rate-bucket rollup over sources
  // (quintile buckets via integer algebra — (success·5) div total,
  // clamped to 4 — so both engines agree bit-for-bit) stacked with
  // the top-5 failing sources. One groupBy over documents feeds both
  // sections; the markdown rendering layer is presentation and stays
  // out of the engine.
  val etlBatchReport: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("skipped"),
        sum(when(col("lang") === "en" && col("n_chars") >= 200, 1L).otherwise(0L)).as("success"),
        sum(when(col("lang") === "en" && col("n_chars") < 200, 1L).otherwise(0L)).as("failed"))
    val buckets = base
      .withColumn("bucket", least(expr("(success * 5) div total"), lit(4L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sources"), sum(col("total")).as("n_docs"),
        sum(col("success")).as("success"), sum(col("failed")).as("failed"),
        sum(col("skipped")).as("skipped"))
      .select(lit("rate_bucket").as("section"),
        concat(lit("b"), col("bucket")).as("row_key"),
        col("n_sources"), col("n_docs"), col("success"), col("failed"), col("skipped"))
    val topFail = base
      .orderBy(col("failed").desc, col("source")).limit(5)
      .select(lit("top_failure").as("section"), col("source").as("row_key"),
        lit(1L).as("n_sources"), col("total").as("n_docs"),
        col("success"), col("failed"), col("skipped"))
    buckets.unionByName(topFail).orderBy(col("section"), col("row_key"))
  }

  val etlBatchReportSql: String =
    """WITH b AS (
      |  SELECT source, COUNT(*) AS total,
      |    CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS skipped,
      |    CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS success,
      |    CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS failed
      |  FROM documents GROUP BY source),
      |bk AS (SELECT least((success * 5) // total, 4) AS bucket, * FROM b),
      |rb AS (SELECT 'rate_bucket' AS section,
      |    'b' || CAST(bucket AS VARCHAR) AS row_key,
      |    COUNT(*) AS n_sources, CAST(SUM(total) AS BIGINT) AS n_docs,
      |    CAST(SUM(success) AS BIGINT) AS success,
      |    CAST(SUM(failed) AS BIGINT) AS failed,
      |    CAST(SUM(skipped) AS BIGINT) AS skipped
      |  FROM bk GROUP BY bucket),
      |tf AS (SELECT 'top_failure' AS section, source AS row_key,
      |    CAST(1 AS BIGINT) AS n_sources, total AS n_docs,
      |    success, failed, skipped
      |  FROM b ORDER BY failed DESC, source LIMIT 5)
      |SELECT * FROM rb UNION ALL SELECT * FROM tf
      |ORDER BY section, row_key""".stripMargin

  // --- etl_header_detect: _detect_headers classification ------------
  private val headerTerms = Seq(
    "Parameter", "param.", "Symbol", "Test Condition", "conditions",
    "min.", "Min", "Typical", "typ", "MAX", "Max.", "units", "Unit",
    "description", "Desc")

  private def classifyHeader(c: Column): Column = {
    val l = lower(trim(c))
    when(l.rlike("param"), "Parameter")
      .when(l.rlike("symbol"), "Symbol")
      .when(l.rlike("test.*cond|condition"), "Test_Conditions")
      .when(l.rlike("^min"), "Min")
      .when(l.rlike("^typ"), "Typ")
      .when(l.rlike("^max"), "Max")
      .when(l.rlike("unit"), "Unit")
      .when(l.rlike("desc"), "Description")
      .otherwise(trim(c))
  }

  val etlHeaderDetect: Q = (s, d) => {
    import s.implicits._
    val docTokens = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .distinct()
    val headerish = headerTerms.toDF("token")
    docTokens.union(headerish)
      .distinct()
      .select(col("token"), classifyHeader(col("token")).as("header_class"))
      .orderBy(col("token"))
  }

  val etlHeaderDetectSql: String = {
    val values = headerTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH toks AS (
      |  SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents
      |  UNION SELECT * FROM (VALUES $values) h(token))
      |SELECT token,
      |  CASE WHEN regexp_matches(lower(trim(token)), 'param') THEN 'Parameter'
      |       WHEN regexp_matches(lower(trim(token)), 'symbol') THEN 'Symbol'
      |       WHEN regexp_matches(lower(trim(token)), 'test.*cond|condition') THEN 'Test_Conditions'
      |       WHEN regexp_matches(lower(trim(token)), '^min') THEN 'Min'
      |       WHEN regexp_matches(lower(trim(token)), '^typ') THEN 'Typ'
      |       WHEN regexp_matches(lower(trim(token)), '^max') THEN 'Max'
      |       WHEN regexp_matches(lower(trim(token)), 'unit') THEN 'Unit'
      |       WHEN regexp_matches(lower(trim(token)), 'desc') THEN 'Description'
      |       ELSE trim(token) END AS header_class
      |FROM toks ORDER BY token""".stripMargin
  }

  // --- etl_clean_cells: whitespace collapse roundtrip ---------------
  // _clean_cell = " ".join(s.split()); applied to a messied copy it
  // must reproduce the original.
  val etlCleanCells: Q = (s, d) => {
    val messy = concat(lit("  "), regexp_replace(col("text"), " ", "   "), lit(" \t"))
    val cleaned = trim(regexp_replace(messy, "\\s+", " "))
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(cleaned).cast("long").as("clean_len"),
        (cleaned === col("text")).as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  val etlCleanCellsSql: String =
    """SELECT doc_id,
      |  length(trim(regexp_replace('  ' || regexp_replace(text, ' ', '   ', 'g') || ' ' || chr(9), '\s+', ' ', 'g'))) AS clean_len,
      |  trim(regexp_replace('  ' || regexp_replace(text, ' ', '   ', 'g') || ' ' || chr(9), '\s+', ' ', 'g')) = text AS roundtrip_ok
      |FROM documents ORDER BY doc_id""".stripMargin

  // --- etl_merge_fragments: cross-page table fragment merging --------
  // merge_detector/enhance_table_extraction: a table spanning pages
  // appears as consecutive fragments with the same header row; merge
  // runs of equal header signatures into one logical table. Model:
  // documents ordered within source are "pages"; header signature =
  // first two tokens. Same lag + cumulative-sum pattern as
  // sessionization, keyed on signature change — one window shuffle.
  val etlMergeFragments: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val sig = concat_ws(" ", slice(split(col("text"), " "), 1, 2))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .withColumn("header_sig", sig)
      .withColumn("new_table",
        when(lag(col("header_sig"), 1).over(w).isNull ||
          lag(col("header_sig"), 1).over(w) =!= col("header_sig"), 1L).otherwise(0L))
      .withColumn("table_seq", sum(col("new_table")).over(cum))
      .groupBy(col("source"), col("table_seq"))
      .agg(count(lit(1)).as("n_fragments"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
        min(col("header_sig")).as("header_sig"))
      .orderBy(col("source"), col("table_seq"))
  }

  val etlMergeFragmentsSql: String =
    """WITH sig AS (
      |  SELECT source, doc_id,
      |    array_to_string(string_split(coalesce(text, ''), ' ')[1:2], ' ') AS header_sig
      |  FROM documents),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(header_sig) OVER w IS NULL
      |                 OR lag(header_sig) OVER w <> header_sig THEN 1 ELSE 0 END AS new_table
      |  FROM sig WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
      |seqd AS (
      |  SELECT *, SUM(new_table) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS table_seq
      |  FROM flagged)
      |SELECT source, CAST(table_seq AS BIGINT) AS table_seq, COUNT(*) AS n_fragments,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc, min(header_sig) AS header_sig
      |FROM seqd GROUP BY source, table_seq ORDER BY source, table_seq""".stripMargin

  // --- etl_field_verify: the faithful field-level verifier -----------
  // Two synthetic extraction runs built from part: the "rule" run
  // perturbs every 5th value by ~3% and rewrites units to an alias.
  // FieldVerify reproduces the reference's comparator chain exactly
  // (RefVectorsSpec runs the reference's own test vectors against it).
  // Oracle-gated since r4: the DuckDB SQL re-derives the comparator
  // chain (numeric ±1% → unit-alias → normalized text), the severity
  // tiers, penalty sums and status on the same part-derived input, so
  // the summary is rows+schema+hash checked — p_retailprice ∈
  // [900, 999.9] keeps every branch deterministic (no zero values, the
  // 3% perturbation sits strictly between the 1% tolerance and the 5%
  // severity tier).
  val etlFieldVerify: Q = (s, d) => {
    // Both comparator sides derive row-for-row from the SAME part row
    // (the "rule" side is a deterministic perturbation of the "vision"
    // side), so the (doc, param, field) self-join that re-associated
    // them is removable: build the pair in ONE scan and explode the
    // two fields with both values side by side (guide §2.4). Same
    // (vision_value, rule_value) pairs — the comparator and summary
    // are byte-identical.
    val p = Tables.part(s, d)
    val vValue = col("p_retailprice").cast("string")
    val rValue = when(pmod(col("p_partkey"), lit(5)) === 0,
        (col("p_retailprice") * 1.03).cast("string"))
      .otherwise(col("p_retailprice").cast("string"))
    val paired = p.select(col("p_partkey").as("doc"), col("p_brand").as("param"),
        explode(map(
          lit("Value"), struct(vValue.as("v"), rValue.as("r")),
          lit("Unit"), struct(lit("mV").as("v"), lit("millivolt").as("r"))))
          .as(Seq("field", "vr")))
      .select(col("doc"), col("param"), col("field"),
        col("vr.v").as("vision_value"), col("vr.r").as("rule_value"))
    FieldVerify.verifySummary(
        FieldVerify.conflictsFromPaired(paired, Seq("doc")),
        Seq("doc"))
      .orderBy(col("doc"))
  }

  val etlFieldVerifySql: String =
    """WITH f AS (
      |  SELECT p_partkey AS doc, lower(p_brand) AS paraml, 'value' AS fieldl,
      |    CAST(p_retailprice AS VARCHAR) AS vv,
      |    CASE WHEN p_partkey % 5 = 0 THEN CAST(p_retailprice * CAST(1.03 AS DOUBLE) AS VARCHAR)
      |         ELSE CAST(p_retailprice AS VARCHAR) END AS rv
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey, lower(p_brand), 'unit', 'mV', 'millivolt' FROM part),
      |c AS (
      |  SELECT doc, vv, rv,
      |    regexp_matches(fieldl || '|' || paraml,
      |      'vin|vout|iout|iq|efficiency|power|frequency') AS crit,
      |    TRY_CAST(NULLIF(regexp_replace(trim(vv), '[^0-9.eE+-]', '', 'g'), '') AS DOUBLE) AS n1,
      |    TRY_CAST(NULLIF(regexp_replace(trim(rv), '[^0-9.eE+-]', '', 'g'), '') AS DOUBLE) AS n2,
      |    CASE WHEN lower(trim(vv)) IN ('mv', 'millivolt')
      |              AND lower(trim(rv)) IN ('mv', 'millivolt') THEN TRUE
      |         ELSE trim(vv) = trim(rv) END AS unit_eq,
      |    regexp_replace(regexp_replace(lower(trim(vv)), '\s+', ' ', 'g'), '[.,;:!?]', '', 'g') =
      |    regexp_replace(regexp_replace(lower(trim(rv)), '\s+', ' ', 'g'), '[.,;:!?]', '', 'g') AS text_eq
      |  FROM f),
      |m AS (
      |  SELECT doc, crit,
      |    CASE WHEN COALESCE(vv, '') = '' AND COALESCE(rv, '') = '' THEN TRUE
      |         WHEN COALESCE(vv, '') = '' OR COALESCE(rv, '') = '' THEN FALSE
      |         WHEN n1 IS NOT NULL AND n2 IS NOT NULL
      |              AND ((n1 = 0 AND n2 = 0)
      |                   OR abs(n1 - n2) / greatest(abs(n1), abs(n2)) <= 0.01) THEN TRUE
      |         WHEN COALESCE(unit_eq, FALSE) OR COALESCE(text_eq, FALSE) THEN TRUE
      |         ELSE FALSE END AS is_match,
      |    CASE WHEN n1 IS NULL OR n2 IS NULL OR greatest(abs(n1), abs(n2)) = 0 THEN NULL
      |         ELSE abs(n1 - n2) / greatest(abs(n1), abs(n2)) END AS rel_diff
      |  FROM c),
      |p AS (
      |  SELECT doc, is_match, crit, rel_diff,
      |    CASE WHEN is_match THEN CAST(0.000 AS DECIMAL(6,3))
      |         WHEN crit THEN CAST(0.100 AS DECIMAL(6,3))
      |         WHEN rel_diff IS NOT NULL AND rel_diff > 0.1 THEN CAST(0.050 AS DECIMAL(6,3))
      |         WHEN rel_diff IS NOT NULL AND rel_diff > 0.05 THEN CAST(0.025 AS DECIMAL(6,3))
      |         ELSE CAST(0.010 AS DECIMAL(6,3)) END AS pen
      |  FROM m)
      |SELECT doc, COUNT(*) AS n_fields,
      |  CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts,
      |  greatest(0.0, least(1.0, CAST(CAST(1.00 AS DECIMAL(3,2)) - SUM(pen) AS DOUBLE))) AS confidence,
      |  CASE WHEN max(CASE WHEN NOT is_match AND crit AND rel_diff > 0.1
      |                     THEN 1 ELSE 0 END) = 1 THEN 'needs_review'
      |       WHEN greatest(0.0, least(1.0, CAST(CAST(1.00 AS DECIMAL(3,2)) - SUM(pen) AS DOUBLE))) < 0.60
      |            THEN 'conflict'
      |       ELSE 'verified' END AS status
      |FROM p GROUP BY doc ORDER BY doc""".stripMargin

  // --- etl_param_pivot: review_adapter parameter grouping ------------
  // review_adapter.py:101 _group_parameters: flat keys foo_min /
  // foo_typ / foo_max / foo_unit regroup into per-parameter entries,
  // with the unit copied onto each min/typ/max entry. One left join on
  // (doc, unit-key); flat params built deterministically from part.
  val etlParamPivot: Q = (s, d) => {
    val flat = Tables.part(s, d).select(col("p_partkey").as("doc"),
        explode(map(
          lit("vin_min"), col("p_size").cast("string"),
          lit("vin_typ"), (col("p_size") + 2).cast("string"),
          lit("vin_max"), (col("p_size") * 2).cast("string"),
          lit("vin_unit"), lit("V"),
          lit("iout_max"), col("p_retailprice").cast("string")
        )).as(Seq("key", "value")))
    val valueRows = flat
      .filter(col("key").endsWith("_min") || col("key").endsWith("_typ") ||
        col("key").endsWith("_max"))
      .select(col("doc"), col("key").as("param"),
        concat(expr("substring(key, 1, length(key) - 4)"), lit("_unit")).as("unit_key"),
        col("value"))
    val unitRows = flat.filter(col("key").endsWith("_unit"))
      .select(col("doc"), col("key").as("unit_key"), col("value").as("unit"))
    val grouped = valueRows
      .join(unitRows, Seq("doc", "unit_key"), "left")
      .select(col("doc"), col("param"), col("value"), col("unit"))
    val bare = unitRows.select(col("doc"),
      expr("substring(unit_key, 1, length(unit_key) - 5)").as("param"),
      lit(null).cast("string").as("value"), col("unit"))
    grouped.unionByName(bare).orderBy(col("doc"), col("param"))
  }

  val etlParamPivotSql: String =
    """WITH flat AS (
      |  SELECT p_partkey AS doc, kv.key, kv.value FROM part,
      |  UNNEST(map_entries(MAP {
      |    'vin_min': CAST(p_size AS VARCHAR),
      |    'vin_typ': CAST(p_size + 2 AS VARCHAR),
      |    'vin_max': CAST(p_size * 2 AS VARCHAR),
      |    'vin_unit': 'V',
      |    'iout_max': CAST(p_retailprice AS VARCHAR)})) AS t(kv)),
      |vals AS (
      |  SELECT doc, key AS param,
      |    substring(key, 1, length(key) - 4) || '_unit' AS unit_key, value
      |  FROM flat WHERE key LIKE '%\_min' ESCAPE '\' OR key LIKE '%\_typ' ESCAPE '\' OR key LIKE '%\_max' ESCAPE '\'),
      |units AS (
      |  SELECT doc, key AS unit_key, value AS unit FROM flat WHERE key LIKE '%\_unit' ESCAPE '\')
      |SELECT doc, param, value, unit FROM (
      |  SELECT v.doc, v.param, v.value, u.unit
      |  FROM vals v LEFT JOIN units u ON v.doc = u.doc AND v.unit_key = u.unit_key
      |  UNION ALL
      |  SELECT doc, substring(unit_key, 1, length(unit_key) - 5) AS param, NULL AS value, unit
      |  FROM units) z
      |ORDER BY doc, param""".stripMargin

  // --- etl_export_import: the Import-Script export shape -------------
  // batch_export.py:254 export_for_import_script: the flattened
  // per-device CSV row the reference's downstream database import
  // consumes — MPN (filename stem, suffix-stripped, uppercased, :324),
  // manufacturer, category inferred from which params are present
  // (:339 _infer_category: switching freq → Buck Converter, efficiency
  // → DC-DC Converter, Iq < 100 → LDO, else Unknown), the per-param
  // min/max/typ columns pulled from the grouped parameter rows
  // (etl_param_pivot's output — this query composes it), fixed
  // Status/empty columns, and the confidence note tied to the
  // verification stage (99% for the docs etl_field_verify flags, 100%
  // otherwise). One wide conditional-aggregation pivot + one broadcast
  // join with part — no extra corpus shuffle beyond the pivot's own.
  val etlExportImport: Q = (s, d) => {
    val wide = etlParamPivot(s, d)
      .filter(col("value").isNotNull)
      .groupBy(col("doc"))
      .agg(
        max(when(col("param") === "vin_min", col("value"))).as("vin_min"),
        max(when(col("param") === "vin_max", col("value"))).as("vin_max"),
        max(when(col("param") === "iout_max", col("value"))).as("iout_max"))
    // synthetic extraction metadata: which optional params a given doc
    // carries (cycles through the category-inference branches)
    val freq = when(col("doc") % 4 === 0, (lit(400) + col("doc") % 100).cast("string"))
    val eff = when(col("doc") % 4 === 1, (lit(80) + col("doc") % 15).cast("string"))
    val iq = when(col("doc") % 4 === 2, (col("doc") % 150).cast("string"))
    val conf = when(col("doc") % 5 === 0, lit(99L)).otherwise(lit(100L))
    // manufacturer source column: this testdata's part table carries the
    // brand (no p_mfgr column), which plays the manufacturer role here
    val p = Tables.part(s, d).select(col("p_partkey").as("doc"), col("p_brand"))
    wide.join(p, "doc")
      .withColumn("__freq", freq).withColumn("__eff", eff).withColumn("__iq", iq)
      .select(
        upper(regexp_replace(concat(lit("p"), col("doc"), lit("_datasheet")),
          "_datasheet$", "")).as("MPN"),
        col("p_brand").as("Manufacturer"),
        when(col("__freq").isNotNull, "Buck Converter")
          .when(col("__eff").isNotNull, "DC-DC Converter")
          .when(col("__iq").isNotNull && col("__iq").cast("long") < 100, "LDO")
          .otherwise("Unknown").as("Category"),
        lit("").as("Description"),
        col("vin_min").as("Vin_min"),
        col("vin_max").as("Vin_max"),
        lit("").as("Vout_min"),
        lit("").as("Vout_max"),
        col("iout_max").as("Iout_max"),
        coalesce(col("__iq"), lit("")).as("Iq_typ"),
        coalesce(col("__eff"), lit("")).as("Efficiency_typ"),
        coalesce(col("__freq"), lit("")).as("Frequency_typ"),
        lit("").as("Package"),
        lit("Active").as("Status"),
        lit("").as("Datasheet_URL"),
        concat(lit("Extracted by Datasheet-ETL-Spark v0.4 (confidence: "),
          conf, lit("%)")).as("Notes"))
      .orderBy(col("MPN"))
  }

  val etlExportImportSql: String =
    """WITH wide AS (
      |  SELECT p_partkey AS doc,
      |    CAST(p_size AS VARCHAR) AS vin_min,
      |    CAST(p_size * 2 AS VARCHAR) AS vin_max,
      |    CAST(p_retailprice AS VARCHAR) AS iout_max,
      |    p_brand
      |  FROM part),
      |meta AS (
      |  SELECT *,
      |    CASE WHEN doc % 4 = 0 THEN CAST(400 + doc % 100 AS VARCHAR) END AS freq,
      |    CASE WHEN doc % 4 = 1 THEN CAST(80 + doc % 15 AS VARCHAR) END AS eff,
      |    CASE WHEN doc % 4 = 2 THEN CAST(doc % 150 AS VARCHAR) END AS iq,
      |    CASE WHEN doc % 5 = 0 THEN 99 ELSE 100 END AS conf
      |  FROM wide)
      |SELECT
      |  upper(regexp_replace('p' || doc || '_datasheet', '_datasheet$', '')) AS "MPN",
      |  p_brand AS "Manufacturer",
      |  CASE WHEN freq IS NOT NULL THEN 'Buck Converter'
      |       WHEN eff IS NOT NULL THEN 'DC-DC Converter'
      |       WHEN iq IS NOT NULL AND CAST(iq AS BIGINT) < 100 THEN 'LDO'
      |       ELSE 'Unknown' END AS "Category",
      |  '' AS "Description",
      |  vin_min AS "Vin_min",
      |  vin_max AS "Vin_max",
      |  '' AS "Vout_min",
      |  '' AS "Vout_max",
      |  iout_max AS "Iout_max",
      |  coalesce(iq, '') AS "Iq_typ",
      |  coalesce(eff, '') AS "Efficiency_typ",
      |  coalesce(freq, '') AS "Frequency_typ",
      |  '' AS "Package",
      |  'Active' AS "Status",
      |  '' AS "Datasheet_URL",
      |  'Extracted by Datasheet-ETL-Spark v0.4 (confidence: ' || conf || '%)' AS "Notes"
      |FROM meta ORDER BY "MPN"""".stripMargin

  val queries: Map[String, Q] = Map(
    "etl_export_import" -> etlExportImport,
    "etl_param_pivot" -> etlParamPivot,
    "etl_field_verify" -> etlFieldVerify,
    "etl_merge_fragments" -> etlMergeFragments,
    "etl_parse_values" -> etlParseValues,
    "etl_fill_down" -> etlFillDown,
    "etl_double_verify" -> etlDoubleVerify,
    "etl_confidence" -> etlConfidence,
    "etl_review_queue" -> etlReviewQueue,
    "etl_batch_stats" -> etlBatchStats,
    "etl_batch_report" -> etlBatchReport,
    "etl_header_detect" -> etlHeaderDetect,
    "etl_clean_cells" -> etlCleanCells)

  val oracles: Map[String, String] = Map(
    "etl_export_import" -> etlExportImportSql,
    "etl_param_pivot" -> etlParamPivotSql,
    "etl_field_verify" -> etlFieldVerifySql,
    "etl_merge_fragments" -> etlMergeFragmentsSql,
    "etl_parse_values" -> etlParseValuesSql,
    "etl_fill_down" -> etlFillDownSql,
    "etl_double_verify" -> etlDoubleVerifySql,
    "etl_confidence" -> etlConfidenceSql,
    "etl_review_queue" -> etlReviewQueueSql,
    "etl_batch_stats" -> etlBatchStatsSql,
    "etl_batch_report" -> etlBatchReportSql,
    "etl_header_detect" -> etlHeaderDetectSql,
    "etl_clean_cells" -> etlCleanCellsSql)
}
