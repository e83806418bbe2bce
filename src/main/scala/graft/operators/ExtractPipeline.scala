package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end extract pipeline — the distributed re-expression of
  * DatasheetPipeline.process (pipeline.py:246): primary ("vision")
  * extraction through the batched inference stage, secondary ("rule")
  * extraction as a columnar derivation, field-level double
  * verification, per-document verification summary, and the review
  * queue for needs_review documents — all one lazy plan per stage,
  * one equi-join shuffle for the verify, range-partitioned rank for
  * the queue. The per-document loop of the reference becomes a
  * dataset-wide dataflow.
  */
object ExtractPipeline {
  type Q = (SparkSession, String) => DataFrame

  /** Primary run: documents → inference stage → validated struct →
    * long form (doc_id, param, field, value). The two field rows are
    * emitted by ONE explode over ONE projection — referencing the
    * inference frame twice (e.g. a self-union) would execute the model
    * kernel once per reference, double-counting cost and, with a real
    * nondeterministic model, splitting a document's fields across two
    * independent calls.
    */
  private def visionRun(s: SparkSession, d: String): DataFrame = {
    // wide(): the inference kernel + JSON validation is per-row work a
    // single-split local scan would serialize onto one core (the stub
    // is a pure function of doc id, so partitioning cannot change it)
    val reqs = Tables.wide(Tables.documents(s, d)
        .select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id").as("id"),
        concat(lit("Extract part fields from: "),
          coalesce(substring(col("text"), 1, 256), lit(""))).as("prompt"))
    val (replies, _) = Inference.inferenceStage(reqs)
    Inference.validated(replies, Inference.extractSchema, Seq("mpn", "voltage"))
      .filter(col("valid"))
      .select(col("id").as("doc_id"), lit("device").as("param"),
        explode(array(
          struct(lit("mpn").as("field"), col("parsed.mpn").as("value")),
          struct(lit("voltage_typ").as("field"),
            concat(col("parsed.voltage").cast("string"), lit(" V")).as("value")))).as("kv"))
      .select(col("doc_id"), col("param"), col("kv.field").as("field"), col("kv.value").as("value"))
  }

  /** Secondary run: the rule extractor's deterministic derivation.
    * Every 7th document reads a ~3% different voltage (the classic
    * vision/rule disagreement) and every 13th document disagrees on
    * the MPN — exercising numeric-tolerance and text conflicts.
    */
  private def ruleRun(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val baseV = (pmod(col("doc_id"), lit(50)) / 10.0)
    val v = when(pmod(col("doc_id"), lit(7)) === 0, baseV * 1.031).otherwise(baseV)
    docs.select(col("doc_id"), lit("device").as("param"),
        lit("mpn").as("field"),
        // the numeric comparator strips letters and allows 1% relative
        // tolerance, so a planted MPN conflict must differ in its
        // digits by a large factor to register (same as the reference)
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit("MPN-"), col("doc_id") * 2 + 1)).otherwise(concat(lit("MPN-"), col("doc_id")))
          .as("value"))
      .unionByName(docs.select(col("doc_id"), lit("device").as("param"),
        lit("voltage_typ").as("field"),
        concat(round(v, 4).cast("string"), lit(" V")).as("value")))
  }

  /** pipe_extract_e2e: summary per document with review-queue priority
    * (null when not queued). Oracle-gated since r4: the inference stub
    * is a deterministic function of doc_id (transient failures always
    * recover within the retry budget; only the id%31 truncated-JSON
    * rows drop at validation), so the DuckDB oracle re-derives the
    * full flow — stub outputs, rule derivation, comparator chain,
    * severity tiers, decimal penalty sums, status, and the
    * review-queue flag (empty for this input: no critical fields, min
    * confidence 0.94 ≥ 0.60) — independently in SQL. Cross-engine
    * FP verified: all 50 possible round(v,4) voltage values and their
    * string renderings agree bit-for-bit (HALF_UP vs HALF_EVEN never
    * ties on these doubles). Behavior also asserted in
    * ExtractPipelineSpec.
    */
  val pipeExtractE2E: Q = (s, d) => {
    val conflicts = FieldVerify.fieldConflicts(visionRun(s, d), ruleRun(s, d), Seq("doc_id"))
    // cached: the summary feeds both the output and the review queue,
    // and recomputing it would re-run the inference stage
    val summary = graft.Caches.cached(FieldVerify.verifySummary(conflicts, Seq("doc_id")))
    val queued = graft.Pipeline.reviewQueue(summary, Seq("doc_id"))
      .select(col("doc_id"), col("priority"))
    summary.join(queued, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_fields"), col("n_conflicts"),
        col("confidence"), col("status"), col("priority"))
      .orderBy(col("doc_id"))
  }

  val pipeExtractE2ESql: String =
    """WITH ids AS (SELECT doc_id FROM documents),
      |vision AS (
      |  SELECT doc_id, 'device' AS param, 'mpn' AS field,
      |    'MPN-' || doc_id AS value
      |  FROM ids WHERE doc_id % 31 <> 0
      |  UNION ALL
      |  SELECT doc_id, 'device', 'voltage_typ',
      |    CAST(CAST(doc_id % 50 AS DOUBLE) / 10.0 AS VARCHAR) || ' V'
      |  FROM ids WHERE doc_id % 31 <> 0),
      |rule AS (
      |  SELECT doc_id, 'device' AS param, 'mpn' AS field,
      |    CASE WHEN doc_id % 13 = 0 THEN 'MPN-' || (2 * doc_id + 1)
      |         ELSE 'MPN-' || doc_id END AS value
      |  FROM ids
      |  UNION ALL
      |  SELECT doc_id, 'device', 'voltage_typ',
      |    CAST(round(CASE WHEN doc_id % 7 = 0
      |            THEN (CAST(doc_id % 50 AS DOUBLE) / 10.0) * 1.031
      |            ELSE CAST(doc_id % 50 AS DOUBLE) / 10.0 END, 4) AS VARCHAR)
      |      || ' V'
      |  FROM ids),
      |c AS (
      |  SELECT v.doc_id,
      |    regexp_matches(lower(v.field) || '|' || lower(v.param),
      |      'vin|vout|iout|iq|efficiency|power|frequency') AS crit,
      |    TRY_CAST(NULLIF(regexp_replace(trim(v.value), '[^0-9.eE+-]', '', 'g'), '') AS DOUBLE) AS n1,
      |    TRY_CAST(NULLIF(regexp_replace(trim(r.value), '[^0-9.eE+-]', '', 'g'), '') AS DOUBLE) AS n2,
      |    trim(v.value) = trim(r.value) AS unit_eq,
      |    regexp_replace(regexp_replace(lower(trim(v.value)), '\s+', ' ', 'g'), '[.,;:!?]', '', 'g') =
      |    regexp_replace(regexp_replace(lower(trim(r.value)), '\s+', ' ', 'g'), '[.,;:!?]', '', 'g') AS text_eq
      |  FROM vision v JOIN rule r
      |    ON v.doc_id = r.doc_id AND v.param = r.param AND v.field = r.field),
      |m AS (
      |  SELECT doc_id, crit,
      |    CASE WHEN n1 IS NOT NULL AND n2 IS NOT NULL
      |              AND ((n1 = 0 AND n2 = 0)
      |                   OR abs(n1 - n2) / greatest(abs(n1), abs(n2)) <= 0.01) THEN TRUE
      |         WHEN unit_eq OR text_eq THEN TRUE ELSE FALSE END AS is_match,
      |    CASE WHEN n1 IS NULL OR n2 IS NULL OR greatest(abs(n1), abs(n2)) = 0 THEN NULL
      |         ELSE abs(n1 - n2) / greatest(abs(n1), abs(n2)) END AS rel_diff
      |  FROM c),
      |p AS (
      |  SELECT doc_id, is_match, crit, rel_diff,
      |    CASE WHEN is_match THEN CAST(0.000 AS DECIMAL(6,3))
      |         WHEN crit THEN CAST(0.100 AS DECIMAL(6,3))
      |         WHEN rel_diff IS NOT NULL AND rel_diff > 0.1 THEN CAST(0.050 AS DECIMAL(6,3))
      |         WHEN rel_diff IS NOT NULL AND rel_diff > 0.05 THEN CAST(0.025 AS DECIMAL(6,3))
      |         ELSE CAST(0.010 AS DECIMAL(6,3)) END AS pen
      |  FROM m),
      |summary AS (
      |  SELECT doc_id, COUNT(*) AS n_fields,
      |    CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts,
      |    greatest(0.0, least(1.0, CAST(CAST(1.00 AS DECIMAL(3,2)) - SUM(pen) AS DOUBLE))) AS confidence,
      |    CASE WHEN max(CASE WHEN NOT is_match AND crit AND rel_diff > 0.1
      |                       THEN 1 ELSE 0 END) = 1 THEN 'needs_review'
      |         WHEN greatest(0.0, least(1.0, CAST(CAST(1.00 AS DECIMAL(3,2)) - SUM(pen) AS DOUBLE))) < 0.60
      |              THEN 'conflict'
      |         ELSE 'verified' END AS status
      |  FROM p GROUP BY doc_id),
      |queued AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (ORDER BY confidence ASC, doc_id ASC) AS BIGINT) AS priority
      |  FROM summary
      |  WHERE confidence < 0.60 OR status = 'needs_review')
      |SELECT s.doc_id, s.n_fields, s.n_conflicts, s.confidence, s.status, q.priority
      |FROM summary s LEFT JOIN queued q ON s.doc_id = q.doc_id
      |ORDER BY s.doc_id""".stripMargin

  val queries: Map[String, Q] = Map("pipe_extract_e2e" -> pipeExtractE2E)
  val oracles: Map[String, String] = Map("pipe_extract_e2e" -> pipeExtractE2ESql)
}
