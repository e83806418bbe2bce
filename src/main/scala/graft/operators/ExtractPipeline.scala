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
    val reqs = Tables.documents(s, d)
      .select(col("doc_id").as("id"),
        concat(lit("Extract part fields from: "), substring(col("text"), 1, 256)).as("prompt"))
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
    * (null when not queued). Rows-only correctness (the primary run
    * rides the stubbed inference kernel); behavior asserted in
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

  val queries: Map[String, Q] = Map("pipe_extract_e2e" -> pipeExtractE2E)
  val oracles: Map[String, String] = Map.empty
}
