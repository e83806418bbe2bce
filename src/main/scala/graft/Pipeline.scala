package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.FieldVerify

/** User-facing pipeline API — the engine's analog of the reference's
  * config-driven orchestration (pipeline.py:40 PipelineConfig,
  * extractor_v03.py:353 DatasheetPipeline), re-expressed as
  * composable DataFrame stages: every knob is a column predicate or
  * operator parameter, the whole pipeline stays one lazy plan (no
  * per-stage materialization), and the driver never loops over rows.
  */
object Pipeline {

  /** Reference PipelineConfig's knobs that survive the re-expression:
    * comparison tolerance, review threshold, plus the corpus-clean
    * thresholds a training-data pipeline adds.
    */
  case class Config(
      numericTolerance: Double = 0.01,
      confidenceThreshold: Double = 0.60,
      minTokens: Int = 30,
      maxPunctRatio: Double = 0.3,
      keepLangs: Seq[String] = Seq("en"),
      exactDedup: Boolean = true)

  /** Corpus cleaning: quality filter → language filter → exact dedup
    * (keep min doc_id per normalized-text hash). Input needs
    * (doc_id, text, lang); returns the surviving documents.
    */
  def cleanCorpus(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val t = split(col("text"), " ")
    val nTokens = size(t)
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("double")
    val quality = docs
      .filter(nTokens >= cfg.minTokens)
      .filter(punct / length(col("text")) <= cfg.maxPunctRatio)
      .filter(col("lang").isin(cfg.keepLangs: _*))
    if (!cfg.exactDedup) quality
    else {
      val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(norm)).orderBy(col("doc_id"))
      quality.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** Double verification of two extraction runs in long form
    * (keys..., param, field, value): conflict details + per-key
    * summary with the config's tolerance and review threshold.
    */
  def verify(vision: DataFrame, rule: DataFrame, keys: Seq[String],
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val conflicts = FieldVerify.fieldConflicts(vision, rule, keys, cfg.numericTolerance)
    val summary = FieldVerify.verifySummary(conflicts, keys, cfg.confidenceThreshold)
    (conflicts, summary)
  }

  /** Review queue from a verification summary: below-threshold keys,
    * worst-confidence first (review_adapter.py:81).
    */
  def reviewQueue(summary: DataFrame, keys: Seq[String],
      cfg: Config = Config()): DataFrame = {
    val flagged = summary.filter(
      col("confidence") < cfg.confidenceThreshold || col("status") === "needs_review")
    // Range-partitioned two-phase rank: no single-partition window even
    // when a bad batch floods the queue.
    operators.Rank.globalRowNumber(
      flagged, col("confidence").asc +: keys.map(col(_).asc), "priority")
  }
}
