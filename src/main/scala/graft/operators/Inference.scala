package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.{DoubleAccumulator, LongAccumulator}

/** Distributed model-inference stage.
  *
  * Re-expresses the reference's extraction client
  * (vision_client.py:361 VisionExtractionManager: batched calls, retry
  * with exponential backoff, JSON-parsed structured output with
  * validation, per-call cost tracking against a budget) as a Spark
  * operator: requests flow through a batched `mapPartitions` kernel
  * (micro-batches = model calls), per-row retry happens inside the
  * partition, usage aggregates through Spark accumulators (no shuffle),
  * and output validation is DataFrame-side `from_json` against an
  * expected schema — so the hot path stays distributed and lazy while
  * the bookkeeping matches the reference's semantics.
  *
  * The model call itself is STUBBED (no model endpoint in this
  * container) with a deterministic kernel that injects the failure
  * modes the real client must survive; the batching, retry, budget,
  * accounting and validation plumbing is real.
  */
object Inference {
  type Q = (SparkSession, String) => DataFrame

  /** The reference manager's knobs (vision_client.py:372). backoffMs=0
    * keeps tests fast; production would use ~1000 with the same
    * 2^attempt growth.
    */
  case class Config(
      batchSize: Int = 16,
      maxRetries: Int = 3,
      backoffMs: Long = 0L,
      budgetUsd: Double = Double.MaxValue,
      costPer1kIn: Double = 0.00015,
      costPer1kOut: Double = 0.0006)

  case class Request(id: Long, prompt: String)
  case class Reply(id: Long, success: Boolean, content: String, error: String,
      attempts: Int, tokens_in: Long, tokens_out: Long, cost_usd: Double)

  /** Session-wide usage accounting (the reference's total_cost /
    * tokens_used), as Spark accumulators: executor-side spend merges on
    * the driver without any extra job.
    */
  final class Usage(s: SparkSession) extends Serializable {
    val calls: LongAccumulator = s.sparkContext.longAccumulator("graft.inference.calls")
    val retries: LongAccumulator = s.sparkContext.longAccumulator("graft.inference.retries")
    val failures: LongAccumulator = s.sparkContext.longAccumulator("graft.inference.failures")
    val tokensIn: LongAccumulator = s.sparkContext.longAccumulator("graft.inference.tokens_in")
    val tokensOut: LongAccumulator = s.sparkContext.longAccumulator("graft.inference.tokens_out")
    val costUsd: DoubleAccumulator = s.sparkContext.doubleAccumulator("graft.inference.cost_usd")
  }

  /** STUB model kernel — ONE call per micro-batch (the reference's
    * batched client shape), returning per-row outcomes. Deterministic,
    * and injects exactly the failure modes the real client sees:
    *   - transient per-row failure when (id + attempt) % 7 == 3
    *     (succeeds on a later attempt — exercises retry/backoff);
    *   - ```json fence-wrapped output when id % 5 == 0 (the parser
    *     must unwrap, vision_client.py:204 _parse_json_response);
    *   - truncated JSON when id % 31 == 0 (validation must flag it).
    */
  private[graft] def stubModelCall(batch: Seq[Request], attempt: Int): Seq[(Long, Boolean, String)] =
    batch.map { r =>
      if ((r.id + attempt) % 7 == 3) (r.id, false, "transient: rate limited")
      else {
        val body =
          s"""{"mpn": "MPN-${r.id}", "voltage": ${(r.id % 50) / 10.0}, "pages": ${r.id % 7}}"""
        val content =
          if (r.id % 31 == 0) body.dropRight(2) // truncated → malformed
          else if (r.id % 5 == 0) s"```json\n$body\n```"
          else body
        (r.id, true, content)
      }
    }

  /** Run the inference stage: batched micro-batch map with per-row
    * retry, per-partition budget share, accumulator-based accounting.
    * Returns the replies frame and the Usage handle.
    *
    * Budget note: a global mutable budget cannot be read mid-flight on
    * executors, so the distributed analog is each partition enforcing
    * its share (budgetUsd / numPartitions) — the same backstop
    * semantics (stop calling, emit budget-exceeded failures) without
    * any coordination.
    */
  def inferenceStage(requests: DataFrame, cfg: Config = Config()): (DataFrame, Usage) = {
    val s = requests.sparkSession
    import s.implicits._
    val usage = new Usage(s)
    val typed = requests.select(col("id").cast("long").as("id"), col("prompt")).as[Request]
    // stream-safe: a streaming Dataset has no rdd to count partitions
    // on, so the budget share falls back to the session's parallelism
    // memoized probe (Tables.scanWidth): a bare typed.rdd paid a full
    // physical-planning pass per invocation just to size the budget
    val nParts = math.max(1,
      if (requests.isStreaming) s.sparkContext.defaultParallelism
      else graft.Tables.scanWidth(typed.toDF()))
    val budgetShare = cfg.budgetUsd / nParts
    val out = typed.mapPartitions { it =>
      var localSpend = 0.0
      it.grouped(cfg.batchSize).flatMap { batch =>
        // budget is a pre-call check at batch granularity, like the
        // reference's pre-request check
        if (localSpend >= budgetShare) {
          usage.failures.add(batch.size.toLong)
          batch.map(r => Reply(r.id, success = false, content = "",
            error = f"budget exceeded: $$${localSpend}%.4f >= share $$${budgetShare}%.4f",
            attempts = 0, tokens_in = 0L, tokens_out = 0L, cost_usd = 0.0))
        } else {
          // one model call per (batch, attempt); only still-failing rows
          // are resubmitted, with exponential backoff between rounds
          val done = scala.collection.mutable.Map[Long, Reply]()
          var pending = batch
          var attempt = 0
          var lastErr = ""
          while (pending.nonEmpty && attempt < cfg.maxRetries) {
            val results = stubModelCall(pending, attempt)
            usage.calls.add(1L)
            if (attempt > 0) usage.retries.add(pending.size.toLong)
            val byId = pending.map(r => r.id -> r).toMap
            val failed = Seq.newBuilder[Request]
            results.foreach { case (id, ok, content) =>
              if (ok) {
                val r = byId(id)
                val tIn = r.prompt.length / 4L + 1L
                val tOut = content.length / 4L
                val cost = tIn / 1000.0 * cfg.costPer1kIn + tOut / 1000.0 * cfg.costPer1kOut
                localSpend += cost
                usage.tokensIn.add(tIn)
                usage.tokensOut.add(tOut)
                usage.costUsd.add(cost)
                done(id) = Reply(id, success = true, content, "", attempt + 1, tIn, tOut, cost)
              } else { lastErr = content; failed += byId(id) }
            }
            pending = failed.result()
            if (pending.nonEmpty && cfg.backoffMs > 0) Thread.sleep(cfg.backoffMs << attempt)
            attempt += 1
          }
          pending.foreach { r =>
            usage.failures.add(1L)
            done(r.id) = Reply(r.id, success = false, content = "", error = lastErr,
              attempts = attempt, tokens_in = 0L, tokens_out = 0L, cost_usd = 0.0)
          }
          batch.map(r => done(r.id)) // preserve input order
        }
      }
    }.toDF()
    (out, usage)
  }

  /** Validate replies against the expected output schema: unwrap a
    * ```json fence if present, parse with `from_json` (null on
    * malformed), and require the given fields non-null. All
    * columnar/codegen — no per-row driver work.
    */
  def validated(replies: DataFrame, schema: StructType, required: Seq[String]): DataFrame = {
    val fenced = regexp_extract(col("content"), "(?s)```json\\s*(.*?)\\s*```", 1)
    val jsonStr = when(length(fenced) > 0, fenced).otherwise(col("content"))
    replies
      .withColumn("parsed", from_json(jsonStr, schema))
      .withColumn("valid",
        col("success") && col("parsed").isNotNull &&
          required.map(f => col(s"parsed.$f").isNotNull).reduce(_ && _))
  }

  /** Expected extraction schema of the stub kernel's output — shared
    * with ExtractPipeline so both validate the same shape.
    */
  private[graft] val extractSchema = StructType(Seq(
    StructField("mpn", StringType),
    StructField("voltage", DoubleType),
    StructField("pages", LongType)))

  /** infer_extract: documents → prompts → batched stub inference →
    * schema-validated structured rows. Oracle-gated since r4: every
    * output column is a closed-form function of doc_id and the text
    * length — a row fails at attempt a iff (id+a)%7==3, so id%7==3
    * rows retry exactly once (attempts=2) and everything else
    * succeeds first call; token counts derive from the prompt/content
    * string lengths; only id%31 truncated-JSON rows drop at
    * validation. The DuckDB oracle re-derives all of it independently,
    * putting the retry/validation/accounting plumbing itself under the
    * hash gate. Retry/malformed/budget paths also asserted in
    * InferenceSpec.
    */
  val inferExtract: Q = (s, d) => {
    val reqs = Tables.documents(s, d)
      .select(col("doc_id").as("id"),
        concat(lit("Extract part fields from: "),
          coalesce(substring(col("text"), 1, 256), lit(""))).as("prompt"))
    val (replies, _) = inferenceStage(reqs)
    validated(replies, extractSchema, Seq("mpn", "voltage"))
      .select(col("id").as("doc_id"), col("valid"), col("attempts").cast("long").as("attempts"),
        col("parsed.mpn").as("mpn"), col("parsed.voltage").as("voltage"),
        col("tokens_in"), col("tokens_out"))
      .orderBy(col("doc_id"))
  }

  val inferExtractSql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    26 + COALESCE(length(substring(text, 1, 256)), 0) AS plen,
      |    '{"mpn": "MPN-' || doc_id || '", "voltage": ' ||
      |      CAST(CAST(doc_id % 50 AS DOUBLE) / 10.0 AS VARCHAR) ||
      |      ', "pages": ' || (doc_id % 7) || '}' AS body
      |  FROM documents),
      |shaped AS (
      |  SELECT doc_id, plen,
      |    CASE WHEN doc_id % 31 = 0 THEN length(body) - 2
      |         WHEN doc_id % 5 = 0 THEN length(body) + 12
      |         ELSE length(body) END AS clen,
      |    doc_id % 31 <> 0 AS valid
      |  FROM base)
      |SELECT doc_id, valid,
      |  CAST(CASE WHEN doc_id % 7 = 3 THEN 2 ELSE 1 END AS BIGINT) AS attempts,
      |  CASE WHEN valid THEN 'MPN-' || doc_id END AS mpn,
      |  CASE WHEN valid THEN CAST(doc_id % 50 AS DOUBLE) / 10.0 END AS voltage,
      |  CAST(plen // 4 + 1 AS BIGINT) AS tokens_in,
      |  CAST(clen // 4 AS BIGINT) AS tokens_out
      |FROM shaped ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map("infer_extract" -> inferExtract)
  val oracles: Map[String, String] = Map("infer_extract" -> inferExtractSql)
}
