package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2C multimodal column plumbing.
  *
  * Models the pattern a 100 TB training-data pipeline uses for
  * image/audio/video: an opaque `binary` payload column + typed
  * metadata, processed by a batched per-partition decode/featurize
  * stage. The Spark-side plumbing — schema, partition-parallel batched
  * execution, feature output shape — is real; only the media decode
  * kernel is STUBBED (no image/audio libs in this container) with a
  * deterministic fake so results are testable.
  */
object MultiModal {
  type Q = (SparkSession, String) => DataFrame

  /** Input record: payload + metadata (what an image table looks like). */
  case class MediaRow(doc_id: Long, content: Array[Byte], width: Int, height: Int, fmt: String)
  /** Output record of the featurize stage. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, fmt: String,
      feat: Array[Float], feat_norm: Double)

  private val BATCH = 32 // rows per decode batch (model-inference shape)

  /** STUB decode/featurize kernel. A real pipeline decodes the bytes
    * (JPEG/PNG/WAV...) and runs a vision/audio encoder per batch; this
    * container has no media libs, so we emit a deterministic fake
    * feature vector derived from the payload bytes. The batching,
    * schema and partition layout are exactly what the real kernel
    * would use.
    */
  private def decodeBatchStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val feat = Array.tabulate(8) { i =>
        // fake "embedding": byte-sum folded per lane — NOT a real decoder
        var acc = i + 1
        var j = i
        while (j < r.content.length) { acc = acc * 31 + r.content(j); j += r.width.max(1) }
        (acc % 1000) / 1000.0f
      }
      val norm = math.sqrt(feat.map(x => x.toDouble * x).sum)
      MediaFeatures(r.doc_id, r.content.length.toLong, r.fmt, feat, norm)
    }

  /** documents → fake media table → batched featurize. */
  val mmPipeline: Q = (s, d) => {
    import s.implicits._
    val fmts = array(lit("png"), lit("jpeg"), lit("wav"))
    val media = Tables.documents(s, d)
      .select(col("doc_id"),
        // a null payload row must not NPE the typed featurize kernel;
        // empty content is the decode-stub's defined degenerate input
        coalesce(col("text"), lit("")).cast("binary").as("content"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        element_at(fmts, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .as[MediaRow]
    media.mapPartitions(_.grouped(BATCH).flatMap(decodeBatchStub))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("fmt"), col("feat_norm"))
      .orderBy(col("doc_id"))
  }

  // --- mm_metadata: the binary-column surface under the hash gate -----
  // Everything around the stubbed decode IS deterministic: payload
  // byte length, payload content hash (dedup key for media), format
  // and dimension metadata. The Spark side runs on a real BINARY
  // column (cast, length, md5 over bytes); the oracle computes the
  // same values from the text the payload was derived from — so the
  // media-table bookkeeping a 100 TB multimodal pipeline relies on
  // (per-format size accounting, payload-level dedup counts, dimension
  // bounds) is verified, and only the decode kernel remains stubbed.
  val mmMetadata: Q = (s, d) => {
    val fmts = array(lit("png"), lit("jpeg"), lit("wav"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        element_at(fmts, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("content")).cast("long")).as("sum_bytes"),
        countDistinct(md5(col("content"))).as("n_distinct_payloads"),
        min(col("width")).as("min_w"), max(col("width")).as("max_w"),
        min(col("height")).as("min_h"), max(col("height")).as("max_h"))
      .orderBy(col("fmt"))
  }

  val mmMetadataSql: String =
    """WITH media AS (
      |  SELECT doc_id, text,
      |    CAST(doc_id % 64 + 16 AS INT) AS width,
      |    CAST(doc_id % 48 + 16 AS INT) AS height,
      |    ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS fmt
      |  FROM documents)
      |SELECT fmt, COUNT(*) AS n,
      |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS sum_bytes,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads,
      |  min(width) AS min_w, max(width) AS max_w,
      |  min(height) AS min_h, max(height) AS max_h
      |FROM media GROUP BY fmt ORDER BY fmt""".stripMargin

  // --- mm_frame_sample: video frame-sampling plumbing ----------------
  // The frame-sample stage of a video ingest: per-video metadata
  // (duration, fps, frame geometry) determines the frame index set —
  // every k-th frame, k sized so ≤8 frames survive per video — and
  // each sampled frame becomes one row carrying its timestamp and the
  // byte offset a real decoder would seek to. Everything here is
  // integer arithmetic over metadata (sequence + explode — no shuffle
  // until the final sort), so the WHOLE sampling plan sits under the
  // hash gate; only the per-frame pixel decode (which would consume
  // content[byte_off : byte_off+frame_bytes]) is the stubbed kernel,
  // same as mm_pipeline's. At 100 TB the explode is the right shape:
  // row count grows 8× per video with zero driver coordination.
  val mmFrameSample: Q = (s, d) => {
    val fps = (pmod(col("doc_id"), lit(2)) * 6 + 24).cast("long")       // 24 or 30
    val durS = (pmod(col("n_chars"), lit(111)) + 10).cast("long")       // 10..120 s
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), fps.as("fps"), durS.as("dur_s"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("long").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("long").as("height"))
      .withColumn("n_frames", col("dur_s") * col("fps"))
      .withColumn("step", greatest(lit(1L), expr("n_frames div 8")))
    meta.select(col("doc_id"), col("fps"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("step"))).as("frame_idx"),
        (col("width") * col("height") * 3L).as("frame_bytes"))
      .select(col("doc_id"), col("frame_idx"),
        expr("frame_idx * 1000 div fps").as("ts_ms"),
        (col("frame_idx") * col("frame_bytes")).as("byte_off"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    doc_id % 2 * 6 + 24 AS fps,
      |    n_chars % 111 + 10 AS dur_s,
      |    doc_id % 64 + 16 AS width,
      |    doc_id % 48 + 16 AS height
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, fps, dur_s * fps AS n_frames,
      |    greatest(1, dur_s * fps // 8) AS step,
      |    width * height * 3 AS frame_bytes
      |  FROM meta),
      |x AS (
      |  SELECT doc_id, fps, frame_bytes,
      |    unnest([i FOR i IN range(0, n_frames, CAST(step AS BIGINT))]) AS frame_idx
      |  FROM f)
      |SELECT doc_id, frame_idx,
      |  frame_idx * 1000 // fps AS ts_ms,
      |  frame_idx * frame_bytes AS byte_off
      |FROM x ORDER BY doc_id, frame_idx""".stripMargin

  // --- mm_audio_window: audio windowing plumbing ---------------------
  // The windowing stage of an audio ingest (the audio sibling of
  // mm_frame_sample): per-clip metadata (sample rate, duration)
  // determines overlapping 1-second analysis windows — hop sized so
  // ≤16 windows survive per clip — and each window becomes one row
  // carrying its start sample, timestamp, and the byte offset a
  // 16-bit-mono decoder would seek to. Pure integer metadata
  // arithmetic (sequence + explode, no shuffle until the sort), so
  // the whole plan sits under the hash gate; the sample decode is the
  // stubbed kernel, as in mm_pipeline.
  val mmAudioWindow: Q = (s, d) => {
    val sr = (pmod(col("doc_id"), lit(2)) * 28100 + 16000).cast("long")  // 16 k or 44.1 k
    val durMs = (pmod(col("n_chars"), lit(29001)) + 1000).cast("long")   // 1..30 s
    Tables.documents(s, d)
      .select(col("doc_id"), sr.as("sr"), durMs.as("dur_ms"))
      .withColumn("n_samples", expr("dur_ms * sr div 1000"))
      .withColumn("lim", col("n_samples") - col("sr"))                   // last window start
      .withColumn("hop", greatest(expr("sr div 2"), expr("(lim + 14) div 15")))
      .select(col("doc_id"), col("sr"),
        explode(sequence(lit(0L), col("lim"), col("hop"))).as("start_sample"))
      .select(col("doc_id"), col("start_sample"),
        expr("start_sample * 1000 div sr").as("ts_ms"),
        (col("start_sample") * 2L).as("byte_off"))
      .orderBy(col("doc_id"), col("start_sample"))
  }

  val mmAudioWindowSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    doc_id % 2 * 28100 + 16000 AS sr,
      |    n_chars % 29001 + 1000 AS dur_ms
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, sr,
      |    dur_ms * sr // 1000 - sr AS lim,
      |    greatest(sr // 2, (dur_ms * sr // 1000 - sr + 14) // 15) AS hop
      |  FROM meta),
      |x AS (
      |  SELECT doc_id, sr,
      |    unnest([i FOR i IN range(0, lim + 1, CAST(hop AS BIGINT))]) AS start_sample
      |  FROM w)
      |SELECT doc_id, start_sample,
      |  start_sample * 1000 // sr AS ts_ms,
      |  start_sample * 2 AS byte_off
      |FROM x ORDER BY doc_id, start_sample""".stripMargin

  val queries: Map[String, Q] = Map(
    "mm_pipeline" -> mmPipeline,
    "mm_metadata" -> mmMetadata,
    "mm_frame_sample" -> mmFrameSample,
    "mm_audio_window" -> mmAudioWindow)

  /** Decode kernel is a stub → mm_pipeline stays rows-only (n_bytes/
    * fmt asserted in MultiModalSpec); mm_metadata gates the
    * deterministic binary-column bookkeeping and mm_frame_sample the
    * frame-selection arithmetic around it.
    */
  val oracles: Map[String, String] = Map(
    "mm_metadata" -> mmMetadataSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_audio_window" -> mmAudioWindowSql)
}
