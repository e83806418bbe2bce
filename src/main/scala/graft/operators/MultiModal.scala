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
        col("text").cast("binary").as("content"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        element_at(fmts, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .as[MediaRow]
    media.mapPartitions(_.grouped(BATCH).flatMap(decodeBatchStub))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("fmt"), col("feat_norm"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map("mm_pipeline" -> mmPipeline)

  /** Decode kernel is a stub → rows-only check; n_bytes/fmt are
    * additionally asserted in MultiModalSpec.
    */
  val oracles: Map[String, String] = Map.empty
}
