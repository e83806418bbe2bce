package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Region (bbox) post-processing — the geometry side of the
  * reference's page-region model (interfaces.py:66 Region: bbox
  * (x0,y0,x1,y1) + confidence; pdf_renderer.py:309 crop_region).
  * When two detectors propose regions for the same page, overlapping
  * proposals (IoU ≥ threshold) are duplicates and the higher-
  * confidence one wins — the standard detection-dedup step.
  *
  * Pair generation is page-local (equi-join on page id), so the
  * shuffle key is the page and the quadratic work is bounded by
  * regions-per-page — the same bucket-local discipline as the text
  * dedup operators.
  */
object RegionOps {
  type Q = (SparkSession, String) => DataFrame

  /** IoU of two integer boxes as Columns. */
  def iou(ax0: Column, ay0: Column, ax1: Column, ay1: Column,
      bx0: Column, by0: Column, bx1: Column, by1: Column): Column = {
    val iw = greatest(lit(0), least(ax1, bx1) - greatest(ax0, bx0))
    val ih = greatest(lit(0), least(ay1, by1) - greatest(ay0, by0))
    val inter = (iw * ih).cast("double")
    val areaA = (ax1 - ax0) * (ay1 - ay0)
    val areaB = (bx1 - bx0) * (by1 - by0)
    inter / (areaA + areaB - inter)
  }

  /** Synthetic two-detector region sets derived from part. */
  private def regions(s: SparkSession, d: String, shifted: Boolean): DataFrame = {
    val p = Tables.part(s, d)
    val dx = if (shifted) pmod(col("p_partkey"), lit(3)) else lit(0)
    val dy = if (shifted) pmod(col("p_partkey"), lit(2)) else lit(0)
    val x0 = pmod(col("p_partkey"), lit(40)) + dx
    val y0 = pmod(col("p_partkey"), lit(30)) + dy
    p.select(
      col("p_partkey").as(if (shifted) "b_id" else "a_id"),
      (col("p_partkey") / 50).cast("long").as("page"),
      x0.cast("int").as("x0"), y0.cast("int").as("y0"),
      (x0 + 10 + pmod(col("p_partkey"), lit(5))).cast("int").as("x1"),
      (y0 + 8).cast("int").as("y1"),
      (lit(if (shifted) 0.6 else 0.8) + pmod(col("p_partkey"), lit(10)) / 100.0)
        .as("confidence"))
  }

  /** Overlapping proposals between the two detectors per page, with
    * the confidence winner.
    */
  val etlRegionDedup: Q = (s, d) => {
    val a = regions(s, d, shifted = false)
    val b = regions(s, d, shifted = true).select(
      col("b_id"), col("page").as("b_page"), col("x0").as("bx0"), col("y0").as("by0"),
      col("x1").as("bx1"), col("y1").as("by1"), col("confidence").as("b_confidence"))
    val j = a.join(b, col("page") === col("b_page") && col("a_id") =!= col("b_id"))
    val theIou = iou(col("x0"), col("y0"), col("x1"), col("y1"),
      col("bx0"), col("by0"), col("bx1"), col("by1"))
    j.select(col("page"), col("a_id"), col("b_id"),
        round(theIou, 6).as("iou"),
        when(col("confidence") >= col("b_confidence"), col("a_id"))
          .otherwise(col("b_id")).as("keep_id"))
      .filter(col("iou") >= 0.3)
      .orderBy(col("page"), col("a_id"), col("b_id"))
  }

  val etlRegionDedupSql: String =
    """WITH a AS (
      |  SELECT p_partkey AS a_id, p_partkey // 50 AS page,
      |    p_partkey % 40 AS x0, p_partkey % 30 AS y0,
      |    p_partkey % 40 + 10 + p_partkey % 5 AS x1, p_partkey % 30 + 8 AS y1,
      |    0.8 + (p_partkey % 10) / 100.0 AS confidence
      |  FROM part),
      |b AS (
      |  SELECT p_partkey AS b_id, p_partkey // 50 AS b_page,
      |    p_partkey % 40 + p_partkey % 3 AS bx0, p_partkey % 30 + p_partkey % 2 AS by0,
      |    p_partkey % 40 + p_partkey % 3 + 10 + p_partkey % 5 AS bx1,
      |    p_partkey % 30 + p_partkey % 2 + 8 AS by1,
      |    0.6 + (p_partkey % 10) / 100.0 AS b_confidence
      |  FROM part),
      |paired AS (
      |  SELECT page, a_id, b_id,
      |    round(CAST(greatest(0, least(x1, bx1) - greatest(x0, bx0))
      |         * greatest(0, least(y1, by1) - greatest(y0, by0)) AS DOUBLE)
      |      / ((x1 - x0) * (y1 - y0) + (bx1 - bx0) * (by1 - by0)
      |         - greatest(0, least(x1, bx1) - greatest(x0, bx0))
      |           * greatest(0, least(y1, by1) - greatest(y0, by0))), 6) AS iou,
      |    CASE WHEN confidence >= b_confidence THEN a_id ELSE b_id END AS keep_id
      |  FROM a JOIN b ON page = b_page AND a_id <> b_id)
      |SELECT page, a_id, b_id, iou, keep_id FROM paired
      |WHERE iou >= 0.3 ORDER BY page, a_id, b_id""".stripMargin

  // --- region_ingest: opaque page bytes → region proposals -----------
  /** Input record: a rendered page (pdf_renderer.py render_page → PNG
    * bytes) with its pixel dimensions.
    */
  case class PageBlob(page: Long, content: Array[Byte], width: Int, height: Int)
  /** Output record: one region proposal (interfaces.py:66 Region). */
  case class RegionProposal(page: Long, region_id: Long,
      x0: Int, y0: Int, x1: Int, y1: Int, kind: String, confidence: Double)

  private val DETECT_BATCH = 16

  /** STUB region detector (pdf_renderer.py:309 crop_region's upstream:
    * propose crop boxes on a page image). A real pipeline runs a
    * layout-detection model per batch of page images; this container
    * has no vision libs, so proposals are derived deterministically
    * from the payload bytes — the batching, page-local geometry and
    * output shape are exactly what the real detector would produce.
    */
  private def detectBatchStub(batch: Seq[PageBlob]): Seq[RegionProposal] =
    batch.flatMap { p =>
      val nRegions = 1 + (p.content.length % 4)
      (0 until nRegions).map { i =>
        val seed = p.content.length * 31 + i * 7
        val x0 = seed % (p.width / 2)
        val y0 = (seed / 3) % (p.height / 2)
        val kind = Seq("table", "figure", "text")(seed % 3)
        RegionProposal(p.page, p.page * 16 + i, x0, y0,
          math.min(p.width, x0 + 20 + seed % 40),
          math.min(p.height, y0 + 12 + seed % 24),
          kind, 0.5 + (seed % 50) / 100.0)
      }
    }

  /** documents → fake page renders → batched region detection. Output
    * feeds the IoU dedup above (same page/bbox/confidence shape);
    * rows-only correctness (stub kernel), geometry asserted in
    * RegionIngestSpec.
    */
  val regionIngest: Q = (s, d) => {
    import s.implicits._
    val pages = Tables.documents(s, d)
      .select(col("doc_id").as("page"),
        // null page payloads render as empty blobs, not kernel NPEs
        coalesce(col("text"), lit("")).cast("binary").as("content"),
        lit(612).as("width"), lit(792).as("height")) // US-Letter @72dpi
      .as[PageBlob]
    pages.mapPartitions(_.grouped(DETECT_BATCH).flatMap(detectBatchStub))
      .toDF()
      .orderBy(col("page"), col("region_id"))
  }

  val queries: Map[String, Q] = Map(
    "etl_region_dedup" -> etlRegionDedup,
    "region_ingest" -> regionIngest)
  val oracles: Map[String, String] = Map("etl_region_dedup" -> etlRegionDedupSql)
}
