package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2B reference-ETL operators, part 3: position-based merged-cell
  * detection and the vision-fallback routing decision — the
  * merge_detector half of the reference's extraction pipeline
  * re-expressed as distributed per-(table, column) aggregates.
  */
object EtlOps3 {
  type Q = (SparkSession, String) => DataFrame

  // private[graft]: the spec derives its ground-truth expectations from
  // the same two constants, so engine, oracle SQL (interpolated below),
  // and test all share one definition of the synthetic table shape.
  private[graft] val NROWS = 6L
  private[graft] val NCOLS = 4L

  /** Deterministic synthetic cell frame standing in for the per-page
    * `(raw_table, char_positions)` pair (merge_detector.py:192-203):
    * one table per document, NROWS×NCOLS cells, each with nullable
    * content and an (x_start, x_end) character span. Widths hover
    * around a per-column base (40 + 10·col, ±3 jitter) except for
    * deterministic "merged" cells (every 11th (table,row,col)
    * residue) that are ~2× or ~3× the base — the ground truth the
    * position detector must recover. Content cycles NULL and four
    * phrases, two of which are category headers, so the empty-pattern
    * detector has real work too. All coordinates are integers so both
    * engines compute bit-identical widths.
    */
  private def positionCells(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id").as("table_id"))
      .withColumn("row_idx", explode(sequence(lit(0L), lit(NROWS - 1))))
      .withColumn("col_idx", explode(sequence(lit(0L), lit(NCOLS - 1))))
      .withColumn("res", pmod(col("table_id") * 3 + col("row_idx") * 2 + col("col_idx"), lit(5L)))
      .withColumn("content",
        when(col("res") === 1, "Electrical Characteristics")
          .when(col("res") === 2, "3.3")
          .when(col("res") === 3, "VIN max")
          .when(col("res") === 4, "Operating Conditions"))
      .withColumn("base", lit(40L) + col("col_idx") * 10)
      .withColumn("width",
        when(pmod(col("table_id") + col("row_idx") + col("col_idx"), lit(11L)) === 0,
          when(pmod(col("table_id") + col("row_idx") * 2 + col("col_idx"), lit(2L)) === 0,
            col("base") * 2 + 12).otherwise(col("base") * 3 + 20))
          .otherwise(col("base") +
            pmod(col("table_id") + col("row_idx") * 3 + col("col_idx") * 5, lit(7L)) - 3))
      .select(col("table_id"), col("row_idx"), col("col_idx"), col("content"),
        (col("col_idx") * 80).as("x_start"),
        (col("col_idx") * 80 + col("width")).as("x_end"))

  /** The same frame as a DuckDB CTE body, shared by both oracles.
    * NROWS/NCOLS are interpolated so engine and oracle share ONE
    * definition of the synthetic table shape.
    */
  private val cellsSql: String =
    s"""cells AS (
      |  SELECT doc_id AS table_id, r.row_idx, c.col_idx,
      |    CASE (doc_id * 3 + r.row_idx * 2 + c.col_idx) % 5
      |      WHEN 1 THEN 'Electrical Characteristics'
      |      WHEN 2 THEN '3.3'
      |      WHEN 3 THEN 'VIN max'
      |      WHEN 4 THEN 'Operating Conditions' END AS content,
      |    c.col_idx * 80 AS x_start,
      |    c.col_idx * 80 +
      |      CASE WHEN (doc_id + r.row_idx + c.col_idx) % 11 = 0
      |        THEN CASE WHEN (doc_id + r.row_idx * 2 + c.col_idx) % 2 = 0
      |          THEN (40 + c.col_idx * 10) * 2 + 12
      |          ELSE (40 + c.col_idx * 10) * 3 + 20 END
      |        ELSE 40 + c.col_idx * 10 + ((doc_id + r.row_idx * 3 + c.col_idx * 5) % 7) - 3
      |      END AS x_end
      |  FROM documents
      |  CROSS JOIN (SELECT unnest(range($NROWS)) AS row_idx) r
      |  CROSS JOIN (SELECT unnest(range($NCOLS)) AS col_idx) c)""".stripMargin

  /** The shared width/discrete-median window pass: adds `w` plus the
    * per-(table_id, col_idx) rank `rn`, group size `n`, and reference
    * median `typical` = sorted[n // 2] — ONE window shuffle that all
    * three position operators build on. Ties carry equal values, so
    * the row_idx tiebreak cannot change the median.
    */
  private def withTypicalWidth(cells: DataFrame): DataFrame = {
    val byCol = Window.partitionBy(col("table_id"), col("col_idx"))
    cells
      .withColumn("w", col("x_end") - col("x_start"))
      .withColumn("rn", row_number().over(byCol.orderBy(col("w"), col("row_idx"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byCol))
      .withColumn("typical", max(when(col("rn") === expr("n div 2 + 1"), col("w"))).over(byCol))
  }

  /** The same pass as DuckDB CTEs (follows `cellsSql`; exposes `t`). */
  private val typicalSql: String =
    """wd AS (SELECT *, x_end - x_start AS w FROM cells),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY table_id, col_idx ORDER BY w, row_idx) AS rn,
      |        COUNT(*) OVER (PARTITION BY table_id, col_idx) AS n
      |      FROM wd),
      |t AS (SELECT *, MAX(CASE WHEN rn = n // 2 + 1 THEN w END)
      |        OVER (PARTITION BY table_id, col_idx) AS typical FROM r)""".stripMargin

  // --- etl_merge_positions: x-coordinate merged-cell detection -------
  /** Distributed `_detect_by_positions` (merge_detector.py:192-231 with
    * `_calculate_column_widths`, :233-255): a cell whose x-span beats
    * 1.5× its column's typical width is a horizontal merge spanning
    * `width div typical` columns, confidence 0.90. "Typical" is the
    * reference's exact discrete median — the value at sorted index
    * n//2 — computed per (table, col) over ALL positioned cells
    * (empty-content cells included, exactly as the reference's width
    * pass is content-blind while its detection pass is content-only).
    * Everything is ONE shuffle: a single window partitioned by
    * (table_id, col_idx) carries the rank, the count, and the
    * median-pick; detection is then a stateless filter. At 100 TB the
    * shuffle key is (table, column) — millions of small independent
    * groups, no skew ceiling, no join.
    */
  /** The position-detected merge set (before presentation): width >
    * 1.5 × typical in exact integer arithmetic, span = width div
    * typical. Shared by etl_merge_positions, etl_vision_route's 0.90
    * detector, and etl_merge_resolve's propagation.
    */
  private def positionMerges(s: SparkSession, d: String): DataFrame =
    withTypicalWidth(positionCells(s, d))
      .filter(col("content").isNotNull && length(trim(col("content"))) > 0)
      .filter(col("w") * 2 > col("typical") * 3)
      .withColumn("span", expr("w div typical"))
      .filter(col("span") > 1)
      .select(col("table_id"), col("row_idx"), col("col_idx").as("col_start"),
        (col("col_idx") + col("span") - 1).as("col_end"), col("span"), col("content"))

  /** Same set as a CTE (follows `typicalSql`; exposes `pos`). */
  private val posSql: String =
    """pos AS (SELECT table_id, row_idx, col_idx AS col_start,
      |          col_idx + (w // typical) - 1 AS col_end, w // typical AS span, content
      |        FROM t
      |        WHERE content IS NOT NULL AND length(trim(content)) > 0
      |          AND w * 2 > typical * 3 AND w // typical > 1)""".stripMargin

  val etlMergePositions: Q = (s, d) =>
    positionMerges(s, d)
      .withColumn("confidence", lit(0.9))
      .orderBy(col("table_id"), col("row_idx"), col("col_start"))

  val etlMergePositionsSql: String =
    s"""WITH $cellsSql,
      |$typicalSql,
      |$posSql
      |SELECT table_id, row_idx, col_start, col_end, span, content,
      |  CAST(0.9 AS DOUBLE) AS confidence
      |FROM pos
      |ORDER BY table_id, row_idx, col_start""".stripMargin

  // --- etl_empty_cell_merges: empty-pattern merge detection ----------
  /** Distributed `_detect_empty_cell_patterns` (merge_detector.py:
    * 149-189): a non-empty cell followed by a run of empty cells in the
    * same row suggests a horizontal merge of span = 1 + the run length;
    * spans of 2-4 cells emit at confidence 0.70 — but only when the
    * content looks like a category header (`_is_category_header`,
    * EtlOps2 owns the predicate in both Column and SQL forms). The scan
    * for the next non-empty column is one window pass keyed
    * (table_id, row_idx) — independent row-local groups, no join, no
    * skew ceiling at 100 TB. Shared by the standalone key and
    * etl_vision_route's 0.70 detector.
    */
  private def emptyPatternMerges(s: SparkSession, d: String): DataFrame = {
    val hasContent = col("content").isNotNull && length(trim(col("content"))) > 0
    val wNext = Window.partitionBy(col("table_id"), col("row_idx")).orderBy(col("col_idx"))
      .rowsBetween(1, Window.unboundedFollowing)
    positionCells(s, d)
      .withColumn("next_c", min(when(hasContent, col("col_idx"))).over(wNext))
      .withColumn("span", coalesce(col("next_c"), lit(NCOLS)) - col("col_idx"))
      .filter(hasContent && col("span") >= 2 && col("span") <= 4 &&
        EtlOps2.isCategoryHeader(col("content")))
      .select(col("table_id"), col("row_idx"), col("col_idx").as("col_start"),
        (col("col_idx") + col("span") - 1).as("col_end"), col("span"),
        trim(col("content")).as("content"))
  }

  /** The same set as DuckDB CTEs (follows `cellsSql`; exposes `emc`). */
  private def emptyPatternSql: String =
    s"""nx AS (SELECT *,
      |         MIN(CASE WHEN content IS NOT NULL AND length(trim(content)) > 0
      |               THEN col_idx END)
      |           OVER (PARTITION BY table_id, row_idx ORDER BY col_idx
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c
      |       FROM cells),
      |emc AS (SELECT table_id, row_idx, col_idx AS col_start,
      |          col_idx + (COALESCE(next_c, $NCOLS) - col_idx) - 1 AS col_end,
      |          COALESCE(next_c, $NCOLS) - col_idx AS span, trim(content) AS content
      |        FROM nx
      |        WHERE content IS NOT NULL AND length(trim(content)) > 0
      |          AND COALESCE(next_c, $NCOLS) - col_idx BETWEEN 2 AND 4
      |          AND ${EtlOps2.categoryHeaderPredSql("content")})""".stripMargin

  val etlEmptyCellMerges: Q = (s, d) =>
    emptyPatternMerges(s, d)
      .withColumn("confidence", lit(0.7))
      .orderBy(col("table_id"), col("row_idx"), col("col_start"))

  val etlEmptyCellMergesSql: String =
    s"""WITH $cellsSql,
      |$emptyPatternSql
      |SELECT table_id, row_idx, col_start, col_end, span, content,
      |  CAST(0.7 AS DOUBLE) AS confidence
      |FROM emc
      |ORDER BY table_id, row_idx, col_start""".stripMargin

  // --- etl_vision_route: merge confidence → extraction routing -------
  /** `get_confidence` / `needs_vision_fallback` (merge_detector.py:
    * 398-417) stacked with the double-verifier's status rule
    * (double_verifier.py:365-384): per table, run BOTH horizontal-merge
    * detectors (positions at 0.90, empty-pattern at 0.70 gated on
    * `_is_category_header` — merge_detector.py:150-189), deduplicate by
    * (row, col_start) keeping the highest confidence
    * (merge_detector.py:288-301), then
    *   merge_conf = avg(confidence), or 1.0 for a merge-free table;
    *   needs_vision = merge_conf < 0.60 (CONFIDENCE_THRESHOLD).
    * Detector disagreements (a merge one detector sees and the other
    * does not) play the verifier-conflict role: span ≥ 3 is high
    * severity (-0.050), else medium (-0.025), and the route stacks the
    * reference's two fallbacks in its order: vision when merge_conf is
    * low, manual_review on any high-severity disagreement, then
    * low_confidence, then auto. Confidences are exact integer ppm so
    * the gate hash-compares. Faithful quirk: the reference's detector
    * confidences are all ≥ 0.70, so merge_conf alone can never dip
    * below 0.60 — vision routing is only reachable through the
    * verification stack, which is precisely why the pipeline stacks
    * them. Plan: two window passes over the same cell frame, one
    * (table,row,col) dedup aggregate, one per-table aggregate, one
    * equi-join back to tables — every stage keyed by table_id or
    * finer, nothing broadcast-unbounded, no skew ceiling at 100 TB.
    */
  val etlVisionRoute: Q = (s, d) => {
    val posM = positionMerges(s, d)
      .select(col("table_id"), col("row_idx"), col("col_start"),
        col("span"), lit(900000L).as("conf_ppm"))

    val patM = emptyPatternMerges(s, d)
      .select(col("table_id"), col("row_idx"), col("col_start"),
        col("span"), lit(700000L).as("conf_ppm"))

    val merged = posM.unionByName(patM)
      .groupBy(col("table_id"), col("row_idx"), col("col_start"))
      .agg(max(col("conf_ppm")).as("conf_ppm"), count(lit(1)).as("n_det"),
        max(col("span")).as("span"))
    val perTable = merged.groupBy(col("table_id")).agg(
      count(lit(1)).as("nm"),
      sum(col("conf_ppm")).as("sum_conf"),
      sum(when(col("n_det") === 1 && col("span") >= 3, 1L).otherwise(0L)).as("nh"),
      sum(when(col("n_det") === 1 && col("span") < 3, 1L).otherwise(0L)).as("nmed"))

    Tables.documents(s, d).select(col("doc_id").as("table_id"))
      .join(perTable, Seq("table_id"), "left")
      .select(col("table_id"),
        coalesce(col("nm"), lit(0L)).as("n_merges"),
        when(col("nm").isNull, lit(1000000L))
          .otherwise(expr("sum_conf div nm")).as("merge_conf_ppm"),
        coalesce(col("nh"), lit(0L)).as("n_high"),
        coalesce(col("nmed"), lit(0L)).as("n_medium"))
      .withColumn("verify_conf_ppm",
        greatest(lit(0L), lit(1000000L) - col("n_high") * 50000 - col("n_medium") * 25000))
      .withColumn("needs_vision", col("merge_conf_ppm") < 600000)
      .withColumn("route",
        when(col("needs_vision"), "vision")
          .when(col("n_high") > 0, "manual_review")
          .when(col("verify_conf_ppm") < 600000, "low_confidence")
          .otherwise("auto"))
      .orderBy(col("table_id"))
  }

  val etlVisionRouteSql: String =
    s"""WITH $cellsSql,
      |$typicalSql,
      |$posSql,
      |posc AS (SELECT table_id, row_idx, col_start, span, 900000 AS conf_ppm FROM pos),
      |$emptyPatternSql,
      |pat AS (SELECT table_id, row_idx, col_start, span, 700000 AS conf_ppm FROM emc),
      |mg AS (SELECT table_id, row_idx, col_start, MAX(conf_ppm) AS conf_ppm,
      |         COUNT(*) AS n_det, MAX(span) AS span
      |       FROM (SELECT * FROM posc UNION ALL SELECT * FROM pat)
      |       GROUP BY 1, 2, 3),
      |pt AS (SELECT table_id, COUNT(*) AS nm, SUM(conf_ppm) AS sum_conf,
      |         SUM(CASE WHEN n_det = 1 AND span >= 3 THEN 1 ELSE 0 END) AS nh,
      |         SUM(CASE WHEN n_det = 1 AND span < 3 THEN 1 ELSE 0 END) AS nmed
      |       FROM mg GROUP BY 1),
      |j AS (SELECT d.doc_id AS table_id,
      |        CAST(COALESCE(pt.nm, 0) AS BIGINT) AS n_merges,
      |        CAST(CASE WHEN pt.nm IS NULL THEN 1000000
      |             ELSE pt.sum_conf // pt.nm END AS BIGINT) AS merge_conf_ppm,
      |        CAST(COALESCE(pt.nh, 0) AS BIGINT) AS n_high,
      |        CAST(COALESCE(pt.nmed, 0) AS BIGINT) AS n_medium
      |      FROM documents d LEFT JOIN pt ON pt.table_id = d.doc_id)
      |SELECT table_id, n_merges, merge_conf_ppm, n_high, n_medium,
      |  CAST(GREATEST(0, 1000000 - n_high * 50000 - n_medium * 25000) AS BIGINT)
      |    AS verify_conf_ppm,
      |  merge_conf_ppm < 600000 AS needs_vision,
      |  CASE WHEN merge_conf_ppm < 600000 THEN 'vision'
      |       WHEN n_high > 0 THEN 'manual_review'
      |       WHEN GREATEST(0, 1000000 - n_high * 50000 - n_medium * 25000) < 600000
      |         THEN 'low_confidence'
      |       ELSE 'auto' END AS route
      |FROM j ORDER BY table_id""".stripMargin

  // --- etl_column_widths: per-column geometry profile ----------------
  /** The standalone profiling half of `_calculate_column_widths`
    * (merge_detector.py:233-255) a curation run inspects before
    * trusting position-based detection: per (table, col), the cell
    * count, content count, width min/max, the discrete-median typical
    * width, and how many cells exceed the 1.5× merge threshold. Same
    * single (table_id, col_idx) window pass as etl_merge_positions;
    * the summary aggregate reuses the window's partitioning, so the
    * whole profile is still ONE data shuffle. All-integer geometry —
    * exact on both engines.
    */
  val etlColumnWidths: Q = (s, d) => {
    val byCol = Window.partitionBy(col("table_id"), col("col_idx"))
    positionCells(s, d)
      .withColumn("w", col("x_end") - col("x_start"))
      .withColumn("rn", row_number().over(byCol.orderBy(col("w"), col("row_idx"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byCol))
      .withColumn("typical", max(when(col("rn") === expr("n div 2 + 1"), col("w"))).over(byCol))
      .groupBy(col("table_id"), col("col_idx"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("content").isNotNull && length(trim(col("content"))) > 0, 1L)
          .otherwise(0L)).as("n_content"),
        min(col("w")).as("min_w"),
        max(col("w")).as("max_w"),
        max(col("typical")).as("typical_w"),
        sum(when(col("w") * 2 > col("typical") * 3, 1L).otherwise(0L)).as("n_wide"))
      .orderBy(col("table_id"), col("col_idx"))
  }

  val etlColumnWidthsSql: String =
    s"""WITH $cellsSql,
      |$typicalSql
      |SELECT table_id, col_idx,
      |  COUNT(*) AS n_cells,
      |  CAST(SUM(CASE WHEN content IS NOT NULL AND length(trim(content)) > 0
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_content,
      |  min(w) AS min_w, max(w) AS max_w,
      |  max(typical) AS typical_w,
      |  CAST(SUM(CASE WHEN w * 2 > typical * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_wide
      |FROM t GROUP BY table_id, col_idx
      |ORDER BY table_id, col_idx""".stripMargin

  // --- etl_header_spans: header-row merge detection (Method 1) -------
  /** Distributed `_detect_header_merges` (merge_detector.py:99-146):
    * only when the header row has FEWER non-empty cells than the first
    * data row, each header cell's span is 1 + its run of trailing
    * empties, and spans > 1 emit at confidence 0.85. The whole check
    * needs only rows 0-1 of each table (a pushed-down filter before
    * any shuffle), then one window pass keyed by table_id — the
    * per-table n0/n1 counts and the next-content-col scan share the
    * same hashpartitioning(table_id) exchange.
    */
  val etlHeaderSpans: Q = (s, d) => {
    val hasContent = col("content").isNotNull && length(trim(col("content"))) > 0
    val byTable = Window.partitionBy(col("table_id"))
    val wNext = Window.partitionBy(col("table_id"), col("row_idx")).orderBy(col("col_idx"))
      .rowsBetween(1, Window.unboundedFollowing)
    positionCells(s, d).filter(col("row_idx") <= 1)
      .withColumn("n0", sum(when(hasContent && col("row_idx") === 0, 1L).otherwise(0L))
        .over(byTable))
      .withColumn("n1", sum(when(hasContent && col("row_idx") === 1, 1L).otherwise(0L))
        .over(byTable))
      .withColumn("next_c", min(when(hasContent, col("col_idx"))).over(wNext))
      .filter(col("row_idx") === 0 && hasContent && col("n0") < col("n1"))
      .withColumn("span", coalesce(col("next_c"), lit(NCOLS)) - col("col_idx"))
      .filter(col("span") > 1)
      .select(col("table_id"), col("col_idx").as("col_start"),
        (col("col_idx") + col("span") - 1).as("col_end"), col("span"),
        col("content"), lit(0.85).as("confidence"))
      .orderBy(col("table_id"), col("col_start"))
  }

  val etlHeaderSpansSql: String =
    s"""WITH $cellsSql,
      |h AS (SELECT * FROM cells WHERE row_idx <= 1),
      |c AS (SELECT *,
      |        SUM(CASE WHEN row_idx = 0 AND content IS NOT NULL
      |              AND length(trim(content)) > 0 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY table_id) AS n0,
      |        SUM(CASE WHEN row_idx = 1 AND content IS NOT NULL
      |              AND length(trim(content)) > 0 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY table_id) AS n1,
      |        MIN(CASE WHEN content IS NOT NULL AND length(trim(content)) > 0
      |              THEN col_idx END)
      |          OVER (PARTITION BY table_id, row_idx ORDER BY col_idx
      |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c
      |      FROM h)
      |SELECT table_id, col_idx AS col_start,
      |  col_idx + (COALESCE(next_c, $NCOLS) - col_idx) - 1 AS col_end,
      |  COALESCE(next_c, $NCOLS) - col_idx AS span, content,
      |  CAST(0.85 AS DOUBLE) AS confidence
      |FROM c
      |WHERE row_idx = 0 AND content IS NOT NULL AND length(trim(content)) > 0
      |  AND n0 < n1 AND COALESCE(next_c, $NCOLS) - col_idx > 1
      |ORDER BY table_id, col_start""".stripMargin

  // --- etl_merge_resolve: propagate merged content across its span ---
  /** Distributed `resolve_merges` for data rows (merge_detector.py:
    * 303-360): every cell covered by a detected merge takes the
    * merge's content; all other cells keep their own. The merge set is
    * the position detector's; its span cover is exploded to
    * (table, row, col) keys and equi-joined back to the cells — a
    * keyed join whose build side is the (sparse) merge set, never a
    * range/cartesian shape. Covers are clipped to the table width, and
    * the generator guarantees ≤ 1 wide cell per (table, row) (wide
    * residues differ mod 11), so the join cannot duplicate cells.
    */
  val etlMergeResolve: Q = (s, d) => {
    val cover = positionMerges(s, d)
      .select(col("table_id"), col("row_idx"),
        explode(sequence(col("col_start"),
          least(col("col_end"), lit(NCOLS - 1)))).as("col_idx"),
        col("content").as("mcontent"))
    positionCells(s, d)
      .join(cover, Seq("table_id", "row_idx", "col_idx"), "left")
      .select(col("table_id"), col("row_idx"), col("col_idx"), col("content"),
        coalesce(col("mcontent"), col("content")).as("resolved"),
        col("mcontent").isNotNull.as("was_merged"))
      .orderBy(col("table_id"), col("row_idx"), col("col_idx"))
  }

  val etlMergeResolveSql: String =
    s"""WITH $cellsSql,
      |$typicalSql,
      |$posSql,
      |cover AS (SELECT table_id, row_idx,
      |            unnest(generate_series(col_start, LEAST(col_end, ${NCOLS - 1}))) AS col_idx,
      |            content AS mcontent
      |          FROM pos)
      |SELECT c.table_id, c.row_idx, c.col_idx, c.content,
      |  COALESCE(v.mcontent, c.content) AS resolved,
      |  v.mcontent IS NOT NULL AS was_merged
      |FROM cells c LEFT JOIN cover v
      |  ON v.table_id = c.table_id AND v.row_idx = c.row_idx AND v.col_idx = c.col_idx
      |ORDER BY c.table_id, c.row_idx, c.col_idx""".stripMargin

  val queries: Map[String, Q] = Map(
    "etl_merge_positions" -> etlMergePositions,
    "etl_vision_route" -> etlVisionRoute,
    "etl_column_widths" -> etlColumnWidths,
    "etl_header_spans" -> etlHeaderSpans,
    "etl_merge_resolve" -> etlMergeResolve,
    "etl_empty_cell_merges" -> etlEmptyCellMerges)

  val oracles: Map[String, String] = Map(
    "etl_merge_positions" -> etlMergePositionsSql,
    "etl_vision_route" -> etlVisionRouteSql,
    "etl_column_widths" -> etlColumnWidthsSql,
    "etl_header_spans" -> etlHeaderSpansSql,
    "etl_merge_resolve" -> etlMergeResolveSql,
    "etl_empty_cell_merges" -> etlEmptyCellMergesSql)
}
