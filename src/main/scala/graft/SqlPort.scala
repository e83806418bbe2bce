package graft

/** Spark-dialect SQL for the gated keys whose DuckDB oracle text uses a
  * construct Spark SQL does not parse (quantile_cont, unnest/list ops,
  * string_split, epoch_us, ASOF JOIN, `//` integer division, …).
  *
  * Together with the 57 dialect-portable oracle texts that
  * SqlFrontendSpec already replays verbatim, every key in this map
  * gives a SQL-only consumer the engine's gated semantics as plain
  * `spark.sql(...)` text over the SqlFrontend temp views — no Scala
  * API required. SqlFrontendSpec replays each entry against the Scala
  * API plan and requires row-for-row equality, so these texts are
  * conformance-tested, not documentation.
  *
  * Dialect mapping used (DuckDB → Spark): quantile_cont →
  * percentile_cont WITHIN GROUP; json_extract_string →
  * get_json_object; list/array_to_string/list_sort →
  * collect_list/collect_set/sort_array/array_join; unnest → explode;
  * string_split → split; epoch_us/make_timestamp → unix_micros/
  * timestamp_micros; strpos → instr; regexp_replace(…,'g') → Spark's
  * replace-all default; `//` → div; ASOF JOIN → time-conditioned join
  * + ROW_NUMBER pick; WITH RECURSIVE is shared syntax on Spark 4.
  */
object SqlPort {

  /** Gated keys whose DuckDB oracle text is dialect-portable ANSI and
    * runs on Spark unchanged (verified row-for-row by
    * SqlFrontendSpec). Keys outside this set carry a hand-written
    * Spark-dialect port in [[sparkSql]]; [[SqlFrontend.sqlFor]]
    * resolves either.
    */
  val portableOracle: Set[String] = Set(
    "q1_agg", "q3_shipping", "q5_local_supplier", "q6_filter_agg",
    "q_window_rank", "q_window_running", "q_distinct", "q_semi_join",
    "q_anti_join", "q_rollup", "q_pivot", "q_union_dedup", "q_topk_order",
    "q_date_bucket", "q_cross_small",
    "q7_volume", "q10_returns", "q14_promo", "q18_large", "q22_balance",
    "q_stats_agg", "q_cube",
    "q_range_join", "q_null_handling", "q_outer_join",
    "q_set_ops", "q_weighted_avg", "q_math_funcs",
    "q_conditional_agg", "q_grouping_sets",
    "q_correlated", "q_multi_distinct",
    "q4_priority", "q8_market_share", "q9_profit", "q13_order_dist",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty",
    "q19_disjunctive", "q21_waiting", "event_funnel",
    "q_running_distinct",
    "etl_batch_stats", "etl_confidence", "etl_double_verify",
    "etl_infer_category", "etl_merge_upsert", "etl_review_queue",
    "etl_scd2", "etl_schema_evolve",
    "q_bucket_join", "q_skew_join", "q_topk_group",
    "src_partitioned_scan", "stream_interval_join", "stream_upsert_sink")

  /** Shared field-verify CTE chain (mirrors the DuckDB oracle's reuse
    * across etl_field_verify / etl_export_csv / etl_review_payload):
    * synthetic primary/reference field pairs → numeric-or-text match →
    * penalty → per-doc confidence + status.
    */
  private val fieldVerifyCtes: String =
    """f AS (
      |  SELECT p_partkey AS doc, lower(p_brand) AS paraml, 'value' AS fieldl,
      |    CAST(p_retailprice AS STRING) AS vv,
      |    CASE WHEN p_partkey % 5 = 0 THEN CAST(p_retailprice * CAST(1.03 AS DOUBLE) AS STRING)
      |         ELSE CAST(p_retailprice AS STRING) END AS rv
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey, lower(p_brand), 'unit', 'mV', 'millivolt' FROM part),
      |c AS (
      |  SELECT doc, vv, rv,
      |    (fieldl || '|' || paraml) RLIKE 'vin|vout|iout|iq|efficiency|power|frequency' AS crit,
      |    TRY_CAST(NULLIF(regexp_replace(trim(vv), '[^0-9.eE+-]', ''), '') AS DOUBLE) AS n1,
      |    TRY_CAST(NULLIF(regexp_replace(trim(rv), '[^0-9.eE+-]', ''), '') AS DOUBLE) AS n2,
      |    CASE WHEN lower(trim(vv)) IN ('mv', 'millivolt')
      |              AND lower(trim(rv)) IN ('mv', 'millivolt') THEN TRUE
      |         ELSE trim(vv) = trim(rv) END AS unit_eq,
      |    regexp_replace(regexp_replace(lower(trim(vv)), '\\s+', ' '), '[.,;:!?]', '') =
      |    regexp_replace(regexp_replace(lower(trim(rv)), '\\s+', ' '), '[.,;:!?]', '') AS text_eq
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
      |  FROM m),
      |fvfull AS (
      |  SELECT doc, COUNT(*) AS n_fields,
      |    CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts,
      |    greatest(0.0, least(1.0, CAST(CAST(1.00 AS DECIMAL(3,2)) - SUM(pen) AS DOUBLE))) AS confidence,
      |    CASE WHEN max(CASE WHEN NOT is_match AND crit AND rel_diff > 0.1
      |                       THEN 1 ELSE 0 END) = 1 THEN 'needs_review'
      |         WHEN greatest(0.0, least(1.0, CAST(CAST(1.00 AS DECIMAL(3,2)) - SUM(pen) AS DOUBLE))) < 0.60
      |              THEN 'conflict'
      |         ELSE 'verified' END AS status
      |  FROM p GROUP BY doc)""".stripMargin

  /** Shared param-pivot CTE chain (etl_param_pivot / etl_review_payload):
    * wide synthetic key/value params → long (param, value, unit) rows.
    */
  private val paramPivotCtes: String =
    """flat AS (
      |  SELECT p_partkey AS doc, kv.key AS key, kv.value AS value FROM part
      |  LATERAL VIEW explode(array(
      |    named_struct('key', 'vin_min',  'value', CAST(p_size AS STRING)),
      |    named_struct('key', 'vin_typ',  'value', CAST(p_size + 2 AS STRING)),
      |    named_struct('key', 'vin_max',  'value', CAST(p_size * 2 AS STRING)),
      |    named_struct('key', 'vin_unit', 'value', 'V'),
      |    named_struct('key', 'iout_max', 'value', CAST(p_retailprice AS STRING)))) t AS kv),
      |vals AS (
      |  SELECT doc, key AS param,
      |    substring(key, 1, length(key) - 4) || '_unit' AS unit_key, value
      |  FROM flat WHERE key LIKE '%#_min' ESCAPE '#' OR key LIKE '%#_typ' ESCAPE '#' OR key LIKE '%#_max' ESCAPE '#'),
      |units AS (
      |  SELECT doc, key AS unit_key, value AS unit FROM flat WHERE key LIKE '%#_unit' ESCAPE '#'),
      |pivoted AS (
      |  SELECT doc, param, value, unit FROM (
      |    SELECT v.doc, v.param, v.value, u.unit
      |    FROM vals v LEFT JOIN units u ON v.doc = u.doc AND v.unit_key = u.unit_key
      |    UNION ALL
      |    SELECT doc, substring(unit_key, 1, length(unit_key) - 5) AS param, NULL AS value, unit
      |    FROM units) z)""".stripMargin

  /** Shared diagram-detection CTE chain (diagram_topology / _pinout /
    * _appcircuit): synthetic page text → classified diagram rows.
    * The dtype alias can't be referenced in WHERE in Spark, so the
    * classification runs in a subquery.
    */
  private val diagramCtes: String =
    """base AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 2 = 0
      |         THEN element_at(array('block diagram','functional diagram','typical application','application circuit','pin configuration','package'),
      |                         CAST(doc_id % 6 AS INT) + 1) || ' ' || text
      |         ELSE text END AS page_text
      |  FROM documents),
      |diag AS (
      |  SELECT * FROM (
      |    SELECT 'diag_p' || CAST(doc_id AS STRING) AS diagram_id, doc_id,
      |      CASE WHEN lower(page_text) RLIKE 'block\\s*diagram' THEN 'block_diagram'
      |           WHEN lower(page_text) RLIKE 'functional\\s*diagram' THEN 'block_diagram'
      |           WHEN lower(page_text) RLIKE 'typical\\s*application' THEN 'typical_app'
      |           WHEN lower(page_text) RLIKE 'application\\s*circuit' THEN 'typical_app'
      |           WHEN lower(page_text) RLIKE 'pin\\s*configuration' THEN 'pinout'
      |           WHEN lower(page_text) RLIKE 'package' THEN 'pinout'
      |           ELSE NULL END AS dtype
      |    FROM base) x
      |  WHERE dtype IS NOT NULL)""".stripMargin

  /** Shared table-assembly CTE chain (etl_table_assemble /
    * etl_review_payload): synthetic page text → assembled table rows
    * with normalized headers and confidence.
    */
  private val tableAssembleCtes: String =
    """aug AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |         THEN element_at(array('Electrical Characteristics', 'Absolute Maximum Ratings', 'Recommended Operating Conditions', 'Thermal Information', 'Pin Functions', 'Device Comparison'),
      |                         CAST(doc_id % 6 AS INT) + 1) || ' ' || coalesce(text, '')
      |         ELSE coalesce(text, '') END AS page_text,
      |    doc_id % 3 AS table_idx
      |  FROM documents),
      |cells AS (
      |  SELECT *, split(page_text, ' ') AS toks,
      |    CASE WHEN doc_id % 4 = 0
      |         THEN array('Parameter', 'Symbol', 'min.', 'Typical', 'MAX')
      |         ELSE slice(split(page_text, ' '), 1, 5) END AS header_cells
      |  FROM aug),
      |normed AS (
      |  SELECT *, transform(header_cells, c ->
      |    CASE WHEN length(lower(trim(c))) = 0 THEN 'Unknown'
      |         WHEN lower(trim(c)) RLIKE 'param' THEN 'Parameter'
      |         WHEN lower(trim(c)) RLIKE 'symbol' THEN 'Symbol'
      |         WHEN lower(trim(c)) RLIKE 'test.*cond|condition' THEN 'Test_Conditions'
      |         WHEN lower(trim(c)) RLIKE '^min' THEN 'Min'
      |         WHEN lower(trim(c)) RLIKE '^typ' THEN 'Typ'
      |         WHEN lower(trim(c)) RLIKE '^max' THEN 'Max'
      |         WHEN lower(trim(c)) RLIKE 'unit' THEN 'Unit'
      |         WHEN lower(trim(c)) RLIKE 'desc' THEN 'Description'
      |         ELSE trim(c) END) AS headers
      |  FROM cells),
      |assembled AS (
      |  SELECT 'table_p' || CAST(doc_id AS STRING) || '_' || CAST(table_idx AS STRING) AS table_id,
      |    doc_id AS page_num,
      |    CASE WHEN lower(page_text) RLIKE 'electrical\\s*characteristics' THEN 'Electrical Characteristics'
      |         WHEN lower(page_text) RLIKE 'absolute\\s*maximum\\s*ratings' THEN 'Absolute Maximum Ratings'
      |         WHEN lower(page_text) RLIKE 'recommended\\s*operating\\s*conditions' THEN 'Recommended Operating Conditions'
      |         WHEN lower(page_text) RLIKE 'thermal\\s*information' THEN 'Thermal Information'
      |         WHEN lower(page_text) RLIKE 'pin\\s*functions' THEN 'Pin Functions'
      |         WHEN lower(page_text) RLIKE 'device\\s*comparison' THEN 'Device Comparison'
      |         ELSE 'Table ' || CAST(table_idx + 1 AS STRING) END AS title,
      |    array_join(headers, ',') AS headers,
      |    greatest(0, CAST(ceil(CAST(size(toks) - 5 AS DOUBLE) / 5) AS BIGINT)) AS n_rows,
      |    CASE WHEN size(array_intersect(array_distinct(headers),
      |      array('Parameter', 'Min', 'Typ', 'Max', 'Unit'))) >= 3
      |      THEN CAST(0.9 AS DOUBLE) ELSE CAST(0.6 AS DOUBLE) END AS confidence
      |  FROM normed)""".stripMargin

  /** Shared merge-detector cell frame (EtlOps3 family): synthetic
    * 6×4 cell grid per document with deterministic content and x
    * extents (the occasional double/triple-width merged cell).
    */
  private val mergeCellsCte: String =
    """cells AS (
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
      |  CROSS JOIN (SELECT explode(sequence(0, 5)) AS row_idx) r
      |  CROSS JOIN (SELECT explode(sequence(0, 3)) AS col_idx) c)""".stripMargin

  /** Typical-width profile over the cell frame (discrete median via
    * row_number = n div 2 + 1).
    */
  private val typicalCtes: String =
    """wd AS (SELECT *, x_end - x_start AS w FROM cells),
      |r AS (SELECT *,
      |        row_number() OVER (PARTITION BY table_id, col_idx ORDER BY w, row_idx) AS rn,
      |        COUNT(*) OVER (PARTITION BY table_id, col_idx) AS n
      |      FROM wd),
      |t AS (SELECT *, MAX(CASE WHEN rn = n div 2 + 1 THEN w END)
      |        OVER (PARTITION BY table_id, col_idx) AS typical FROM r)""".stripMargin

  /** Position/width merge candidates (1.5× threshold as w*2 > typical*3). */
  private val posCte: String =
    """pos AS (SELECT table_id, row_idx, col_idx AS col_start,
      |          col_idx + (w div typical) - 1 AS col_end, w div typical AS span, content
      |        FROM t
      |        WHERE content IS NOT NULL AND length(trim(content)) > 0
      |          AND w * 2 > typical * 3 AND w div typical > 1)""".stripMargin

  /** Empty-cell-pattern merge candidates (category-header-gated,
    * span 2–4, 0.70 confidence arm).
    */
  private val emcCtes: String =
    """nx AS (SELECT *,
      |         MIN(CASE WHEN content IS NOT NULL AND length(trim(content)) > 0
      |               THEN col_idx END)
      |           OVER (PARTITION BY table_id, row_idx ORDER BY col_idx
      |                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c
      |       FROM cells),
      |emc AS (SELECT table_id, row_idx, col_idx AS col_start,
      |          col_idx + (COALESCE(next_c, 4) - col_idx) - 1 AS col_end,
      |          COALESCE(next_c, 4) - col_idx AS span, trim(content) AS content
      |        FROM nx
      |        WHERE content IS NOT NULL AND length(trim(content)) > 0
      |          AND COALESCE(next_c, 4) - col_idx BETWEEN 2 AND 4
      |          AND (lower(trim(content)) RLIKE '^(input|output|power|thermal|timing|electrical)'
      |          OR lower(trim(content)) RLIKE 'characteristics$'
      |          OR lower(trim(content)) RLIKE '^(absolute|recommended|operating)'
      |          OR lower(trim(content)) RLIKE 'conditions$'
      |          OR lower(trim(content)) RLIKE '^(dc|ac)\\s'
      |          OR CAST(length(regexp_replace(trim(content), '[^A-Za-z]', '')) AS DOUBLE)
      |             / length(trim(content)) > 0.8))""".stripMargin

  /** Shared md5-minhash CTE chain (dedup_minhash_exact /
    * dedup_ngram_jaccard_exact): trigram shingles → 64-slot md5-seeded
    * minhash signatures (DuckDB's HUGEINT mixer re-expressed in exact
    * DECIMAL(38,0) arithmetic) → identical-signature star + banded
    * candidate pairs with signature-agreement estimates.
    */
  private val minhashCtes: String =
    """tk AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |         array_distinct(CASE WHEN size(w) < 3 THEN array(array_join(w, ' '))
      |           ELSE transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))
      |           END) AS s
      |       FROM tk),
      |hv AS (SELECT doc_id,
      |         CAST(conv(substr(md5(shingle), 1, 15), 16, 10) AS BIGINT) AS h
      |       FROM sh LATERAL VIEW explode(s) t AS shingle),
      |slot AS (SELECT doc_id, i,
      |           CAST((CAST(i + 1 AS DECIMAL(38,0)) * 2654435761 * CAST(h AS DECIMAL(38,0))
      |                 + (i * 40503 + 2166136261)) % 2305843009213693951
      |                AS BIGINT) AS v
      |         FROM hv CROSS JOIN (SELECT explode(sequence(0, 63)) AS i) ii),
      |ms AS (SELECT doc_id, i, MIN(v) AS mv FROM slot GROUP BY doc_id, i),
      |sg AS (SELECT doc_id,
      |         transform(array_sort(collect_list(struct(i, mv))), x -> x.mv) AS sig
      |       FROM ms GROUP BY doc_id),
      |reps AS (SELECT sig, MIN(doc_id) AS rep, COUNT(*) AS cnt FROM sg GROUP BY sig),
      |bd AS (SELECT rep, sig, b, slice(sig, b * 4 + 1, 4) AS bh
      |       FROM reps CROSS JOIN (SELECT explode(sequence(0, 15)) AS b) bb),
      |cand AS (SELECT DISTINCT x.rep AS ra, y.rep AS rb
      |         FROM bd x JOIN bd y ON x.b = y.b AND x.bh = y.bh AND x.rep < y.rep),
      |crossp AS (SELECT c.ra AS doc_a, c.rb AS doc_b,
      |             CAST(size(filter(sequence(1, 64),
      |               i -> element_at(sa.sig, i) = element_at(sb.sig, i))) AS DOUBLE) / 64 AS est_jaccard
      |           FROM cand c JOIN reps sa ON c.ra = sa.rep
      |                       JOIN reps sb ON c.rb = sb.rep),
      |star AS (SELECT r.rep AS doc_a, s.doc_id AS doc_b,
      |           CAST(1.0 AS DOUBLE) AS est_jaccard
      |         FROM sg s JOIN reps r ON s.sig = r.sig
      |         WHERE r.cnt > 1 AND s.doc_id <> r.rep),
      |mh_out AS (SELECT doc_a, doc_b, est_jaccard
      |           FROM (SELECT * FROM crossp UNION ALL SELECT * FROM star) u)""".stripMargin

  /** 60-bit simhash in Spark dialect; the 60 per-bit balance sums and
    * the 60-term bit reassembly are generated, not hand-copied.
    */
  private val simhashExactSql: String = {
    val sums = (0 until 60)
      .map(k => s"SUM(CASE WHEN shiftright(h, $k) & 1 = 1 THEN 1 ELSE -1 END) AS v$k")
      .mkString(",\n       ")
    val bits = (0 until 60)
      .map(k => s"CASE WHEN v$k > 0 THEN ${1L << k} ELSE 0 END")
      .mkString(" +\n        ")
    s"""WITH n AS (SELECT doc_id,
      |             regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS t
      |           FROM documents),
      |tok AS (SELECT DISTINCT doc_id, w
      |        FROM (SELECT doc_id, explode(split(t, ' ')) AS w FROM n) x),
      |h AS (SELECT doc_id,
      |        CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT) AS h
      |      FROM tok),
      |v AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
      |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS sim FROM v),
      |reps AS (SELECT sim, min(doc_id) AS rep, COUNT(*) AS cnt FROM sig GROUP BY sim),
      |ch AS (SELECT sim, j, shiftright(sim, j * 16) & 65535 AS cv
      |       FROM reps CROSS JOIN (SELECT explode(array(0, 1, 2, 3)) AS j) c),
      |sp AS (SELECT DISTINCT x.sim AS sim_a, y.sim AS sim_b
      |       FROM ch x JOIN ch y ON x.j = y.j AND x.cv = y.cv AND x.sim < y.sim),
      |hp AS (SELECT sim_a, sim_b,
      |         CAST(bit_count(sim_a ^ sim_b) AS INT) AS hamming
      |       FROM sp WHERE bit_count(sim_a ^ sim_b) <= 16),
      |crossp AS (SELECT least(ra.rep, rb.rep) AS doc_a,
      |            greatest(ra.rep, rb.rep) AS doc_b, hp.hamming
      |          FROM hp JOIN reps ra ON hp.sim_a = ra.sim
      |                  JOIN reps rb ON hp.sim_b = rb.sim),
      |star AS (SELECT r.rep AS doc_a, s.doc_id AS doc_b, CAST(0 AS INT) AS hamming
      |         FROM sig s JOIN reps r ON s.sim = r.sim
      |         WHERE r.cnt > 1 AND s.doc_id <> r.rep)
      |SELECT doc_a, doc_b, hamming
      |FROM (SELECT * FROM crossp UNION ALL SELECT * FROM star) u
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Morton/Z-order interleave of the low 16 bits of (zx, zy),
    * generated as shiftleft/shiftright terms (DuckDB spells it with
    * `>>`/`<<` operators).
    */
  private val zInterleave: String = (0 until 16).map { k =>
    s"shiftleft(shiftright(zx, $k) & 1, ${2 * k}) + shiftleft(shiftright(zy, $k) & 1, ${2 * k + 1})"
  }.mkString("(", "\n      + ", ")")

  /** Spark-dialect unroll of the BPE training loop (same structure as
    * the generated DuckDB oracle in TrainOps3.bpeTrainMergesSql, same
    * two-pass padded replace semantics). No MATERIALIZED keyword:
    * Spark keeps multi-referenced deterministic CTEs as shared
    * CTERelationDefs (physical subplan reuse), so the s_k chain does
    * not inline exponentially the way DuckDB's default would.
    * WHERE-before-LATERAL-VIEW ordering: the size guard sits in a
    * subquery because Spark applies WHERE after generators.
    */
  private def bpeChainSpark(withFinalSeq: Boolean, trainWhere: String = ""): String = {
    val K = operators.TrainOps3.BPE_MERGES
    val iters = (0 until K).map { k =>
      val pat = "COALESCE(' ' || bp.pair || ' ', chr(1))"
      val rep = "COALESCE(' ' || bp.merged || ' ', chr(1))"
      val head =
        s"""p$k AS (SELECT pair, SUM(freq) AS c FROM (
           |  SELECT freq, pair
           |  FROM (SELECT freq, split(seq, ' ') AS s FROM s$k WHERE size(split(seq, ' ')) >= 2) t
           |  LATERAL VIEW explode(transform(sequence(1, size(s) - 1),
           |    i -> concat(element_at(s, CAST(i AS INT)), ' ', element_at(s, CAST(i + 1 AS INT))))) pv AS pair
           |  ) GROUP BY pair),
           |b$k AS (SELECT pair, replace(pair, ' ', '') AS merged, c
           |        FROM p$k ORDER BY c DESC, pair LIMIT 1)""".stripMargin
      if (k == K - 1 && !withFinalSeq) head
      else head +
        s""",
           |s${k + 1} AS (SELECT freq,
           |  trim(replace(replace(' ' || seq || ' ', $pat, $rep), $pat, $rep)) AS seq
           |  FROM s$k LEFT JOIN b$k bp ON true)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT word, COUNT(*) AS freq
       |  FROM (SELECT explode(split(text, ' ')) AS word FROM documents$trainWhere)
       |  WHERE length(word) >= 1 GROUP BY word),
       |s0 AS (SELECT freq, array_join(filter(split(word, ''), x -> x <> ''), ' ') AS seq FROM w),
       |$iters""".stripMargin
  }

  private val bpeTrainMergesSpark: String = {
    val K = operators.TrainOps3.BPE_MERGES
    val union = (0 until K).map(k =>
      s"SELECT ${k + 1} AS k, pair, merged, c FROM b$k").mkString("\nUNION ALL ")
    s"""${bpeChainSpark(withFinalSeq = false)}
       |SELECT CAST(k AS BIGINT) AS rank, pair, merged, CAST(c AS BIGINT) AS c
       |FROM ($union)
       |ORDER BY rank""".stripMargin
  }

  private val bpeTokenizeSpark: String =
    s"""${bpeChainSpark(withFinalSeq = true)}
       |SELECT token, CAST(SUM(freq) AS BIGINT) AS c
       |FROM (SELECT freq, explode(split(seq, ' ')) AS token FROM s${operators.TrainOps3.BPE_MERGES})
       |GROUP BY token
       |ORDER BY c DESC, token LIMIT 25""".stripMargin

  /** Spark-dialect unroll of the train-on-complement/serve-on-batch
    * flow: the same chain restricted to the training slice, the batch
    * application chain (one LEFT JOIN b_k per merge, COALESCE-chr(1)
    * no-op past exhaustion), and the fertility/OOV rollup.
    */
  private val bpeApplyBatchSpark: String = {
    val K = operators.TrainOps3.BPE_MERGES
    val applyIters = (0 until K).map { k =>
      val pat = "COALESCE(' ' || bp.pair || ' ', chr(1))"
      val rep = "COALESCE(' ' || bp.merged || ' ', chr(1))"
      s"""a${k + 1} AS (SELECT source,
         |  trim(replace(replace(' ' || seq || ' ', $pat, $rep), $pat, $rep)) AS seq
         |  FROM a$k LEFT JOIN b$k bp ON true)""".stripMargin
    }.mkString(",\n")
    s"""${bpeChainSpark(withFinalSeq = true, trainWhere = " WHERE doc_id % 7 <> 3")},
       |vset AS (SELECT DISTINCT explode(split(seq, ' ')) AS vtok FROM s$K),
       |bwords AS (SELECT source, word FROM (
       |  SELECT source, explode(split(text, ' ')) AS word
       |  FROM documents WHERE doc_id % 7 = 3) t WHERE length(word) >= 1),
       |a0 AS (SELECT source, array_join(filter(split(word, ''), x -> x <> ''), ' ') AS seq FROM bwords),
       |$applyIters,
       |btok AS (SELECT source, explode(split(seq, ' ')) AS tok FROM a$K),
       |tc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM btok LEFT JOIN vset ON tok = vtok GROUP BY source),
       |wc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_words FROM bwords GROUP BY source)
       |SELECT wc.source, n_words, n_tokens,
       |  n_tokens * 1000000 DIV n_words AS fertility_ppm,
       |  n_oov,
       |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
       |       ELSE n_oov * 1000000 DIV n_tokens END AS oov_ppm
       |FROM wc JOIN tc USING (source)
       |ORDER BY wc.source""".stripMargin
  }

  /** Spark-dialect BM25 scoring chain shared by bm25_retrieval and
    * bm25_index (the index is lossless, so one conformance text covers
    * both keys). Keeps the DuckDB oracle's exact IEEE operation
    * sequence so the snapped micros agree bit-for-bit.
    */
  private def bm25SparkPort: String = {
    val vals = operators.TrainOps5.BM25_QUERIES
      .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
    val k1 = operators.TrainOps5.BM25_K1
    val b = operators.TrainOps5.BM25_B
    s"""WITH queries AS (SELECT CAST(query_id AS BIGINT) AS query_id, qtext
       |  FROM VALUES $vals AS t(query_id, qtext)),
       |qterms AS (SELECT query_id, explode(split(qtext, ' ')) AS term FROM queries),
       |terms AS (SELECT DISTINCT term FROM qterms),
       |docs AS (SELECT doc_id,
       |  filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |dld AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS dl FROM docs),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS t_tokens FROM dld),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM (SELECT doc_id, dl, explode(toks) AS token FROM dld) t
       |  JOIN terms ON token = term
       |  GROUP BY doc_id, token),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
       |scored AS (SELECT tf.doc_id, tf.token,
       |    CAST(floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |      ((tf * ($k1 + 1.0)) / (tf + ($k1 * ((1.0 - $b) +
       |        (($b * dl) / (CAST(t_tokens AS DOUBLE) / n_docs))))))) * 1e6 + 0.5) AS BIGINT) AS w_micros
       |  FROM tf JOIN dfreq USING (token), stats),
       |pairs AS (SELECT query_id, doc_id,
       |    CAST(sum(w_micros) AS BIGINT) AS score_micros,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit
       |  FROM scored JOIN qterms ON scored.token = qterms.term
       |  GROUP BY query_id, doc_id),
       |ranked AS (SELECT query_id, doc_id, score_micros, n_terms_hit,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micros DESC, doc_id) AS BIGINT) AS rank
       |  FROM pairs)
       |SELECT query_id, rank, doc_id, score_micros, n_terms_hit
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  private val basePorts: Map[String, String] = Map(
    "mm_metadata" ->
      """WITH media AS (
        |  SELECT doc_id, text,
        |    CAST(doc_id % 64 + 16 AS INT) AS width,
        |    CAST(doc_id % 48 + 16 AS INT) AS height,
        |    element_at(array('png', 'jpeg', 'wav'), CAST(doc_id % 3 + 1 AS INT)) AS fmt
        |  FROM documents)
        |SELECT fmt, COUNT(*) AS n,
        |  CAST(SUM(octet_length(text)) AS BIGINT) AS sum_bytes,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads,
        |  min(width) AS min_w, max(width) AS max_w,
        |  min(height) AS min_h, max(height) AS max_h
        |FROM media GROUP BY fmt ORDER BY fmt""".stripMargin,

    "mm_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    doc_id % 2 * 6 + 24 AS fps,
        |    n_chars % 111 + 10 AS dur_s,
        |    doc_id % 64 + 16 AS width,
        |    doc_id % 48 + 16 AS height
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, fps, dur_s * fps AS n_frames,
        |    greatest(1, dur_s * fps div 8) AS step,
        |    width * height * 3 AS frame_bytes
        |  FROM meta),
        |x AS (
        |  SELECT doc_id, fps, frame_bytes, frame_idx
        |  FROM f LATERAL VIEW explode(sequence(0, n_frames - 1, step)) t AS frame_idx)
        |SELECT doc_id, frame_idx,
        |  frame_idx * 1000 div fps AS ts_ms,
        |  frame_idx * frame_bytes AS byte_off
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,

    "mm_audio_window" ->
      """WITH meta AS (
        |  SELECT doc_id,
        |    doc_id % 2 * 28100 + 16000 AS sr,
        |    n_chars % 29001 + 1000 AS dur_ms
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, sr,
        |    dur_ms * sr div 1000 - sr AS lim,
        |    greatest(sr div 2, (dur_ms * sr div 1000 - sr + 14) div 15) AS hop
        |  FROM meta),
        |x AS (
        |  SELECT doc_id, sr, start_sample
        |  FROM w LATERAL VIEW explode(sequence(0, lim, hop)) t AS start_sample)
        |SELECT doc_id, start_sample,
        |  start_sample * 1000 div sr AS ts_ms,
        |  start_sample * 2 AS byte_off
        |FROM x ORDER BY doc_id, start_sample""".stripMargin,

    "etl_redact" ->
      """SELECT event_id,
        |  regexp_replace(regexp_replace(regexp_replace(props,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '[EMAIL]'),
        |    '\\+?[0-9][0-9() -]{6,}[0-9]', '[PHONE]'),
        |    '[0-9]+', '[NUM]') AS redacted,
        |  CAST(size(regexp_extract_all(props, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', 0)) AS BIGINT) AS n_email,
        |  CAST(size(regexp_extract_all(props, '\\+?[0-9][0-9() -]{6,}[0-9]', 0)) AS BIGINT) AS n_phone,
        |  CAST(size(regexp_extract_all(props, '[0-9]+', 0)) AS BIGINT) AS n_num
        |FROM events ORDER BY event_id""".stripMargin,

    "profile_table" ->
      """WITH s AS (
        |  SELECT kv.col_name, kv.v FROM orders
        |  LATERAL VIEW explode(array(
        |    named_struct('col_name', 'o_orderkey', 'v', CAST(o_orderkey AS STRING)),
        |    named_struct('col_name', 'o_custkey', 'v', CAST(o_custkey AS STRING)),
        |    named_struct('col_name', 'o_orderstatus', 'v', CAST(o_orderstatus AS STRING)),
        |    named_struct('col_name', 'o_totalprice', 'v', CAST(o_totalprice AS STRING)),
        |    named_struct('col_name', 'o_orderpriority', 'v', CAST(o_orderpriority AS STRING))
        |  )) t AS kv)
        |SELECT col_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
        |  min(v) AS min_v,
        |  max(v) AS max_v
        |FROM s GROUP BY col_name ORDER BY col_name""".stripMargin,

    "src_format_roundtrip" ->
      """WITH slice AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag,
        |    date_format(l_shipdate, 'yyyy-MM-dd') AS ship_day
        |  FROM lineitem WHERE l_orderkey % 1000 = 0)
        |SELECT format, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(ship_day) AS first_day, max(ship_day) AS last_day,
        |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flags
        |FROM slice CROSS JOIN (SELECT explode(array('csv', 'json', 'orc')) AS format) fmts
        |GROUP BY format ORDER BY format""".stripMargin,

    "src_zorder_layout" ->
      s"""WITH z AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |    $zInterleave AS zval
        |  FROM (SELECT o_orderkey, o_custkey, o_orderdate,
        |          o_custkey % 65536 AS zx,
        |          datediff(o_orderdate, DATE '1992-01-01') % 65536 AS zy
        |        FROM orders) t),
        |tiled AS (SELECT o_custkey, o_orderdate, zval div 131072 AS tile FROM z),
        |agg AS (
        |  SELECT COUNT(*) AS n_all,
        |    CAST(COUNT(DISTINCT tile) AS BIGINT) AS t_all,
        |    CAST(SUM(CASE WHEN o_custkey BETWEEN 100 AND 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_cust,
        |    CAST(COUNT(DISTINCT CASE WHEN o_custkey BETWEEN 100 AND 200 THEN tile END) AS BIGINT) AS t_cust,
        |    CAST(SUM(CASE WHEN o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31' THEN 1 ELSE 0 END) AS BIGINT) AS n_date,
        |    CAST(COUNT(DISTINCT CASE WHEN o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-03-31' THEN tile END) AS BIGINT) AS t_date
        |  FROM tiled)
        |SELECT * FROM (
        |  SELECT 'all_rows' AS predicate, n_all AS n_rows, t_all AS tiles_touched FROM agg
        |  UNION ALL
        |  SELECT 'custkey_100_200', n_cust, t_cust FROM agg
        |  UNION ALL
        |  SELECT 'q1_1996', n_date, t_date FROM agg) u
        |ORDER BY predicate""".stripMargin,

    "etl_merge_positions" ->
      s"""WITH $mergeCellsCte,
        |$typicalCtes,
        |$posCte
        |SELECT table_id, row_idx, col_start, col_end, span, content,
        |  CAST(0.9 AS DOUBLE) AS confidence
        |FROM pos
        |ORDER BY table_id, row_idx, col_start""".stripMargin,

    "etl_header_spans" ->
      s"""WITH $mergeCellsCte,
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
        |  col_idx + (COALESCE(next_c, 4) - col_idx) - 1 AS col_end,
        |  COALESCE(next_c, 4) - col_idx AS span, content,
        |  CAST(0.85 AS DOUBLE) AS confidence
        |FROM c
        |WHERE row_idx = 0 AND content IS NOT NULL AND length(trim(content)) > 0
        |  AND n0 < n1 AND COALESCE(next_c, 4) - col_idx > 1
        |ORDER BY table_id, col_start""".stripMargin,

    "etl_merge_resolve" ->
      s"""WITH $mergeCellsCte,
        |$typicalCtes,
        |$posCte,
        |cover AS (SELECT table_id, row_idx, col_idx, mcontent FROM (
        |            SELECT table_id, row_idx, content AS mcontent,
        |              col_start, LEAST(col_end, 3) AS cend
        |            FROM pos) p
        |          LATERAL VIEW explode(sequence(col_start, cend)) t AS col_idx)
        |SELECT c.table_id, c.row_idx, c.col_idx, c.content,
        |  COALESCE(v.mcontent, c.content) AS resolved,
        |  v.mcontent IS NOT NULL AS was_merged
        |FROM cells c LEFT JOIN cover v
        |  ON v.table_id = c.table_id AND v.row_idx = c.row_idx AND v.col_idx = c.col_idx
        |ORDER BY c.table_id, c.row_idx, c.col_idx""".stripMargin,

    "etl_column_widths" ->
      s"""WITH $mergeCellsCte,
        |$typicalCtes
        |SELECT table_id, col_idx,
        |  COUNT(*) AS n_cells,
        |  CAST(SUM(CASE WHEN content IS NOT NULL AND length(trim(content)) > 0
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_content,
        |  min(w) AS min_w, max(w) AS max_w,
        |  max(typical) AS typical_w,
        |  CAST(SUM(CASE WHEN w * 2 > typical * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_wide
        |FROM t GROUP BY table_id, col_idx
        |ORDER BY table_id, col_idx""".stripMargin,

    "etl_vision_route" ->
      s"""WITH $mergeCellsCte,
        |$typicalCtes,
        |$posCte,
        |posc AS (SELECT table_id, row_idx, col_start, span, 900000 AS conf_ppm FROM pos),
        |$emcCtes,
        |pat AS (SELECT table_id, row_idx, col_start, span, 700000 AS conf_ppm FROM emc),
        |mg AS (SELECT table_id, row_idx, col_start, MAX(conf_ppm) AS conf_ppm,
        |         COUNT(*) AS n_det, MAX(span) AS span
        |       FROM (SELECT * FROM posc UNION ALL SELECT * FROM pat) u
        |       GROUP BY 1, 2, 3),
        |pt AS (SELECT table_id, COUNT(*) AS nm, SUM(conf_ppm) AS sum_conf,
        |         SUM(CASE WHEN n_det = 1 AND span >= 3 THEN 1 ELSE 0 END) AS nh,
        |         SUM(CASE WHEN n_det = 1 AND span < 3 THEN 1 ELSE 0 END) AS nmed
        |       FROM mg GROUP BY 1),
        |j AS (SELECT d.doc_id AS table_id,
        |        CAST(COALESCE(pt.nm, 0) AS BIGINT) AS n_merges,
        |        CAST(CASE WHEN pt.nm IS NULL THEN 1000000
        |             ELSE pt.sum_conf div pt.nm END AS BIGINT) AS merge_conf_ppm,
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
        |FROM j ORDER BY table_id""".stripMargin,

    "etl_empty_cell_merges" ->
      s"""WITH $mergeCellsCte,
        |$emcCtes
        |SELECT table_id, row_idx, col_start, col_end, span, content,
        |  CAST(0.7 AS DOUBLE) AS confidence
        |FROM emc
        |ORDER BY table_id, row_idx, col_start""".stripMargin,

    "etl_field_verify" ->
      s"""WITH $fieldVerifyCtes
        |SELECT doc, n_fields, n_conflicts, confidence, status
        |FROM fvfull ORDER BY doc""".stripMargin,

    "etl_param_pivot" ->
      s"""WITH $paramPivotCtes
        |SELECT doc, param, value, unit FROM pivoted ORDER BY doc, param""".stripMargin,

    "etl_export_import" ->
      """WITH wide AS (
        |  SELECT p_partkey AS doc,
        |    CAST(p_size AS STRING) AS vin_min,
        |    CAST(p_size * 2 AS STRING) AS vin_max,
        |    CAST(p_retailprice AS STRING) AS iout_max,
        |    p_brand
        |  FROM part),
        |meta AS (
        |  SELECT *,
        |    CASE WHEN doc % 4 = 0 THEN CAST(400 + doc % 100 AS STRING) END AS freq,
        |    CASE WHEN doc % 4 = 1 THEN CAST(80 + doc % 15 AS STRING) END AS eff,
        |    CASE WHEN doc % 4 = 2 THEN CAST(doc % 150 AS STRING) END AS iq,
        |    CASE WHEN doc % 5 = 0 THEN 99 ELSE 100 END AS conf
        |  FROM wide)
        |SELECT
        |  upper(regexp_replace('p' || CAST(doc AS STRING) || '_datasheet', '_datasheet$', '')) AS `MPN`,
        |  p_brand AS `Manufacturer`,
        |  CASE WHEN freq IS NOT NULL THEN 'Buck Converter'
        |       WHEN eff IS NOT NULL THEN 'DC-DC Converter'
        |       WHEN iq IS NOT NULL AND CAST(iq AS BIGINT) < 100 THEN 'LDO'
        |       ELSE 'Unknown' END AS `Category`,
        |  '' AS `Description`,
        |  vin_min AS `Vin_min`,
        |  vin_max AS `Vin_max`,
        |  '' AS `Vout_min`,
        |  '' AS `Vout_max`,
        |  iout_max AS `Iout_max`,
        |  coalesce(iq, '') AS `Iq_typ`,
        |  coalesce(eff, '') AS `Efficiency_typ`,
        |  coalesce(freq, '') AS `Frequency_typ`,
        |  '' AS `Package`,
        |  'Active' AS `Status`,
        |  '' AS `Datasheet_URL`,
        |  'Extracted by Datasheet-ETL-Spark v0.4 (confidence: ' || CAST(conf AS STRING) || '%)' AS `Notes`
        |FROM meta ORDER BY `MPN`""".stripMargin,

    "etl_export_csv" ->
      s"""WITH params AS (
        |  SELECT p_partkey, 'switching_frequency_typ' AS param,
        |    CAST(CAST(p_size * 10 AS BIGINT) AS STRING) AS value FROM part WHERE p_size > 40
        |  UNION ALL
        |  SELECT p_partkey, 'efficiency_typ', '0.9' FROM part WHERE p_retailprice > 970
        |  UNION ALL
        |  SELECT p_partkey, 'quiescent_current_typ',
        |    CAST(CAST(p_size * 3 AS BIGINT) AS STRING)
        |  FROM part WHERE p_brand LIKE 'Brand#1%'),
        |wide AS (
        |  SELECT p_partkey AS doc,
        |    MIN(CASE WHEN param = 'efficiency_typ' THEN value END) AS efficiency_typ,
        |    MIN(CASE WHEN param = 'quiescent_current_typ' THEN value END) AS quiescent_current_typ,
        |    MIN(CASE WHEN param = 'switching_frequency_typ' THEN value END) AS switching_frequency_typ
        |  FROM params GROUP BY p_partkey),
        |$fieldVerifyCtes
        |SELECT 'P' || CAST(fvfull.doc AS STRING) || '.pdf' AS source_file,
        |  confidence, status,
        |  coalesce(efficiency_typ, '') AS efficiency_typ,
        |  coalesce(quiescent_current_typ, '') AS quiescent_current_typ,
        |  coalesce(switching_frequency_typ, '') AS switching_frequency_typ
        |FROM fvfull LEFT JOIN wide ON fvfull.doc = wide.doc
        |ORDER BY source_file""".stripMargin,

    "diagram_topology" ->
      s"""WITH $diagramCtes,
        |d AS (SELECT diagram_id, doc_id, dtype, CAST(doc_id % 5 + 3 AS INT) AS n
        |      FROM diag),
        |nodes AS (
        |  SELECT diagram_id, i AS node_id,
        |    element_at(array('VIN','GND','EN','SW','FB','OUT','COMP','BST'),
        |               CAST((doc_id + i) % 8 AS INT) + 1) AS label
        |  FROM d LATERAL VIEW explode(sequence(0, n - 1)) t AS i),
        |edges AS (
        |  SELECT diagram_id, i AS src, i + 1 AS dst
        |  FROM d LATERAL VIEW explode(sequence(0, n - 2)) t AS i
        |  UNION
        |  SELECT diagram_id, 0, n - 1 FROM d WHERE doc_id % 3 = 0
        |  UNION
        |  SELECT diagram_id, 1, n - 1 FROM d WHERE doc_id % 4 = 0),
        |hop1 AS (SELECT diagram_id, dst FROM edges WHERE src = 0),
        |reach AS (
        |  SELECT diagram_id, COUNT(*) AS n_reach2 FROM (
        |    SELECT diagram_id, dst FROM hop1
        |    UNION
        |    SELECT h.diagram_id, e.dst FROM hop1 h JOIN edges e
        |      ON h.diagram_id = e.diagram_id AND h.dst = e.src) u
        |  WHERE dst <> 0 GROUP BY diagram_id),
        |na AS (
        |  SELECT diagram_id, COUNT(*) AS n_nodes,
        |    CAST(COALESCE(SUM(CASE WHEN label IN ('VIN','GND') THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_power
        |  FROM nodes GROUP BY diagram_id),
        |ea AS (SELECT diagram_id, COUNT(*) AS n_edges FROM edges GROUP BY diagram_id),
        |fo AS (
        |  SELECT diagram_id, MAX(c) AS max_fanout FROM
        |    (SELECT diagram_id, src, COUNT(*) AS c FROM edges GROUP BY diagram_id, src) f
        |  GROUP BY diagram_id)
        |SELECT d.diagram_id, d.dtype, na.n_nodes, na.n_power, ea.n_edges,
        |  fo.max_fanout, COALESCE(r.n_reach2, 0) AS n_reach2
        |FROM d
        |  LEFT JOIN na ON d.diagram_id = na.diagram_id
        |  LEFT JOIN ea ON d.diagram_id = ea.diagram_id
        |  LEFT JOIN fo ON d.diagram_id = fo.diagram_id
        |  LEFT JOIN reach r ON d.diagram_id = r.diagram_id
        |ORDER BY d.diagram_id""".stripMargin,

    "diagram_pinout" ->
      s"""WITH $diagramCtes,
        |p0 AS (SELECT diagram_id, doc_id FROM diag WHERE dtype = 'pinout'),
        |pins AS (
        |  SELECT diagram_id, doc_id, CAST(i AS BIGINT) AS pin_id
        |  FROM p0 LATERAL VIEW explode(sequence(1, CAST(doc_id % 8 + 4 AS INT))) t AS i),
        |named AS (
        |  SELECT diagram_id, pin_id,
        |    element_at(array('VIN','GND','EN','SW','FB','OUT','COMP','BST'),
        |               CAST((doc_id + pin_id) % 8 AS INT) + 1) AS pin_name
        |  FROM pins)
        |SELECT diagram_id, pin_id, pin_name,
        |  CASE WHEN pin_name = 'VIN' THEN 'power_input'
        |       WHEN pin_name = 'GND' THEN 'ground'
        |       WHEN pin_name = 'EN' THEN 'enable'
        |       WHEN pin_name = 'SW' THEN 'switch_node'
        |       WHEN pin_name = 'FB' THEN 'feedback'
        |       WHEN pin_name = 'OUT' THEN 'output'
        |       WHEN pin_name = 'COMP' THEN 'compensation'
        |       WHEN pin_name = 'BST' THEN 'bootstrap' ELSE '' END AS pin_function
        |FROM named ORDER BY diagram_id, pin_id""".stripMargin,

    "diagram_appcircuit" ->
      s"""WITH $diagramCtes,
        |a0 AS (SELECT diagram_id, doc_id FROM diag WHERE dtype = 'typical_app'),
        |comps AS (
        |  SELECT diagram_id, doc_id, CAST(i AS BIGINT) AS comp_id
        |  FROM a0 LATERAL VIEW explode(sequence(1, CAST(doc_id % 5 + 2 AS INT))) t AS i)
        |SELECT diagram_id, comp_id,
        |  element_at(array('inductor','capacitor','resistor','diode','ic'),
        |             CAST((doc_id + comp_id) % 5 AS INT) + 1) AS comp_type,
        |  (doc_id * 7 + comp_id * 13) % 1000 AS value_code
        |FROM comps ORDER BY diagram_id, comp_id""".stripMargin,

    "etl_region_dedup" ->
      """WITH a AS (
        |  SELECT p_partkey AS a_id, p_partkey div 50 AS page,
        |    p_partkey % 40 AS x0, p_partkey % 30 AS y0,
        |    p_partkey % 40 + 10 + p_partkey % 5 AS x1, p_partkey % 30 + 8 AS y1,
        |    0.8 + (p_partkey % 10) / 100.0 AS confidence
        |  FROM part),
        |b AS (
        |  SELECT p_partkey AS b_id, p_partkey div 50 AS b_page,
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
        |WHERE iou >= 0.3 ORDER BY page, a_id, b_id""".stripMargin,

    "etl_table_assemble" ->
      s"""WITH $tableAssembleCtes
        |SELECT table_id, page_num, title, headers, n_rows, confidence
        |FROM assembled ORDER BY page_num""".stripMargin,

    "infer_extract" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    26 + COALESCE(length(substring(text, 1, 256)), 0) AS plen,
        |    '{"mpn": "MPN-' || CAST(doc_id AS STRING) || '", "voltage": ' ||
        |      CAST(CAST(doc_id % 50 AS DOUBLE) / 10.0 AS STRING) ||
        |      ', "pages": ' || CAST(doc_id % 7 AS STRING) || '}' AS body
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
        |  CASE WHEN valid THEN 'MPN-' || CAST(doc_id AS STRING) END AS mpn,
        |  CASE WHEN valid THEN CAST(doc_id % 50 AS DOUBLE) / 10.0 END AS voltage,
        |  CAST(plen div 4 + 1 AS BIGINT) AS tokens_in,
        |  CAST(clen div 4 AS BIGINT) AS tokens_out
        |FROM shaped ORDER BY doc_id""".stripMargin,

    "etl_review_payload" ->
      s"""WITH $paramPivotCtes,
        |$fieldVerifyCtes,
        |$tableAssembleCtes,
        |pv AS (SELECT * FROM pivoted WHERE value IS NOT NULL),
        |fvx AS (SELECT doc, confidence AS fv_conf FROM fvfull),
        |tb AS (SELECT page_num AS doc, table_id, confidence AS tb_conf FROM assembled),
        |mm AS (SELECT pv.*, fv_conf, table_id, tb_conf,
        |         lower(element_at(array('vision_double_verified', 'rule_based_v03',
        |                'vision_only', 'manual_entry'), CAST(pv.doc % 4 AS INT) + 1)) AS m2
        |       FROM pv LEFT JOIN fvx ON pv.doc = fvx.doc
        |               LEFT JOIN tb ON pv.doc = tb.doc),
        |vb AS (SELECT *, filter(array(
        |         CASE WHEN instr(m2, 'vision') > 0 THEN 'vision' ELSE '' END,
        |         CASE WHEN instr(m2, 'double') > 0 OR instr(m2, 'verified') > 0
        |              THEN 'pdfplumber' ELSE '' END,
        |         CASE WHEN instr(m2, 'rule') > 0 THEN 'rule_based' ELSE '' END),
        |         x -> x <> '') AS votes,
        |         coalesce(tb_conf, fv_conf, 0.9) AS conf
        |       FROM mm)
        |SELECT doc,
        |  CASE param WHEN 'vin_min' THEN 'v_in_min' WHEN 'vin_typ' THEN 'v_in_typ'
        |             WHEN 'vin_max' THEN 'v_in_max' WHEN 'iout_max' THEN 'i_out_max'
        |             ELSE param END AS param,
        |  value, coalesce(unit, '') AS unit,
        |  conf AS confidence,
        |  CASE WHEN table_id IS NOT NULL THEN 'page_1_' || table_id
        |       ELSE 'unknown' END AS source_ref,
        |  CASE WHEN size(votes) = 0 THEN 'unknown'
        |       ELSE array_join(votes, ',') END AS verified_by,
        |  conf < 0.95 AS needs_review
        |FROM vb ORDER BY doc, param""".stripMargin,

    "etl_footnote_link" ->
      """WITH cells AS (
        |  SELECT doc_id, 'IQ' AS param,
        |    'VFB = 1.1V (Note ' || CAST(doc_id % 3 + 1 AS STRING) || ')' AS conditions
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, 'VOUT', 'no marker here' FROM documents WHERE doc_id % 2 = 1),
        |notes AS (
        |  SELECT doc_id, CAST(note_id AS BIGINT) AS note_id,
        |    'Measured at VIN = ' || CAST(note_id * 4 AS STRING) || 'V, TA = 25C' AS note_text
        |  FROM documents LATERAL VIEW explode(sequence(1, 3)) t AS note_id),
        |marked AS (
        |  SELECT doc_id, param, conditions,
        |    CAST(nullif(regexp_extract(conditions, 'Note (\\d+)', 1), '') AS BIGINT) AS note_id
        |  FROM cells)
        |SELECT m.doc_id, m.param, m.conditions, m.note_id, n.note_text
        |FROM marked m LEFT JOIN notes n ON m.doc_id = n.doc_id AND m.note_id = n.note_id
        |ORDER BY m.doc_id, m.param""".stripMargin,

    "etl_category_header" ->
      """WITH phrases AS (
        |  SELECT phrase FROM (SELECT DISTINCT concat_ws(' ', slice(split(text, ' '), 1, 3)) AS phrase FROM documents) d
        |  UNION
        |  SELECT phrase FROM VALUES ('Electrical Characteristics'), ('DC Characteristics'),
        |    ('Absolute Maximum Ratings'), ('Recommended Operating Conditions'),
        |    ('Input Voltage Range'), ('Thermal Information'), ('AC Timing'),
        |    ('3.3 V typ'), ('100 mA max'), ('x7R 0402'), ('') AS v(phrase))
        |SELECT phrase,
        |  CASE WHEN length(trim(phrase)) = 0 THEN false
        |       ELSE (lower(trim(phrase)) RLIKE '^(input|output|power|thermal|timing|electrical)'
        |          OR lower(trim(phrase)) RLIKE 'characteristics$'
        |          OR lower(trim(phrase)) RLIKE '^(absolute|recommended|operating)'
        |          OR lower(trim(phrase)) RLIKE 'conditions$'
        |          OR lower(trim(phrase)) RLIKE '^(dc|ac)\\s'
        |          OR CAST(length(regexp_replace(trim(phrase), '[^A-Za-z]', '')) AS DOUBLE)
        |             / length(trim(phrase)) > 0.8) END AS is_header
        |FROM phrases ORDER BY phrase""".stripMargin,

    "etl_header_merge" ->
      """WITH cells AS (
        |  SELECT doc_id AS table_id, v.col_idx, v.grp, v.field FROM documents
        |  CROSS JOIN (SELECT * FROM VALUES
        |    (0, CAST(NULL AS STRING), 'Parameter'), (1, CAST(NULL AS STRING), 'Test Condition'),
        |    (2, 'Output Voltage', 'Min'), (3, CAST(NULL AS STRING), 'Typ'),
        |    (4, CAST(NULL AS STRING), 'Max'), (5, CAST(NULL AS STRING), 'Unit')
        |    AS x(col_idx, grp, field)) v),
        |filled AS (
        |  SELECT table_id, col_idx, field,
        |    last_value(grp) IGNORE NULLS OVER (PARTITION BY table_id ORDER BY col_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp_filled
        |  FROM cells)
        |SELECT table_id, CAST(col_idx AS BIGINT) AS col_idx,
        |  CASE WHEN grp_filled IS NOT NULL AND field IN ('Min', 'Typ', 'Max')
        |       THEN grp_filled || ' - ' || field ELSE field END AS header
        |FROM filled ORDER BY table_id, col_idx""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS med_qty,
        |  CAST(ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity), 6) AS DOUBLE) AS p90_qty,
        |  CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS DOUBLE) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up,
        |  substring(c_name, 1, 8) AS prefix,
        |  lpad(CAST(c_custkey AS STRING), 9, '0') AS padded,
        |  regexp_replace(c_name, '[0-9]', '#') AS masked,
        |  CAST(instr(c_name, '1') AS BIGINT) AS pos1,
        |  reverse(c_name) AS rev,
        |  CAST(length(c_name) AS BIGINT) AS nlen
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_array_agg" ->
      """SELECT user_id,
        |  array_join(sort_array(collect_list(event_type)), ',') AS types_sorted,
        |  array_join(sort_array(collect_set(event_type)), ',') AS types_distinct,
        |  COUNT(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sliding_window" ->
      """SELECT wstart, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT explode(array(
        |      timestamp_micros((unix_micros(ts) div 1800000000) * 1800000000),
        |      timestamp_micros((unix_micros(ts) div 1800000000) * 1800000000 - 1800000000))) AS wstart,
        |    event_type, value
        |  FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y,
        |  CAST(month(ts) AS BIGINT) AS m,
        |  CAST(dayofmonth(ts) AS BIGINT) AS dom,
        |  CAST(dayofweek(ts) AS BIGINT) AS dow,
        |  CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(minute(ts) AS BIGINT) AS mi,
        |  ts + INTERVAL 7 DAY AS week_later,
        |  date_trunc('hour', ts) AS hour_bucket,
        |  CAST(last_day(ts) AS STRING) AS month_end
        |FROM events ORDER BY event_id""".stripMargin,

    "q_explode" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "q_window_frames" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |         CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT) AS day_no,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT o_custkey, o_orderkey, day_no,
        |  CAST(first_value(price) OVER w_whole AS DOUBLE) AS first_price,
        |  CAST(last_value(price)  OVER w_whole AS DOUBLE) AS last_price,
        |  CAST(nth_value(price, 2) OVER w_whole AS DOUBLE) AS second_price,
        |  CAST(ntile(4) OVER w_ord AS BIGINT) AS quartile,
        |  percent_rank() OVER w_ord AS pct_rank,
        |  cume_dist() OVER w_ord AS cume,
        |  CAST(lag(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS DOUBLE) AS prev_price,
        |  CAST(lead(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS DOUBLE) AS next_price,
        |  CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY day_no
        |       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30_spend
        |FROM o
        |WINDOW
        |  w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  w_whole AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_hierarchy" ->
      """WITH RECURSIVE pr AS (
        |  SELECT p_partkey AS id, CAST(p_partkey div 7 AS BIGINT) AS parent
        |  FROM part),
        |cc(id, anc, depth) AS (
        |  SELECT id, id, 0 FROM pr WHERE parent < 1
        |  UNION ALL
        |  SELECT pr.id, cc.anc, cc.depth + 1
        |  FROM pr JOIN cc ON pr.parent = cc.id
        |  WHERE pr.parent >= 1)
        |SELECT id, anc AS root, CAST(depth AS BIGINT) AS depth
        |FROM cc ORDER BY id""".stripMargin,

    "graph_pagerank" ->
      """WITH n AS (SELECT p_partkey AS id, CAST(p_partkey div 7 AS BIGINT) AS parent
        |           FROM part),
        |r0 AS (SELECT id, parent, CAST(1000000 AS BIGINT) AS score FROM n),
        |a1 AS (SELECT parent AS t, CAST(SUM((score * 85) div 100) AS BIGINT) AS m
        |       FROM r0 WHERE parent >= 1 GROUP BY parent),
        |r1 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
        |       FROM n LEFT JOIN a1 ON n.id = a1.t),
        |a2 AS (SELECT parent AS t, CAST(SUM((score * 85) div 100) AS BIGINT) AS m
        |       FROM r1 WHERE parent >= 1 GROUP BY parent),
        |r2 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
        |       FROM n LEFT JOIN a2 ON n.id = a2.t),
        |a3 AS (SELECT parent AS t, CAST(SUM((score * 85) div 100) AS BIGINT) AS m
        |       FROM r2 WHERE parent >= 1 GROUP BY parent),
        |r3 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
        |       FROM n LEFT JOIN a3 ON n.id = a3.t)
        |SELECT id, score FROM r3 ORDER BY id""".stripMargin,

    "etl_parse_values" ->
      """WITH cells AS (
        |  SELECT p_partkey,
        |    CAST(p_retailprice AS STRING) || ' ' ||
        |      element_at(array('mv','millivolt','V','volt','ua','uA','ohm','khz'),
        |                 CAST(p_partkey % 8 AS INT) + 1) AS cell
        |  FROM part)
        |SELECT p_partkey,
        |  CAST(regexp_replace(trim(cell), '[^0-9.eE+-]', '') AS DOUBLE) AS parsed_value,
        |  CASE lower(trim(regexp_replace(cell, '[0-9.eE+-]', '')))
        |    WHEN 'mv' THEN 'mV' WHEN 'millivolt' THEN 'mV'
        |    WHEN 'v' THEN 'V' WHEN 'volt' THEN 'V' WHEN 'volts' THEN 'V'
        |    WHEN 'ua' THEN 'µA' WHEN 'ma' THEN 'mA'
        |    WHEN 'ohm' THEN 'Ω' WHEN 'ohms' THEN 'Ω' WHEN 'r' THEN 'Ω'
        |    WHEN 'khz' THEN 'kHz' WHEN 'mhz' THEN 'MHz'
        |    ELSE trim(regexp_replace(cell, '[0-9.eE+-]', '')) END AS unit_norm
        |FROM cells ORDER BY p_partkey""".stripMargin,

    "etl_fill_down" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_gapped,
        |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END) IGNORE NULLS
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,

    "etl_batch_report" ->
      """WITH b AS (
        |  SELECT source, COUNT(*) AS total,
        |    CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS skipped,
        |    CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS success,
        |    CAST(SUM(CASE WHEN lang = 'en' AND n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS failed
        |  FROM documents GROUP BY source),
        |bk AS (SELECT least((success * 5) div total, 4) AS bucket, * FROM b),
        |rb AS (SELECT 'rate_bucket' AS section,
        |    'b' || CAST(bucket AS STRING) AS row_key,
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
        |ORDER BY section, row_key""".stripMargin,

    "etl_header_detect" ->
      """WITH toks AS (
        |  SELECT token FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t
        |  UNION
        |  SELECT token FROM VALUES ('Parameter'), ('param.'), ('Symbol'),
        |    ('Test Condition'), ('conditions'), ('min.'), ('Min'), ('Typical'),
        |    ('typ'), ('MAX'), ('Max.'), ('units'), ('Unit'), ('description'),
        |    ('Desc') AS h(token))
        |SELECT token,
        |  CASE WHEN lower(trim(token)) RLIKE 'param' THEN 'Parameter'
        |       WHEN lower(trim(token)) RLIKE 'symbol' THEN 'Symbol'
        |       WHEN lower(trim(token)) RLIKE 'test.*cond|condition' THEN 'Test_Conditions'
        |       WHEN lower(trim(token)) RLIKE '^min' THEN 'Min'
        |       WHEN lower(trim(token)) RLIKE '^typ' THEN 'Typ'
        |       WHEN lower(trim(token)) RLIKE '^max' THEN 'Max'
        |       WHEN lower(trim(token)) RLIKE 'unit' THEN 'Unit'
        |       WHEN lower(trim(token)) RLIKE 'desc' THEN 'Description'
        |       ELSE trim(token) END AS header_class
        |FROM toks ORDER BY token""".stripMargin,

    "etl_clean_cells" ->
      """SELECT doc_id,
        |  length(trim(regexp_replace('  ' || regexp_replace(text, ' ', '   ') || ' ' || chr(9), '\\s+', ' '))) AS clean_len,
        |  trim(regexp_replace('  ' || regexp_replace(text, ' ', '   ') || ' ' || chr(9), '\\s+', ' ')) = text AS roundtrip_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "etl_extract_mpn" ->
      """WITH pages AS (
        |  SELECT p_partkey,
        |    element_at(array('datasheet LMR', 'spec TPS', 'ref LM', 'misc X'),
        |               CAST(p_partkey % 4 AS INT) + 1)
        |      || CAST(p_partkey AS STRING) || 'A '
        |      || element_at(array('by Texas Instruments', 'by Analog Devices', 'by onsemi', 'no vendor'),
        |                    CAST(p_partkey % 4 AS INT) + 1)
        |    AS page
        |  FROM part)
        |SELECT p_partkey,
        |  coalesce(
        |    nullif(regexp_extract(page, 'LMR[0-9]+[A-Z]*', 0), ''),
        |    nullif(regexp_extract(page, 'TPS[0-9]+[A-Z]*', 0), ''),
        |    nullif(regexp_extract(page, 'LM[0-9]+[A-Z]*', 0), ''),
        |    'Unknown') AS mpn,
        |  CASE WHEN lower(page) LIKE '%texas instruments%' THEN 'Texas Instruments'
        |       WHEN lower(page) LIKE '%analog devices%' THEN 'Analog Devices'
        |       WHEN lower(page) LIKE '%onsemi%' THEN 'onsemi'
        |       ELSE 'Unknown' END AS manufacturer
        |FROM pages ORDER BY p_partkey""".stripMargin,

    "etl_mfr_infer" ->
      """WITH m AS (
        |  SELECT p_partkey,
        |    element_at(array('LM', 'TPS', 'LMR', 'MAX', 'AD', 'LT', 'LTC', 'MCP',
        |                     'PIC', 'STM', 'NCP', 'MC', 'ISL', 'IR', 'INA', 'OPA', 'XYZ', 'Q'),
        |               CAST(p_partkey % 18 AS INT) + 1)
        |      || CAST(p_partkey AS STRING) || 'A' AS mpn,
        |    CASE WHEN p_partkey % 3 = 0 THEN 'Vendor Text Inc' ELSE '' END AS text_mfr
        |  FROM part)
        |SELECT p_partkey, mpn,
        |  CASE WHEN text_mfr <> '' THEN text_mfr
        |       ELSE CASE WHEN upper(mpn) LIKE 'LM%' THEN 'Texas Instruments'
        |       WHEN upper(mpn) LIKE 'TPS%' THEN 'Texas Instruments'
        |       WHEN upper(mpn) LIKE 'LMR%' THEN 'Texas Instruments'
        |       WHEN upper(mpn) LIKE 'MAX%' THEN 'Analog Devices'
        |       WHEN upper(mpn) LIKE 'AD%' THEN 'Analog Devices'
        |       WHEN upper(mpn) LIKE 'LT%' THEN 'Analog Devices'
        |       WHEN upper(mpn) LIKE 'LTC%' THEN 'Analog Devices'
        |       WHEN upper(mpn) LIKE 'MCP%' THEN 'Microchip'
        |       WHEN upper(mpn) LIKE 'PIC%' THEN 'Microchip'
        |       WHEN upper(mpn) LIKE 'STM%' THEN 'STMicroelectronics'
        |       WHEN upper(mpn) LIKE 'NCP%' THEN 'onsemi'
        |       WHEN upper(mpn) LIKE 'MC%' THEN 'onsemi'
        |       WHEN upper(mpn) LIKE 'ISL%' THEN 'Renesas'
        |       WHEN upper(mpn) LIKE 'IR%' THEN 'Infineon'
        |       WHEN upper(mpn) LIKE 'INA%' THEN 'Texas Instruments'
        |       WHEN upper(mpn) LIKE 'OPA%' THEN 'Texas Instruments' ELSE '' END END AS manufacturer
        |FROM m ORDER BY p_partkey""".stripMargin,

    "etl_merge_fragments" ->
      """WITH sig AS (
        |  SELECT source, doc_id,
        |    concat_ws(' ', slice(split(text, ' '), 1, 2)) AS header_sig
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
        |FROM seqd GROUP BY source, table_seq ORDER BY source, table_seq""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS text_hash,
        |  min(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "dedup_incremental" ->
      """WITH sigs AS (
        |  SELECT doc_id,
        |    md5(array_join(array_sort(array_distinct(split(text, ' '))), ' ')) AS h
        |  FROM documents),
        |batch AS (SELECT * FROM sigs WHERE doc_id % 10 = 9),
        |corpus AS (SELECT h, min(doc_id) AS corpus_match FROM sigs
        |           WHERE doc_id % 10 <> 9 GROUP BY h),
        |bmin AS (SELECT h, min(doc_id) AS batch_min FROM batch GROUP BY h)
        |SELECT b.doc_id,
        |  CASE WHEN corpus_match IS NOT NULL THEN 'dup_corpus'
        |       WHEN b.doc_id > batch_min THEN 'dup_batch'
        |       ELSE 'unique' END AS status,
        |  COALESCE(corpus_match,
        |           CASE WHEN b.doc_id > batch_min THEN batch_min END) AS match_id
        |FROM batch b LEFT JOIN corpus USING (h) JOIN bmin USING (h)
        |ORDER BY b.doc_id""".stripMargin,

    "dedup_jaccard_block" ->
      """WITH n AS (SELECT doc_id,
        |             regexp_replace(lower(trim(text)), '\\s+', ' ') AS t
        |           FROM documents),
        |tk AS (SELECT doc_id, split(t, ' ') AS w FROM n),
        |sh AS (SELECT doc_id,
        |         array_distinct(CASE WHEN size(w) < 3 THEN array(array_join(w, ' '))
        |           ELSE transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))
        |           END) AS s
        |       FROM tk),
        |b0 AS (SELECT doc_id, s, array_min(s) AS blk FROM sh),
        |sz AS (SELECT blk, COUNT(*) AS bsz FROM b0 GROUP BY blk),
        |b1 AS (
        |  SELECT b0.doc_id, b0.s, b0.blk,
        |    CASE WHEN sz.bsz > 256 THEN coalesce(try_element_at(array_sort(b0.s), 2), '')
        |         ELSE '' END AS sub
        |  FROM b0 JOIN sz ON b0.blk = sz.blk),
        |sz2 AS (SELECT blk, sub, COUNT(*) AS bsz2 FROM b1 GROUP BY blk, sub),
        |bb AS (
        |  SELECT b1.doc_id, b1.s, b1.blk, b1.sub,
        |    CASE WHEN sz2.bsz2 > 256
        |         THEN CAST(conv(substr(md5(CAST(b1.doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
        |              % CAST(ceil(bsz2 / 128.0) AS BIGINT)
        |         ELSE 0 END AS sub2
        |  FROM b1 JOIN sz2 ON b1.blk = sz2.blk AND b1.sub = sz2.sub),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |     CAST(size(array_intersect(a.s, b2.s)) AS DOUBLE) /
        |     CAST(size(array_distinct(concat(a.s, b2.s))) AS DOUBLE) AS jaccard
        |  FROM bb a JOIN bb b2 ON a.blk = b2.blk AND a.sub = b2.sub
        |    AND a.sub2 = b2.sub2 AND a.doc_id < b2.doc_id)
        |SELECT doc_a, doc_b, jaccard FROM pairs
        |WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_exact" ->
      s"""WITH $minhashCtes
        |SELECT doc_a, doc_b, est_jaccard FROM mh_out
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram_jaccard_exact" ->
      s"""WITH $minhashCtes
        |SELECT p.doc_a, p.doc_b, p.est_jaccard,
        |  CAST(size(array_intersect(a.s, b.s)) AS DOUBLE) /
        |  size(array_distinct(concat(a.s, b.s))) AS jaccard
        |FROM mh_out p JOIN sh a ON p.doc_a = a.doc_id
        |              JOIN sh b ON p.doc_b = b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash_exact" -> simhashExactSql,

    // Spark's recursive CTEs don't yet allow UNION-dedup recursion
    // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so instead of DuckDB's
    // label-closure recursion this port unrolls the SAME hop +
    // pointer-jump rounds the Scala operator runs (each jump composes
    // two resolution steps, so three rounds cover diameter ~2^3·3 —
    // far beyond any near-dup cluster the pair generator emits).
    "dedup_cluster_exact" ->
      """WITH n AS (SELECT doc_id,
        |             regexp_replace(lower(trim(text)), '\\s+', ' ') AS t
        |           FROM documents),
        |tk AS (SELECT doc_id, split(t, ' ') AS w FROM n),
        |sh AS (SELECT doc_id,
        |         array_distinct(CASE WHEN size(w) < 3 THEN array(array_join(w, ' '))
        |           ELSE transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))
        |           END) AS s
        |       FROM tk),
        |b0 AS (SELECT doc_id, s, array_min(s) AS blk FROM sh),
        |sz AS (SELECT blk, COUNT(*) AS bsz FROM b0 GROUP BY blk),
        |b1 AS (
        |  SELECT b0.doc_id, b0.s, b0.blk,
        |    CASE WHEN sz.bsz > 256 THEN coalesce(try_element_at(array_sort(b0.s), 2), '')
        |         ELSE '' END AS sub
        |  FROM b0 JOIN sz ON b0.blk = sz.blk),
        |sz2 AS (SELECT blk, sub, COUNT(*) AS bsz2 FROM b1 GROUP BY blk, sub),
        |bb AS (
        |  SELECT b1.doc_id, b1.s, b1.blk, b1.sub,
        |    CASE WHEN sz2.bsz2 > 256
        |         THEN CAST(conv(substr(md5(CAST(b1.doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
        |              % CAST(ceil(bsz2 / 128.0) AS BIGINT)
        |         ELSE 0 END AS sub2
        |  FROM b1 JOIN sz2 ON b1.blk = sz2.blk AND b1.sub = sz2.sub),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
        |  FROM bb a JOIN bb b2 ON a.blk = b2.blk AND a.sub = b2.sub
        |    AND a.sub2 = b2.sub2 AND a.doc_id < b2.doc_id
        |  WHERE CAST(size(array_intersect(a.s, b2.s)) AS DOUBLE) /
        |        CAST(size(array_distinct(concat(a.s, b2.s))) AS DOUBLE) >= 0.8),
        |e AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |  UNION SELECT doc_a, doc_a FROM pairs
        |  UNION SELECT doc_b, doc_b FROM pairs),
        |l0 AS (SELECT src AS id, MIN(dst) AS label FROM e GROUP BY src),
        |h1 AS (SELECT e.src AS id, MIN(l0.label) AS label FROM e JOIN l0 ON e.dst = l0.id GROUP BY e.src),
        |j1 AS (SELECT a.id, b.label FROM h1 a JOIN h1 b ON a.label = b.id),
        |h2 AS (SELECT e.src AS id, MIN(j1.label) AS label FROM e JOIN j1 ON e.dst = j1.id GROUP BY e.src),
        |j2 AS (SELECT a.id, b.label FROM h2 a JOIN h2 b ON a.label = b.id),
        |h3 AS (SELECT e.src AS id, MIN(j2.label) AS label FROM e JOIN j2 ON e.dst = j2.id GROUP BY e.src)
        |SELECT id, CAST(label AS BIGINT) AS cluster_id
        |FROM h3 ORDER BY id""".stripMargin,

    "dedup_embedding_exact" ->
      """WITH e0 AS (SELECT vec_id,
        |             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS q
        |           FROM embeddings),
        |grp AS (SELECT q, MIN(vec_id) AS rep, COUNT(*) AS cnt FROM e0 GROUP BY q),
        |e AS (SELECT rep AS vec_id, q FROM grp),
        |star AS (SELECT g.rep AS vec_a, x.vec_id AS vec_b
        |         FROM grp g JOIN e0 x ON x.q = g.q
        |         WHERE g.cnt > 1 AND x.vec_id <> g.rep),
        |np AS (SELECT CAST(COALESCE(MIN(p), 30) AS INT) AS npl
        |       FROM (SELECT explode(sequence(8, 30)) AS p) r
        |       CROSS JOIN (SELECT COUNT(*) AS n FROM embeddings) c
        |       WHERE CAST(32 AS BIGINT) * shiftleft(CAST(1 AS BIGINT), p) >= c.n),
        |dims AS (SELECT explode(sequence(0, 63)) AS j),
        |bp AS (SELECT b, p FROM (SELECT explode(sequence(0, 3)) AS b) bb
        |       CROSS JOIN (SELECT explode(sequence(0, 29)) AS p) pp
        |       CROSS JOIN np WHERE p < np.npl),
        |signs AS (SELECT b, p, dims.j,
        |    CASE WHEN CAST(conv(substr(md5('e' || CAST(b AS STRING) || '_' || CAST(p AS STRING) || '_' || CAST(dims.j AS STRING)), 1, 15), 16, 10) AS BIGINT) & 1 = 1
        |         THEN 1 ELSE -1 END AS s
        |  FROM bp CROSS JOIN dims),
        |xsigns AS (SELECT p, dims.j,
        |    CASE WHEN CAST(conv(substr(md5('x_' || CAST(p AS STRING) || '_' || CAST(dims.j AS STRING)), 1, 15), 16, 10) AS BIGINT) & 1 = 1
        |         THEN 1 ELSE -1 END AS s
        |  FROM (SELECT explode(sequence(0, 9)) AS p) pp CROSS JOIN dims),
        |vd AS (SELECT e.vec_id, signs.b, signs.p, SUM(element_at(e.q, signs.j + 1) * signs.s) AS dot
        |       FROM e CROSS JOIN signs GROUP BY e.vec_id, signs.b, signs.p),
        |bk AS (SELECT vec_id, b, SUM(CASE WHEN dot > 0 THEN shiftleft(1, p) ELSE 0 END) AS bucket
        |       FROM vd GROUP BY vec_id, b),
        |xd AS (SELECT e.vec_id, xsigns.p, SUM(element_at(e.q, xsigns.j + 1) * xsigns.s) AS dot
        |       FROM e CROSS JOIN xsigns GROUP BY e.vec_id, xsigns.p),
        |xb AS (SELECT vec_id, SUM(CASE WHEN dot > 0 THEN shiftleft(1, p) ELSE 0 END) AS xbucket
        |       FROM xd GROUP BY vec_id),
        |sz AS (SELECT b, bucket, COUNT(*) AS c FROM bk GROUP BY b, bucket),
        |sub AS (SELECT bk.vec_id, bk.b, bk.bucket,
        |          CASE WHEN sz.c > 2048 THEN xb.xbucket ELSE 0 END AS sub
        |        FROM bk JOIN sz ON bk.b = sz.b AND bk.bucket = sz.bucket
        |                JOIN xb ON bk.vec_id = xb.vec_id),
        |pairs AS (SELECT DISTINCT vec_a, vec_b FROM (
        |          SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
        |          FROM sub x JOIN sub y
        |            ON x.b = y.b AND x.bucket = y.bucket AND x.sub = y.sub
        |               AND x.vec_id < y.vec_id
        |          UNION ALL SELECT vec_a, vec_b FROM star) u),
        |scored AS (SELECT vec_a, vec_b,
        |             CAST(aggregate(zip_with(a.q, b.q, (x, y) -> x * y),
        |               CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT) AS qdot
        |           FROM pairs JOIN e0 a ON pairs.vec_a = a.vec_id
        |                      JOIN e0 b ON pairs.vec_b = b.vec_id)
        |SELECT vec_a, vec_b, qdot FROM scored
        |ORDER BY qdot DESC, vec_a, vec_b LIMIT 50""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CASE WHEN length(text) = 0 THEN 0.0D
        |    ELSE CAST(size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS DOUBLE) / length(text)
        |  END AS punct_ratio,
        |  CAST(size(filter(split(text, ' '), x -> array_contains(array('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'), x))) AS DOUBLE)
        |    / size(split(text, ' ')) AS stopword_ratio,
        |  least(1.0, CAST(length(text) AS DOUBLE) / 500.0) * 0.4
        |    + (1.0 - CASE WHEN length(text) = 0 THEN 0.0D
        |         ELSE CAST(size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0)) AS DOUBLE) / length(text)
        |       END) * 0.3
        |    + (CAST(size(filter(split(text, ' '), x -> array_contains(array('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'), x))) AS DOUBLE)
        |       / size(split(text, ' '))) * 0.3 AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH scored AS (
        |  SELECT doc_id, lang AS lang_actual,
        |  CAST(size(array_intersect(split(text, ' '), array('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS score_en,
        |  CAST(size(array_intersect(split(text, ' '), array('el', 'la', 'de', 'los', 'las', 'y', 'que'))) AS BIGINT) AS score_es,
        |  CAST(size(array_intersect(split(text, ' '), array('le', 'les', 'et', 'des', 'un', 'une', 'du'))) AS BIGINT) AS score_fr,
        |  CAST(size(array_intersect(split(text, ' '), array('der', 'die', 'das', 'und', 'ein', 'zu', 'den'))) AS BIGINT) AS score_de,
        |  CAST(size(array_intersect(split(text, ' '), array('的', '了', '是', '在', '我', '有', '和'))) AS BIGINT) AS score_zh
        |  FROM documents),
        |withbest AS (
        |  SELECT *, greatest(score_en, score_es, score_fr, score_de, score_zh) AS best FROM scored)
        |SELECT doc_id, lang_actual, score_en, score_es, score_fr, score_de, score_zh,
        |  CASE WHEN score_en = best THEN 'en' WHEN score_es = best THEN 'es'
        |       WHEN score_fr = best THEN 'fr' WHEN score_de = best THEN 'de'
        |       WHEN score_zh = best THEN 'zh' END AS lang_pred
        |FROM withbest ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)) AS BIGINT) AS bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    filter(split(text, ''), ch -> ch != '') AS chars
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, chars, array_sort(array_distinct(chars)) AS dchars
        |  FROM c)
        |SELECT doc_id,
        |  CAST(size(chars) AS BIGINT) AS n_chars_tot,
        |  CAST(size(dchars) AS BIGINT) AS n_distinct,
        |  floor(aggregate(transform(dchars, ch ->
        |      -(CAST(size(filter(chars, x -> x = ch)) AS DOUBLE) / size(chars))
        |        * log2(CAST(size(filter(chars, x -> x = ch)) AS DOUBLE) / size(chars))),
        |    CAST(0.0 AS DOUBLE), (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS entropy
        |FROM d ORDER BY doc_id""".stripMargin,

    "text_boilerplate" ->
      """WITH tok AS (SELECT doc_id, explode(array_distinct(split(text, ' '))) AS token
        |            FROM documents),
        |dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
        |b AS (SELECT coalesce(array_sort(collect_list(token)), array()) AS boiler
        |      FROM dfreq CROSS JOIN (SELECT count(*) AS n_docs FROM documents) nd
        |      WHERE df * 2 > n_docs)
        |SELECT doc_id,
        |  coalesce(array_join(filter(split(text, ' '),
        |    t -> NOT array_contains(boiler, t)), ' '), '') AS clean_text,
        |  COALESCE(CAST(size(split(text, ' ')) -
        |       size(filter(split(text, ' '),
        |         t -> NOT array_contains(boiler, t))) AS BIGINT), 0) AS n_removed
        |FROM documents CROSS JOIN b ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH w AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id, CAST(size(w) AS BIGINT) AS n_tokens, gram
        |      FROM w LATERAL VIEW explode(
        |        CASE WHEN size(w) >= 2
        |             THEN transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))
        |             ELSE array() END) t AS gram),
        |c AS (SELECT doc_id, n_tokens, gram, count(*) AS c
        |      FROM g GROUP BY doc_id, n_tokens, gram)
        |SELECT doc_id, n_tokens,
        |  CAST(sum(c) AS BIGINT) AS n_bigrams,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top_bigram_frac,
        |  floor(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |        / CAST(sum(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dup_bigram_frac
        |FROM c GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin,

    "text_fingerprint_exact" ->
      """SELECT doc_id,
        |  aggregate(transform(split(text, ' '), t ->
        |      CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % 2147483647),
        |    CAST(0 AS BIGINT), (a, h) -> (a * 1000003 + h) % 2147483647) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lm_rarity" ->
      """WITH tok AS (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
        |r AS (SELECT doc_id, (t * 1000000) div c AS r FROM tok JOIN cnt USING (tok) CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(r) AS BIGINT) AS sum_rarity,
        |  CAST(CAST(SUM(r) AS BIGINT) div COUNT(*) AS BIGINT) AS mean_rarity
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      """WITH c AS (SELECT source, count(*) AS cnt,
        |             least(1.0, 15.0 / count(*)) AS frac
        |           FROM documents GROUP BY source),
        |t AS (SELECT source, cnt,
        |        lpad(lower(hex(CAST(least(floor(frac * 4294967296.0), 4294967295.0) AS BIGINT))), 8, '0') AS thresh
        |      FROM c)
        |SELECT d.doc_id, d.source, t.cnt AS stratum_size
        |FROM documents d JOIN t ON d.source = t.source
        |WHERE t.cnt <= 15
        |   OR substring(md5(concat(d.source, ':', CAST(d.doc_id AS STRING))), 1, 8) < t.thresh
        |ORDER BY d.doc_id""".stripMargin,

    "eval_split" ->
      """WITH tagged AS (
        |  SELECT CASE WHEN substring(md5('split:' || CAST(doc_id AS STRING)), 1, 8) < '0ccccccc' THEN 'test'
        |              WHEN substring(md5('split:' || CAST(doc_id AS STRING)), 1, 8) < '19999999' THEN 'val'
        |              ELSE 'train' END AS split,
        |    CAST(size(split(text, ' ')) AS BIGINT) AS n_tok, n_chars
        |  FROM documents),
        |per AS (SELECT split, COUNT(*) AS n_docs,
        |          CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |          CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |        FROM tagged GROUP BY split),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t FROM per)
        |SELECT split, n_docs, n_tokens, n_chars,
        |  CAST((n_docs * 1000000) div t AS BIGINT) AS share_ppm
        |FROM per CROSS JOIN tot ORDER BY split""".stripMargin,

    "mix_weights" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(size(split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per),
        |sc AS (
        |  SELECT source, n_docs, n_tokens,
        |    floor(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS token_share,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |         AS DECIMAL(18,6)) AS w_dec
        |  FROM per CROSS JOIN tot),
        |z AS (SELECT sum(w_dec) AS z FROM sc)
        |SELECT source, n_docs, n_tokens, token_share,
        |  floor(CAST(w_dec AS DOUBLE) / CAST(z AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mix_weight
        |FROM sc CROSS JOIN z ORDER BY source""".stripMargin,

    "budget_select" ->
      """WITH t AS (SELECT source, doc_id, n_chars,
        |             CAST(size(split(text, ' ')) AS BIGINT) AS tok
        |           FROM documents),
        |r AS (SELECT source, doc_id, tok,
        |        CAST(SUM(tok) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |      FROM t)
        |SELECT source, rank, doc_id, tok, cum_tok
        |FROM r WHERE cum_tok <= 2000
        |ORDER BY source, rank""".stripMargin,

    "chunk_sliding" ->
      """WITH w AS (SELECT doc_id, split(text, ' ') AS w,
        |             CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens, w,
        |        greatest(1, CAST(ceil((n_tokens - 64) / 32.0) AS BIGINT) + 1) AS n_chunks FROM w)
        |SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_id,
        |  array_join(slice(w, CAST(i * 32 + 1 AS INT), 64), ' ') AS chunk_text,
        |  CAST(least(64, n_tokens - i * 32) AS BIGINT) AS n_chunk_tokens
        |FROM c LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS i
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |             CAST(size(split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |        coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(CAST(cum_before AS DOUBLE) / 256) AS BIGINT) AS seq_id,
        |  CAST(cum_before % 256 AS BIGINT) AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "corpus_report" ->
      """WITH t AS (SELECT source, lang, n_chars,
        |             CAST(size(split(text, ' ')) AS BIGINT) AS tok,
        |             md5(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS h
        |           FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(FLOOR(CAST(SUM(n_chars) AS DECIMAL(38,0)) * 1000000 / COUNT(*)) AS BIGINT) AS mean_chars_ppm,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(FLOOR(CAST(COUNT(*) - COUNT(DISTINCT h) AS DECIMAL(38,0)) * 1000000 / COUNT(*)) AS BIGINT) AS dup_rate_ppm
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "corpus_token_hist" ->
      """WITH tok AS (SELECT explode(split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
        |top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank, tok, c,
        |  CAST(SUM(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |  CAST((CAST(SUM(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000)
        |       div t AS BIGINT) AS cov_ppm
        |FROM top CROSS JOIN tot
        |ORDER BY rank""".stripMargin,

    "decontam_overlap" ->
      """WITH sh AS (
        |  SELECT doc_id, s
        |  FROM (SELECT doc_id, text, split(text, ' ') AS w FROM documents) x
        |  LATERAL VIEW explode(array_distinct(CASE WHEN size(w) < 3
        |    THEN array(text)
        |    ELSE transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))
        |    END)) t AS s)
        |SELECT t.doc_id, e.doc_id AS eval_doc_id,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM sh t JOIN sh e ON t.s = e.s
        |WHERE e.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
        |GROUP BY t.doc_id, e.doc_id
        |ORDER BY t.doc_id, eval_doc_id""".stripMargin,

    "dedup_substring" ->
      """WITH w AS (SELECT doc_id, split(text, ' ') AS w
        |           FROM documents WHERE size(split(text, ' ')) >= 8),
        |sh AS (SELECT doc_id, gram
        |       FROM w LATERAL VIEW explode(
        |         transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))) t AS gram),
        |spans AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY doc_id),
        |dg AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM sh GROUP BY gram) gc
        |       WHERE c >= 2),
        |ds AS (SELECT doc_id, COUNT(*) AS dup_c FROM sh JOIN dg USING (gram)
        |       GROUP BY doc_id)
        |SELECT spans.doc_id, n_spans,
        |  CAST(COALESCE(dup_c, 0) AS BIGINT) AS n_dup_spans,
        |  CAST((CAST(COALESCE(dup_c, 0) AS BIGINT) * 1000000) div n_spans AS BIGINT) AS dup_ppm
        |FROM spans LEFT JOIN ds ON spans.doc_id = ds.doc_id
        |ORDER BY spans.doc_id""".stripMargin,

    "dedup_semantic_keep" ->
      """WITH sz AS (SELECT label, COUNT(*) AS lsz FROM embeddings GROUP BY label),
        |v AS (SELECT vec_id, e.label,
        |        transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS qv,
        |        n_chars,
        |        CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
        |          % CAST(ceil(lsz / 512.0) AS BIGINT) AS sub
        |      FROM embeddings e JOIN sz ON e.label = sz.label
        |        JOIN documents d ON e.vec_id = d.doc_id),
        |dom AS (
        |  SELECT a.vec_id AS doc_id, b.vec_id AS keep_id, b.n_chars AS keep_chars,
        |    CAST(aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y),
        |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS score
        |  FROM v a JOIN v b ON a.label = b.label AND a.sub = b.sub
        |    AND a.vec_id <> b.vec_id
        |    AND (b.n_chars > a.n_chars
        |         OR (b.n_chars = a.n_chars AND b.vec_id < a.vec_id)))
        |SELECT doc_id, keep_id, score FROM (
        |  SELECT doc_id, keep_id, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY keep_chars DESC, keep_id) AS rn
        |  FROM dom WHERE score >= 300000000000) q
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,

    "tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id, explode(split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, token),
        |dfreq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
        |         floor(tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS tfidf
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, token, tf, df, tfidf,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |           ORDER BY tfidf DESC, token) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, token, tf, df, tfidf, rank FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "embed_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label, CAST(pos AS BIGINT) AS dim,
        |         CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT) AS qv
        |  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x),
        |st AS (SELECT label, dim, sum(qv) AS sumq, count(*) AS n
        |       FROM q GROUP BY label, dim),
        |d2 AS (
        |  SELECT q.vec_id, q.label,
        |         sum(CAST(q.qv * st.n - st.sumq AS DECIMAL(38,0))
        |             * CAST(q.qv * st.n - st.sumq AS DECIMAL(38,0))) AS d2x
        |  FROM q JOIN st ON q.label = st.label AND q.dim = st.dim
        |  GROUP BY q.vec_id, q.label),
        |r AS (SELECT label, vec_id, d2x,
        |        CAST(row_number() OVER (PARTITION BY label
        |          ORDER BY d2x DESC, vec_id) AS BIGINT) AS rank
        |      FROM d2)
        |SELECT label, vec_id, CAST(d2x AS DOUBLE) AS d2, rank
        |FROM r WHERE rank <= 5 ORDER BY label, rank""".stripMargin,

    "embed_dim_stats" ->
      """WITH x AS (
        |  SELECT CAST(i AS BIGINT) AS dim,
        |    CAST(floor(least(greatest(CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT) AS q
        |  FROM embeddings LATERAL VIEW explode(sequence(1, 64)) t AS i)
        |SELECT dim, COUNT(*) AS n,
        |  CAST(SUM(q) AS BIGINT) AS sum_q,
        |  CAST(SUM(q * q) AS DOUBLE) AS sum_sq,
        |  min(q) AS min_q, max(q) AS max_q
        |FROM x GROUP BY dim ORDER BY dim""".stripMargin,

    "bpe_train_merges" -> bpeTrainMergesSpark,

    // bm25_retrieval: unnest/string_split/list_filter → explode/split/
    // filter; the scoring double expression keeps the oracle's exact
    // operation sequence so the snapped micros agree bit-for-bit.
    "bm25_retrieval" -> bm25SparkPort,

    // bm25_index serves the identical ranking from the persisted
    // inverted index — the SQL-only surface recomputes from documents.
    "bm25_index" -> bm25SparkPort,

    // bm25_index_incr: build-then-append maintenance path, same
    // lossless ranking contract.
    "bm25_index_incr" -> bm25SparkPort,

    // bm25_index_compact: build→append→compact→vacuum→serve — the
    // compaction rewrite is lossless, so the same recomputed ranking.
    "bm25_index_compact" -> bm25SparkPort,

    // stream_bm25_ingest: the four-trigger streamed chain serves the
    // identical ranking as a never-streamed index.
    "stream_bm25_ingest" -> bm25SparkPort,

    // Spark-dialect image of Streaming.streamIvfIngestSql — the
    // streamed IVF chain's end state: quantizer sampled from the first
    // trigger's slice (vec_id % 4 = 0), full-corpus assignment under
    // it, standard probe-and-rank serve. stream_ivf_compact shares the
    // text: compaction is gated as serving-invisible.
    "stream_ivf_ingest" ->
      s"""WITH e AS (SELECT vec_id,
         |    transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
         |  FROM embeddings),
         |b AS (SELECT vec_id, cv FROM e WHERE vec_id % 4 = 0),
         |mm AS (SELECT greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*)) / 2) AS BIGINT)) AS m FROM b),
         |cents AS (SELECT vec_id AS cent_id, cv AS cvec FROM b CROSS JOIN mm
         |  WHERE CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
         |ad AS (SELECT e.vec_id, e.cv, c.cent_id,
         |    CAST(aggregate(zip_with(e.cv, c.cvec, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
         |  FROM e CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, cv, cent_id FROM (
         |    SELECT vec_id, cv, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cent_id) AS rn
         |    FROM ad) t WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < 5),
         |pd AS (SELECT q.query_id, q.qv, c.cent_id,
         |    CAST(aggregate(zip_with(q.qv, c.cvec, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
         |  FROM q CROSS JOIN cents c),
         |probes AS (SELECT query_id, qv, cent_id FROM (
         |    SELECT query_id, qv, cent_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
         |    FROM pd) t WHERE rn <= 8),
         |sc AS (SELECT p.query_id, a.vec_id,
         |    CAST(aggregate(zip_with(p.qv, a.cv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, z) -> acc + z) AS BIGINT) AS qdot
         |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
         |  WHERE a.vec_id <> p.query_id)
         |SELECT query_id, vec_id, qdot, rank FROM (
         |  SELECT query_id, vec_id, qdot,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY qdot DESC, vec_id) AS BIGINT) AS rank
         |  FROM sc) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,


    // mm_phash_dedup: Spark-dialect image of MultiModal.mmPhashDedupSql
    // — blocked md5-nibble fingerprint, banded candidates, star
    // collapse. shiftleft/shiftright replace DuckDB's << >>; blen
    // floor-div via DIV on non-negative operands.
    "mm_phash_dedup" -> {
      import operators.MultiModal.{PHASH_BLOCKS, PHASH_MAXDIFF}
      val nibSum = (0 until PHASH_BLOCKS).map(i =>
        s"shiftleft(CAST(conv(substr(md5(substring(t, $i*blen + 1, greatest(blen, 1))), 1, 1), 16, 10) AS BIGINT), ${4 * i})")
        .mkString(" +\n         |    ")
      val diffExpr = (0 until PHASH_BLOCKS).map(i =>
        s"CASE WHEN (shiftrightunsigned(x.sig, ${4 * i}) & 15) <> (shiftrightunsigned(y.sig, ${4 * i}) & 15) THEN 1 ELSE 0 END")
        .mkString(" + ")
      val diffAB = (0 until PHASH_BLOCKS).map(i =>
        s"CASE WHEN (shiftrightunsigned(sig_a, ${4 * i}) & 15) <> (shiftrightunsigned(sig_b, ${4 * i}) & 15) THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH m AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
         |par AS (SELECT doc_id, t,
         |    greatest(CAST(1 AS BIGINT), (length(t) + ${PHASH_BLOCKS - 1}) DIV $PHASH_BLOCKS) AS blen FROM m),
         |sig AS (SELECT doc_id,
         |    $nibSum AS sig
         |  FROM par),
         |reps AS (SELECT sig, min(doc_id) AS rep, count(*) AS cnt FROM sig GROUP BY sig),
         |bnd AS (SELECT sig, b AS band_idx, shiftrightunsigned(sig, CAST(b * 20 AS INT)) & 1048575 AS band_val
         |  FROM reps LATERAL VIEW explode(array(0, 1, 2)) c AS b),
         |sp AS (SELECT DISTINCT x.sig AS sig_a, y.sig AS sig_b
         |  FROM bnd x JOIN bnd y ON x.band_idx = y.band_idx
         |    AND x.band_val = y.band_val AND x.sig < y.sig
         |  WHERE ($diffExpr) <= $PHASH_MAXDIFF),
         |hp AS (SELECT sig_a, sig_b, CAST($diffAB AS INT) AS n_diff_blocks FROM sp),
         |crossp AS (SELECT least(ra.rep, rb.rep) AS doc_a,
         |    greatest(ra.rep, rb.rep) AS doc_b, hp.n_diff_blocks
         |  FROM hp JOIN reps ra ON hp.sig_a = ra.sig
         |          JOIN reps rb ON hp.sig_b = rb.sig),
         |star AS (SELECT r.rep AS doc_a, s.doc_id AS doc_b, CAST(0 AS INT) AS n_diff_blocks
         |  FROM sig s JOIN reps r ON s.sig = r.sig
         |  WHERE r.cnt > 1 AND s.doc_id <> r.rep)
         |SELECT doc_a, doc_b, n_diff_blocks
         |FROM (SELECT * FROM crossp UNION ALL SELECT * FROM star) u
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // stream_ivf_gate: Spark-dialect image of Streaming.streamIvfGateSql
    // — quantizer sampled from the indexed slice (vec_id % 7 <> 3),
    // slice assignment under it, per-incoming probe of the nearest
    // cells, best-match dot, frozen-threshold verdict.
    "stream_ivf_gate" -> {
      val th = streaming.Streaming.IVF_GATE_THRESHOLD
      s"""WITH e AS (SELECT vec_id,
         |    transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
         |  FROM embeddings),
         |b AS (SELECT vec_id, cv FROM e WHERE vec_id % 7 <> 3),
         |mm AS (SELECT greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*)) / 2) AS BIGINT)) AS m FROM b),
         |cents AS (SELECT vec_id AS cent_id, cv AS cvec FROM b CROSS JOIN mm
         |  WHERE CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
         |ad AS (SELECT b.vec_id, b.cv, c.cent_id,
         |    CAST(aggregate(zip_with(b.cv, c.cvec, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
         |  FROM b CROSS JOIN cents c),
         |assigned AS (SELECT vec_id, cv, cent_id FROM (
         |    SELECT vec_id, cv, cent_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cent_id) AS rn
         |    FROM ad) t WHERE rn = 1),
         |inc AS (SELECT vec_id AS in_id, cv AS qv FROM e WHERE vec_id % 7 = 3),
         |pd AS (SELECT i.in_id, i.qv, c.cent_id,
         |    CAST(aggregate(zip_with(i.qv, c.cvec, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
         |  FROM inc i CROSS JOIN cents c),
         |probes AS (SELECT in_id, qv, cent_id FROM (
         |    SELECT in_id, qv, cent_id,
         |      row_number() OVER (PARTITION BY in_id ORDER BY cdot DESC, cent_id) AS rn
         |    FROM pd) t WHERE rn <= ${operators.Similarity.IVFX_NPROBE}),
         |sc AS (SELECT p.in_id, a.vec_id AS match_id,
         |    CAST(aggregate(zip_with(p.qv, a.cv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, z) -> acc + z) AS BIGINT) AS qdot
         |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id),
         |best AS (SELECT in_id, match_id, qdot,
         |    row_number() OVER (PARTITION BY in_id ORDER BY qdot DESC, match_id) AS rn
         |  FROM sc)
         |SELECT i.in_id AS vec_id,
         |  COALESCE(b.match_id, CAST(-1 AS BIGINT)) AS best_match,
         |  COALESCE(b.qdot, CAST(0 AS BIGINT)) AS qdot,
         |  CASE WHEN COALESCE(b.qdot, CAST(0 AS BIGINT)) >= ${th}L THEN 'dup_suspect'
         |       ELSE 'pass' END AS verdict
         |FROM (SELECT in_id FROM inc) i
         |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (in_id)
         |ORDER BY vec_id""".stripMargin
    },

    // rag_context_pack: same scoring chain as bm25_retrieval's port,
    // candidate cut at 16 then the budget running sum.
    "rag_context_pack" -> {
      val vals = operators.TrainOps5.BM25_QUERIES
        .map { case (id, t) => s"($id, '$t')" }.mkString(", ")
      val k1 = operators.TrainOps5.BM25_K1
      val b = operators.TrainOps5.BM25_B
      val cand = operators.TrainOps5.RAG_CAND
      val budget = operators.TrainOps5.RAG_BUDGET
      s"""WITH queries AS (SELECT CAST(query_id AS BIGINT) AS query_id, qtext
         |  FROM VALUES $vals AS t(query_id, qtext)),
         |qterms AS (SELECT query_id, explode(split(qtext, ' ')) AS term FROM queries),
         |terms AS (SELECT DISTINCT term FROM qterms),
         |docs AS (SELECT doc_id,
         |  filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |dld AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS dl FROM docs),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |                 CAST(sum(dl) AS BIGINT) AS t_tokens FROM dld),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
         |  FROM (SELECT doc_id, dl, explode(toks) AS token FROM dld) t
         |  JOIN terms ON token = term
         |  GROUP BY doc_id, token),
         |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
         |scored AS (SELECT tf.doc_id, tf.token, tf.dl,
         |    CAST(floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
         |      ((tf * ($k1 + 1.0)) / (tf + ($k1 * ((1.0 - $b) +
         |        (($b * dl) / (CAST(t_tokens AS DOUBLE) / n_docs))))))) * 1e6 + 0.5) AS BIGINT) AS w_micros
         |  FROM tf JOIN dfreq USING (token), stats),
         |pairs AS (SELECT query_id, doc_id,
         |    CAST(sum(w_micros) AS BIGINT) AS score_micros,
         |    max(scored.dl) AS dl
         |  FROM scored JOIN qterms ON scored.token = qterms.term
         |  GROUP BY query_id, doc_id),
         |ranked AS (SELECT query_id, doc_id, score_micros, dl,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_micros DESC, doc_id) AS BIGINT) AS rank
         |  FROM pairs),
         |packed AS (SELECT query_id, rank, doc_id, dl,
         |    CAST(sum(dl) OVER (PARTITION BY query_id ORDER BY rank
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM ranked WHERE rank <= $cand)
         |SELECT query_id, rank, doc_id, dl, cum_tokens,
         |       cum_tokens <= ${budget}L AS included
         |FROM packed ORDER BY query_id, rank""".stripMargin
    },

    // text_lm_bigram: range/list indexing → sequence + element_at,
    // // → DIV (non-negative operands, identical results).
    "text_lm_bigram" ->
      """WITH base AS (SELECT doc_id,
        |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |prs AS (SELECT doc_id, element_at(toks, CAST(i AS INT)) AS w1,
        |               element_at(toks, CAST(i + 1 AS INT)) AS w2
        |  FROM (SELECT doc_id, toks FROM base WHERE size(toks) >= 2) s
        |  LATERAL VIEW explode(sequence(1, size(toks) - 1)) u AS i),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM prs GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        |vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
        |  FROM (SELECT explode(toks) AS t FROM base)),
        |typed AS (SELECT w1, w2,
        |    CAST(floor(ln(CAST(c1 + v AS DOUBLE) / (c2 + 1)) * 1e6 + 0.5) AS BIGINT) AS nll_micros
        |  FROM c2 JOIN c1 USING (w1), vocab),
        |scored AS (SELECT doc_id, nll_micros FROM prs JOIN typed USING (w1, w2)),
        |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(nll_micros) AS BIGINT) AS nll_micros
        |  FROM scored GROUP BY doc_id)
        |SELECT b.doc_id,
        |  COALESCE(n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
        |  COALESCE(nll_micros, CAST(0 AS BIGINT)) AS nll_micros,
        |  CASE WHEN COALESCE(n_pairs, 0) = 0 THEN CAST(0 AS BIGINT)
        |       ELSE COALESCE(nll_micros, 0) DIV n_pairs END AS mean_nll_micros
        |FROM (SELECT doc_id FROM base) b LEFT JOIN per_doc USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    // quality_classifier: list_sum/list_distinct → aggregate/
    // array_distinct; identical frozen weights and op sequence.
    "quality_classifier" -> {
      val (w0, w1, w2, w3, w4) = operators.TrainOps5.QC_W
      val sw = operators.TrainOps5.QC_STOPWORDS.map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |feat AS (SELECT doc_id,
         |    CAST(size(toks) AS BIGINT) AS n_tokens,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS DOUBLE) / size(toks) END AS mean_len,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(size(filter(toks, x -> x IN ($sw))) AS DOUBLE) / size(toks) END AS stop_ratio,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) END AS distinct_ratio
         |  FROM base),
         |z AS (SELECT doc_id, n_tokens, mean_len, stop_ratio, distinct_ratio,
         |    ((($w0 + ($w1 * n_tokens)) + ($w2 * mean_len)) + (($w3 * stop_ratio) + ($w4 * distinct_ratio))) AS z
         |  FROM feat)
         |SELECT doc_id, n_tokens,
         |  CAST(floor(mean_len * 1e6 + 0.5) AS BIGINT) AS mean_len_micros,
         |  CAST(floor(stop_ratio * 1e6 + 0.5) AS BIGINT) AS stop_ratio_micros,
         |  CAST(floor(distinct_ratio * 1e6 + 0.5) AS BIGINT) AS distinct_ratio_micros,
         |  CAST(floor((1.0 / (1.0 + exp(-z))) * 1e6 + 0.5) AS BIGINT) AS score_micros,
         |  CAST(floor((1.0 / (1.0 + exp(-z))) * 1e6 + 0.5) AS BIGINT) >= 500000 AS keep
         |FROM z ORDER BY doc_id""".stripMargin
    },

    // stream_bm25_gate: unnest/list_filter → explode/filter via
    // LATERAL VIEW; identical scoring operation sequence and frozen
    // GATE_TERMS/GATE_THRESHOLD constants (batch twin of the
    // retrieval-scored ingest gate; the SQL face recomputes the index
    // postings from documents).
    "stream_bm25_gate" -> {
      val k1 = operators.TrainOps5.BM25_K1
      val b = operators.TrainOps5.BM25_B
      val gt = streaming.Streaming.GATE_TERMS
      val th = streaming.Streaming.GATE_THRESHOLD
      val cap = streaming.Streaming.GATE_POSTINGS_CAP
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |corpus AS (SELECT doc_id AS match_id, toks,
         |    CAST(size(toks) AS BIGINT) AS dl
         |  FROM base WHERE doc_id % 7 <> 3),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |                 CAST(sum(dl) AS BIGINT) AS t_tokens FROM corpus),
         |postings AS (SELECT match_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
         |  FROM (SELECT match_id, dl, explode(toks) AS token FROM corpus) t
         |  GROUP BY match_id, token),
         |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY token),
         |inc AS (SELECT doc_id, toks FROM base WHERE doc_id % 7 = 3),
         |iterms AS (SELECT DISTINCT doc_id AS in_id, token
         |  FROM (SELECT doc_id, explode(toks) AS token FROM inc) t),
         |ranked AS (SELECT in_id, token, df,
         |    row_number() OVER (PARTITION BY in_id ORDER BY df, token) AS rn
         |  FROM iterms JOIN dfreq USING (token)),
         |qt AS (SELECT in_id, token, df FROM ranked WHERE rn <= $gt),
         |capped AS (SELECT match_id, token, tf, dl FROM (
         |    SELECT match_id, token, tf, dl,
         |      row_number() OVER (PARTITION BY token ORDER BY tf DESC, match_id) AS prn
         |    FROM postings) p WHERE prn <= $cap),
         |scored AS (SELECT qt.in_id, p.match_id,
         |    CAST(floor((ln(1.0 + (n_docs - qt.df + 0.5) / (qt.df + 0.5)) *
         |      ((tf * ($k1 + 1.0)) / (tf + ($k1 * ((1.0 - $b) +
         |        (($b * p.dl) / (CAST(t_tokens AS DOUBLE) / n_docs))))))) * 1e6 + 0.5) AS BIGINT) AS w_micros
         |  FROM qt JOIN capped p USING (token), stats),
         |pairs AS (SELECT in_id, match_id,
         |    CAST(sum(w_micros) AS BIGINT) AS score_micros,
         |    CAST(count(*) AS BIGINT) AS n_terms_hit
         |  FROM scored GROUP BY in_id, match_id),
         |best AS (SELECT in_id, match_id, score_micros, n_terms_hit,
         |    row_number() OVER (PARTITION BY in_id
         |      ORDER BY score_micros DESC, match_id) AS rn
         |  FROM pairs)
         |SELECT i.doc_id,
         |  COALESCE(b.match_id, CAST(-1 AS BIGINT)) AS best_match,
         |  COALESCE(b.score_micros, CAST(0 AS BIGINT)) AS score_micros,
         |  COALESCE(b.n_terms_hit, CAST(0 AS BIGINT)) AS n_terms_hit,
         |  CASE WHEN COALESCE(b.score_micros, CAST(0 AS BIGINT)) >= ${th}L THEN 'dup_suspect'
         |       ELSE 'pass' END AS verdict
         |FROM (SELECT doc_id FROM inc) i
         |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON i.doc_id = b.in_id
         |ORDER BY i.doc_id""".stripMargin
    },

    // stream_quality_gate: the classifier port plus the routing
    // verdict (batch twin of the streaming gate).
    "stream_quality_gate" -> {
      val (w0, w1, w2, w3, w4) = operators.TrainOps5.QC_W
      val sw = operators.TrainOps5.QC_STOPWORDS.map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |feat AS (SELECT doc_id,
         |    CAST(size(toks) AS BIGINT) AS n_tokens,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS DOUBLE) / size(toks) END AS mean_len,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(size(filter(toks, x -> x IN ($sw))) AS DOUBLE) / size(toks) END AS stop_ratio,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) END AS distinct_ratio
         |  FROM base),
         |z AS (SELECT doc_id, n_tokens,
         |    ((($w0 + ($w1 * n_tokens)) + ($w2 * mean_len)) + (($w3 * stop_ratio) + ($w4 * distinct_ratio))) AS z
         |  FROM feat),
         |sc AS (SELECT doc_id, n_tokens,
         |    CAST(floor((1.0 / (1.0 + exp(-z))) * 1e6 + 0.5) AS BIGINT) AS score_micros
         |  FROM z)
         |SELECT doc_id, n_tokens, score_micros,
         |  CASE WHEN n_tokens < 5 THEN 'too_short'
         |       WHEN score_micros < 500000 THEN 'low_score'
         |       ELSE 'pass' END AS verdict
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    // dedup_paragraph: list slicing → slice(), range → sequence via
    // LATERAL VIEW, window keeper → the engine's min(struct) form
    // (identical lexicographic semantics, skew-safe partial agg).
    "dedup_paragraph" -> {
      val w = operators.TrainOps5.PARA_W
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sized AS (SELECT doc_id, toks, size(toks) AS n FROM base),
         |chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
         |    md5(array_join(slice(toks, i * $w + 1, $w), ' ')) AS ckey,
         |    CAST(size(slice(toks, i * $w + 1, $w)) AS BIGINT) AS ntok
         |  FROM (SELECT doc_id, toks, n FROM sized WHERE n > 0) s
         |  LATERAL VIEW explode(sequence(0, CAST(ceil(n / $w.0) AS INT) - 1)) u AS i),
         |keepers AS (SELECT ckey, min(struct(doc_id, idx)) AS kk FROM chunks GROUP BY ckey),
         |flagged AS (SELECT c.doc_id, c.idx, c.ntok,
         |    (c.doc_id = kk.doc_id AND c.idx = kk.idx) AS kept
         |  FROM chunks c JOIN keepers k ON c.ckey = k.ckey),
         |per_doc AS (SELECT doc_id,
         |    CAST(count(*) AS BIGINT) AS n_chunks,
         |    CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
         |    CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN kept THEN ntok ELSE 0 END) AS BIGINT) AS tokens_kept
         |  FROM flagged GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(n_chunks, CAST(0 AS BIGINT)) AS n_chunks,
         |  COALESCE(n_removed, CAST(0 AS BIGINT)) AS n_removed,
         |  COALESCE(n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
         |  COALESCE(tokens_kept, CAST(0 AS BIGINT)) AS tokens_kept,
         |  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(floor((n_tokens - tokens_kept) * 1000000 / n_tokens) AS BIGINT)
         |  END AS removed_ppm
         |FROM (SELECT doc_id FROM base) d LEFT JOIN per_doc USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "bpe_tokenize" -> bpeTokenizeSpark,

    "bpe_apply_batch" -> bpeApplyBatchSpark,

    "bpe_pair_counts" ->
      """WITH tok AS (SELECT explode(split(text, ' ')) AS tok FROM documents),
        |p AS (SELECT pair
        |      FROM (SELECT tok FROM tok WHERE length(tok) >= 2) x
        |      LATERAL VIEW explode(
        |        transform(sequence(1, length(tok) - 1), i -> substr(tok, CAST(i AS INT), 2))) t AS pair),
        |cnt AS (SELECT pair, COUNT(*) AS c FROM p GROUP BY pair),
        |top AS (SELECT pair, c FROM cnt ORDER BY c DESC, pair LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY c DESC, pair) AS BIGINT) AS rank, pair, c
        |FROM top ORDER BY rank""".stripMargin,

    "shuffle_epoch" ->
      """WITH ep AS (SELECT doc_id, e.epoch
        |           FROM documents
        |           CROSS JOIN (SELECT explode(sequence(0, 1)) AS epoch) e),
        |keyed AS (SELECT epoch, doc_id,
        |            CAST(conv(substr(md5(CAST(epoch AS STRING) || '_' || CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS k
        |          FROM ep)
        |SELECT epoch, k % 32 AS shard,
        |  CAST(row_number() OVER (PARTITION BY epoch, k % 32
        |    ORDER BY k, doc_id) AS BIGINT) AS pos,
        |  doc_id
        |FROM keyed ORDER BY epoch, shard, pos""".stripMargin,

    "sketch_cms_exact" ->
      """WITH toks AS (SELECT explode(split(text, ' ')) AS w FROM documents),
        |truth AS (SELECT w, COUNT(*) AS true_cnt FROM toks GROUP BY w),
        |rows_ AS (SELECT explode(sequence(0, 3)) AS r),
        |sk AS (SELECT r,
        |         CAST(conv(substr(md5('c' || CAST(r AS STRING) || '_' || w), 1, 15), 16, 10) AS BIGINT)
        |           % 1024 AS bucket,
        |         COUNT(*) AS cell
        |       FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
        |queried AS (SELECT w, true_cnt FROM truth ORDER BY true_cnt DESC, w LIMIT 20),
        |est AS (SELECT q.w, q.true_cnt, MIN(sk.cell) AS cms_est
        |        FROM queried q CROSS JOIN rows_
        |        JOIN sk ON sk.r = rows_.r AND sk.bucket =
        |          CAST(conv(substr(md5('c' || CAST(rows_.r AS STRING) || '_' || q.w), 1, 15), 16, 10) AS BIGINT)
        |            % 1024
        |        GROUP BY q.w, q.true_cnt)
        |SELECT w, true_cnt, cms_est, cms_est - true_cnt AS overcount
        |FROM est ORDER BY true_cnt DESC, w""".stripMargin,

    // The oracle's `key IN (SELECT …)` projection is rewritten as a
    // LEFT JOIN membership probe — Spark keeps IN-predicate subqueries
    // out of the SELECT list (md5 keys are never NULL, so the join is
    // exactly the COALESCE(IN, FALSE) the oracle computes).
    "sketch_bloom_exact" ->
      """WITH keyc AS (SELECT DISTINCT
        |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS key
        |       FROM documents WHERE text IS NOT NULL),
        |ks AS (SELECT explode(sequence(0, 2)) AS k),
        |bits AS (SELECT DISTINCT ks.k,
        |           CAST(conv(substr(md5('b' || CAST(ks.k AS STRING) || '_' || key), 1, 15), 16, 10) AS BIGINT)
        |             % 8192 AS bit
        |         FROM keyc CROSS JOIN ks),
        |head AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |inc AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS key FROM head
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    md5(regexp_replace(lower(trim('novel ' || text)), '\\s+', ' ')) FROM head),
        |probes AS (SELECT doc_id, key, ks.k,
        |             CAST(conv(substr(md5('b' || CAST(ks.k AS STRING) || '_' || key), 1, 15), 16, 10) AS BIGINT)
        |               % 8192 AS bit
        |           FROM inc CROSS JOIN ks),
        |hc AS (SELECT p.doc_id, p.key,
        |         SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nbits
        |       FROM probes p LEFT JOIN bits b ON b.k = p.k AND b.bit = p.bit
        |       GROUP BY p.doc_id, p.key)
        |SELECT hc.doc_id, nbits = 3 AS in_bloom,
        |  (kc.key IS NOT NULL) AS is_member,
        |  nbits = 3 AND kc.key IS NULL AS false_positive
        |FROM hc LEFT JOIN keyc kc ON hc.key = kc.key
        |ORDER BY doc_id""".stripMargin,

    "sketch_quantile_exact" ->
      """WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |           FROM lineitem),
        |st AS (SELECT min(c) AS mn, max(c) AS mx, COUNT(*) AS n FROM v),
        |binned AS (SELECT CAST((c - mn) * 1024 div (mx - mn + 1) AS BIGINT) AS bin,
        |             COUNT(*) AS cnt
        |           FROM v CROSS JOIN st GROUP BY 1),
        |cum AS (SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |        FROM binned),
        |q AS (SELECT q_pct, mn, mx,
        |        CAST((q_pct * n + 99) div 100 AS BIGINT) AS k
        |      FROM st CROSS JOIN (SELECT explode(array(1, 5, 25, 50, 75, 95, 99)) AS q_pct) p),
        |sel AS (SELECT q.q_pct, q.k, q.mn, q.mx, MIN(cum.bin) AS qbin
        |        FROM q JOIN cum ON cum.cum >= q.k
        |        GROUP BY q.q_pct, q.k, q.mn, q.mx)
        |SELECT CAST(q_pct AS BIGINT) AS q_pct, qbin,
        |  CAST(mn + (qbin * (mx - mn + 1)) div 1024 AS BIGINT) AS est_cents, k
        |FROM sel ORDER BY q_pct""".stripMargin,

    "sketch_kmv_exact" ->
      """WITH h AS (SELECT DISTINCT
        |         CAST(conv(substr(md5(
        |           regexp_replace(lower(trim(text)), '\\s+', ' ')), 1, 15), 16, 10) AS BIGINT) AS h
        |       FROM documents WHERE text IS NOT NULL),
        |kmin AS (SELECT max(h) AS kth, COUNT(*) AS kk
        |         FROM (SELECT h FROM h ORDER BY h LIMIT 64) t),
        |truth AS (SELECT COUNT(*) AS true_distinct FROM h)
        |SELECT kk, kth, true_distinct,
        |  CAST(CASE WHEN kk < 64 THEN kk
        |       ELSE ((kk - 1) * 1073741824) div greatest(1, kth div 1073741824)
        |       END AS BIGINT) AS est_distinct
        |FROM kmin CROSS JOIN truth""".stripMargin,

    "ann_lsh_exact" ->
      """WITH e AS (SELECT vec_id,
        |             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
        |           FROM embeddings),
        |dims AS (SELECT explode(sequence(0, 63)) AS j),
        |signs AS (SELECT p, dims.j,
        |    CASE WHEN CAST(conv(substr(md5('a_' || CAST(p AS STRING) || '_' || CAST(dims.j AS STRING)), 1, 15), 16, 10) AS BIGINT) & 1 = 1
        |         THEN 1 ELSE -1 END AS s
        |  FROM (SELECT explode(sequence(0, 7)) AS p) pp CROSS JOIN dims),
        |bd AS (SELECT e.vec_id, signs.p, SUM(element_at(e.cv, signs.j + 1) * signs.s) AS dot
        |       FROM e CROSS JOIN signs GROUP BY e.vec_id, signs.p),
        |bk AS (SELECT vec_id, SUM(CASE WHEN dot > 0 THEN shiftleft(1, p) ELSE 0 END) AS bucket
        |       FROM bd GROUP BY vec_id),
        |q AS (SELECT e.vec_id AS query_id, e.cv AS qv, bk.bucket AS qb
        |      FROM e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 5),
        |qp AS (SELECT query_id, qv, qb ^ f AS qbucket
        |       FROM q CROSS JOIN (SELECT explode(array(0, 1, 2, 4, 8, 16, 32, 64, 128)) AS f) pr),
        |cand AS (SELECT qp.query_id, bk.vec_id, qp.qv
        |         FROM qp JOIN bk ON bk.bucket = qp.qbucket
        |         WHERE bk.vec_id <> qp.query_id),
        |scored AS (SELECT c.query_id, c.vec_id,
        |             CAST(aggregate(zip_with(c.qv, e.cv, (x, y) -> x * y),
        |               CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
        |           FROM cand c JOIN e ON e.vec_id = c.vec_id),
        |rk AS (SELECT query_id, vec_id, qdot,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
        |       FROM scored)
        |SELECT query_id, vec_id, qdot, rnk AS rank FROM rk
        |WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "ann_quantized" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |     c AS (SELECT vec_id,
        |             transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
        |           FROM embeddings),
        |     scored AS (
        |       SELECT q.query_id, c.vec_id,
        |              CAST(aggregate(zip_with(qv, cv, (x, y) -> x * y),
        |                CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
        |       FROM q JOIN c ON c.vec_id <> q.query_id),
        |     ranked AS (SELECT query_id, vec_id, qdot,
        |              CAST(row_number() OVER (PARTITION BY query_id
        |                ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
        |        FROM scored)
        |SELECT query_id, vec_id, qdot, rnk AS rank FROM ranked
        |WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "knn_graph" ->
      """WITH sz AS (SELECT label, COUNT(*) AS lsz FROM embeddings GROUP BY label),
        |v AS (SELECT vec_id, e.label,
        |        transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS qv,
        |        CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
        |          % CAST(ceil(lsz / 512.0) AS BIGINT) AS sub
        |      FROM embeddings e JOIN sz ON e.label = sz.label),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst, a.label AS label,
        |    CAST(aggregate(zip_with(a.qv, b.qv, (x, y) -> x * y),
        |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS score
        |  FROM v a JOIN v b ON a.label = b.label AND a.sub = b.sub
        |    AND a.vec_id <> b.vec_id),
        |edges AS (
        |  SELECT src, dst, label, score, rank FROM (
        |    SELECT src, dst, label, score,
        |      CAST(row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS BIGINT) AS rank
        |    FROM pairs) rkd
        |  WHERE rank <= 5)
        |SELECT e.src, e.dst, e.label, e.score, e.rank,
        |  (r.src IS NOT NULL) AS is_mutual
        |FROM edges e LEFT JOIN edges r ON e.src = r.dst AND e.dst = r.src
        |ORDER BY e.src, e.rank""".stripMargin,

    "stream_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "stream_topk_types" ->
      """WITH c AS (
        |  SELECT timestamp_micros((unix_micros(ts) div 3600000000) * 3600000000) AS w_start,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT w_start, event_type, n,
        |        CAST(row_number() OVER (PARTITION BY w_start
        |          ORDER BY n DESC, event_type) AS BIGINT) AS rank
        |      FROM c)
        |SELECT w_start, event_type, n, rank
        |FROM r WHERE rank <= 3 ORDER BY w_start, rank""".stripMargin,

    "stream_window_counts" ->
      """WITH tumb AS (
        |  SELECT 'tumbling' AS kind,
        |    timestamp_micros((unix_micros(ts) div 3600000000) * 3600000000) AS w_start,
        |    event_type, value
        |  FROM events),
        |slid AS (
        |  SELECT 'sliding' AS kind, w_start, event_type, value
        |  FROM events
        |  LATERAL VIEW explode(array(
        |      timestamp_micros((unix_micros(ts) div 1800000000) * 1800000000),
        |      timestamp_micros((unix_micros(ts) div 1800000000) * 1800000000 - 1800000000))) t AS w_start),
        |u AS (SELECT * FROM tumb UNION ALL SELECT * FROM slid)
        |SELECT kind, w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM u GROUP BY kind, w_start, event_type
        |ORDER BY kind, w_start, event_type""".stripMargin,

    "stream_dup_gate_exact" ->
      """WITH fpc AS (SELECT aggregate(transform(split(text, ' '), t ->
        |      CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % 2147483647),
        |    CAST(0 AS BIGINT), (a, h) -> (a * 1000003 + h) % 2147483647) AS f FROM documents),
        |head AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |incoming AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM head
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, 'novel ' || text AS text FROM head),
        |inf AS (SELECT doc_id, aggregate(transform(split(text, ' '), t ->
        |      CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % 2147483647),
        |    CAST(0 AS BIGINT), (a, h) -> (a * 1000003 + h) % 2147483647) AS f FROM incoming)
        |SELECT DISTINCT doc_id FROM inf WHERE f IN (SELECT f FROM fpc)
        |ORDER BY doc_id""".stripMargin,

    "pipe_clean_corpus" ->
      """WITH scored AS (
        |  SELECT doc_id, text,
        |    CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(size(filter(split(text, ' '), x -> array_contains(array('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is'), x))) AS DOUBLE)
        |      / size(split(text, ' ')) AS stop_ratio,
        |    CAST(size(array_intersect(split(text, ' '), array('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS score_en,
        |    CAST(size(array_intersect(split(text, ' '), array('el', 'la', 'de', 'los', 'las', 'y', 'que'))) AS BIGINT) AS score_es,
        |    CAST(size(array_intersect(split(text, ' '), array('le', 'les', 'et', 'des', 'un', 'une', 'du'))) AS BIGINT) AS score_fr,
        |    CAST(size(array_intersect(split(text, ' '), array('der', 'die', 'das', 'und', 'ein', 'zu', 'den'))) AS BIGINT) AS score_de,
        |    CAST(size(array_intersect(split(text, ' '), array('的', '了', '是', '在', '我', '有', '和'))) AS BIGINT) AS score_zh
        |  FROM documents),
        |flagged AS (
        |  SELECT *, greatest(score_en, score_es, score_fr, score_de, score_zh) AS best FROM scored),
        |kept AS (
        |  SELECT doc_id, text, n_tokens FROM flagged
        |  WHERE n_tokens >= 30 AND stop_ratio > 0
        |    AND (CASE WHEN score_en = best THEN 'en' WHEN score_es = best THEN 'es'
        |              WHEN score_fr = best THEN 'fr' WHEN score_de = best THEN 'de'
        |              WHEN score_zh = best THEN 'zh' END) = 'en')
        |SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens, COUNT(*) AS n_dups
        |FROM kept
        |GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' '))
        |ORDER BY doc_id""".stripMargin,

    "pipe_quality_funnel" ->
      """WITH t AS (SELECT doc_id, lang, explode(split(text, ' ')) AS tok FROM documents),
        |g AS (SELECT doc_id, lang, tok, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
        |pd AS (SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n,
        |         CAST(MAX(c) AS BIGINT) AS maxc, COUNT(*) AS nd
        |       FROM g GROUP BY 1, 2),
        |f AS (SELECT (n >= 20 AND n <= 1000) AS f1, (lang = 'en') AS f2,
        |        (maxc * 8 <= n) AS f3, (nd * 5 >= n * 2) AS f4 FROM pd),
        |c AS (SELECT COUNT(*) AS s0,
        |        CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        |        CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        |        CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        |        CAST(SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
        |      FROM f),
        |st AS (
        |  SELECT 1 AS stage, 'length' AS gate, s0 AS n_in, s0 - s1 AS n_dropped, s1 AS n_out FROM c
        |  UNION ALL SELECT 2, 'language', s1, s1 - s2, s2 FROM c
        |  UNION ALL SELECT 3, 'repetition', s2, s2 - s3, s3 FROM c
        |  UNION ALL SELECT 4, 'diversity', s3, s3 - s4, s4 FROM c)
        |SELECT CAST(stage AS BIGINT) AS stage, gate, n_in, n_dropped, n_out,
        |  CAST(CASE WHEN n_in = 0 THEN 0L ELSE (n_dropped * 1000000) div n_in END AS BIGINT) AS drop_ppm
        |FROM st ORDER BY stage""".stripMargin,

    // Same UNION-recursion limitation as dedup_cluster_exact: the CC
    // stage is the unrolled hop + pointer-jump chain.
    "pipe_dedup_e2e" ->
      """WITH nh AS (SELECT doc_id, coalesce(text, '') AS text, n_chars,
        |         md5(regexp_replace(lower(trim(coalesce(text, ''))), '\\s+', ' ')) AS h
        |       FROM documents),
        |kp AS (SELECT h, MIN(doc_id) AS keep FROM nh GROUP BY h),
        |exact_dups AS (
        |  SELECT nh.doc_id, 'exact_dup' AS status, kp.keep AS canonical
        |  FROM nh JOIN kp ON nh.h = kp.h WHERE nh.doc_id <> kp.keep),
        |survivors AS (
        |  SELECT nh.doc_id, nh.text, nh.n_chars
        |  FROM nh JOIN kp ON nh.h = kp.h AND nh.doc_id = kp.keep),
        |n AS (SELECT doc_id,
        |             regexp_replace(lower(trim(text)), '\\s+', ' ') AS t
        |           FROM survivors),
        |tk AS (SELECT doc_id, split(t, ' ') AS w FROM n),
        |sh AS (SELECT doc_id,
        |         array_distinct(CASE WHEN size(w) < 3 THEN array(array_join(w, ' '))
        |           ELSE transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))
        |           END) AS s
        |       FROM tk),
        |b0 AS (SELECT doc_id, s, array_min(s) AS blk FROM sh),
        |sz AS (SELECT blk, COUNT(*) AS bsz FROM b0 GROUP BY blk),
        |b1 AS (
        |  SELECT b0.doc_id, b0.s, b0.blk,
        |    CASE WHEN sz.bsz > 256 THEN coalesce(try_element_at(array_sort(b0.s), 2), '')
        |         ELSE '' END AS sub
        |  FROM b0 JOIN sz ON b0.blk = sz.blk),
        |sz2 AS (SELECT blk, sub, COUNT(*) AS bsz2 FROM b1 GROUP BY blk, sub),
        |bb AS (
        |  SELECT b1.doc_id, b1.s, b1.blk, b1.sub,
        |    CASE WHEN sz2.bsz2 > 256
        |         THEN CAST(conv(substr(md5(CAST(b1.doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)
        |              % CAST(ceil(bsz2 / 128.0) AS BIGINT)
        |         ELSE 0 END AS sub2
        |  FROM b1 JOIN sz2 ON b1.blk = sz2.blk AND b1.sub = sz2.sub),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
        |  FROM bb a JOIN bb b2 ON a.blk = b2.blk AND a.sub = b2.sub
        |    AND a.sub2 = b2.sub2 AND a.doc_id < b2.doc_id
        |  WHERE CAST(size(array_intersect(a.s, b2.s)) AS DOUBLE) /
        |        CAST(size(array_distinct(concat(a.s, b2.s))) AS DOUBLE) >= 0.8),
        |e AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |  UNION SELECT doc_a, doc_a FROM pairs
        |  UNION SELECT doc_b, doc_b FROM pairs),
        |l0 AS (SELECT src AS id, MIN(dst) AS label FROM e GROUP BY src),
        |h1 AS (SELECT e.src AS id, MIN(l0.label) AS label FROM e JOIN l0 ON e.dst = l0.id GROUP BY e.src),
        |j1 AS (SELECT a.id, b.label FROM h1 a JOIN h1 b ON a.label = b.id),
        |h2 AS (SELECT e.src AS id, MIN(j1.label) AS label FROM e JOIN j1 ON e.dst = j1.id GROUP BY e.src),
        |j2 AS (SELECT a.id, b.label FROM h2 a JOIN h2 b ON a.label = b.id),
        |h3 AS (SELECT e.src AS id, MIN(j2.label) AS label FROM e JOIN j2 ON e.dst = j2.id GROUP BY e.src),
        |lbl AS (SELECT id, label AS cid FROM h3),
        |withc AS (
        |  SELECT s.doc_id, s.n_chars, coalesce(l.cid, s.doc_id) AS cid
        |  FROM survivors s LEFT JOIN lbl l ON s.doc_id = l.id),
        |disposed AS (
        |  SELECT doc_id,
        |    first_value(doc_id) OVER (PARTITION BY cid
        |      ORDER BY n_chars DESC, doc_id) AS canonical
        |  FROM withc)
        |SELECT doc_id, status, CAST(canonical AS BIGINT) AS canonical FROM (
        |  SELECT doc_id, status, canonical FROM exact_dups
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN doc_id = canonical THEN 'kept' ELSE 'near_dup' END AS status,
        |    canonical
        |  FROM disposed) u
        |ORDER BY doc_id""".stripMargin,

    "pipe_extract_e2e" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |vision AS (
        |  SELECT doc_id, 'device' AS param, 'mpn' AS field,
        |    'MPN-' || CAST(doc_id AS STRING) AS value
        |  FROM ids WHERE doc_id % 31 <> 0
        |  UNION ALL
        |  SELECT doc_id, 'device', 'voltage_typ',
        |    CAST(CAST(doc_id % 50 AS DOUBLE) / 10.0 AS STRING) || ' V'
        |  FROM ids WHERE doc_id % 31 <> 0),
        |rule AS (
        |  SELECT doc_id, 'device' AS param, 'mpn' AS field,
        |    CASE WHEN doc_id % 13 = 0 THEN 'MPN-' || CAST(2 * doc_id + 1 AS STRING)
        |         ELSE 'MPN-' || CAST(doc_id AS STRING) END AS value
        |  FROM ids
        |  UNION ALL
        |  SELECT doc_id, 'device', 'voltage_typ',
        |    CAST(round(CASE WHEN doc_id % 7 = 0
        |            THEN (CAST(doc_id % 50 AS DOUBLE) / 10.0) * 1.031
        |            ELSE CAST(doc_id % 50 AS DOUBLE) / 10.0 END, 4) AS STRING)
        |      || ' V'
        |  FROM ids),
        |c AS (
        |  SELECT v.doc_id,
        |    (lower(v.field) || '|' || lower(v.param))
        |      RLIKE 'vin|vout|iout|iq|efficiency|power|frequency' AS crit,
        |    TRY_CAST(NULLIF(regexp_replace(trim(v.value), '[^0-9.eE+-]', ''), '') AS DOUBLE) AS n1,
        |    TRY_CAST(NULLIF(regexp_replace(trim(r.value), '[^0-9.eE+-]', ''), '') AS DOUBLE) AS n2,
        |    trim(v.value) = trim(r.value) AS unit_eq,
        |    regexp_replace(regexp_replace(lower(trim(v.value)), '\\s+', ' '), '[.,;:!?]', '') =
        |    regexp_replace(regexp_replace(lower(trim(r.value)), '\\s+', ' '), '[.,;:!?]', '') AS text_eq
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
        |ORDER BY s.doc_id""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, user_id, ts, value, click_ts, click_id, click_value
        |FROM (
        |  SELECT p.event_id, p.user_id, p.ts, p.value,
        |    c.ts AS click_ts, c.click_id, c.click_value,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |      ORDER BY c.ts DESC NULLS LAST, c.click_id DESC NULLS LAST) AS rn
        |  FROM (SELECT user_id, ts, event_id, value FROM events
        |        WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT user_id, ts, event_id AS click_id, value AS click_value
        |             FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts) t
        |WHERE rn = 1
        |ORDER BY user_id, ts, event_id""".stripMargin)

  /** Ports composed from other ports: eval_retrieval reuses the exact
    * ann_quantized / ann_lsh_exact conformance texts as nested CTE
    * subquery blocks (Spark supports WITH inside a derived table), so
    * the eval's SQL face can never drift from the heads it grades;
    * dedup_paragraph_apply mirrors the engine's md5-key keeper with
    * the ordered rebuild as array_sort over (idx, chunk) structs.
    */
  /** Spark-dialect image of Similarity.ivfxAssignCtes (the exact-IVF
    * index recomputed in SQL) — shared by eval_retrieval_ivf and
    * ivf_skew_report so the SQL surface grades/measures the same
    * index definition the oracle does.
    */
  private val ivfxAssignSparkCtes: String =
    """e AS (SELECT vec_id,
      |    transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
      |  FROM embeddings),
      |b AS (SELECT vec_id, cv FROM e WHERE vec_id % 7 <> 3),
      |mm AS (SELECT greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*)) / 2) AS BIGINT)) AS m FROM b),
      |cents AS (SELECT vec_id AS cent_id, cv AS cvec FROM b CROSS JOIN mm
      |  WHERE CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
      |ad AS (SELECT e.vec_id, e.cv, c.cent_id,
      |    CAST(aggregate(zip_with(e.cv, c.cvec, (x, y) -> x * y),
      |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
      |  FROM e CROSS JOIN cents c),
      |assigned AS (SELECT vec_id, cv, cent_id FROM (
      |    SELECT vec_id, cv, cent_id,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cent_id) AS rn
      |    FROM ad) t WHERE rn = 1)""".stripMargin

  /** One Lloyd round of the kmeans_train port (the Spark-dialect image
    * of Retrain.kmRoundSql — unrolled below like the oracle).
    */
  private def kmRoundSpark(i: Int): String = {
    val prev = if (i == 1) "c0" else s"c${i - 1}"
    s"""a${i}p AS (SELECT v.vec_id, v.kv, v.vv, c.cent_id,
       |    CAST(aggregate(zip_with(c.cvec, v.kv, (cc, kx) -> cc * cc - 2 * kx * cc),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
       |  FROM v CROSS JOIN $prev c),
       |a$i AS (SELECT vec_id, kv, vv, cent_id, cost FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cost, cent_id) AS rn FROM a${i}p) t WHERE rn = 1),
       |r$i AS (SELECT CAST($i AS BIGINT) AS iter, cent_id,
       |    CAST(count(*) AS BIGINT) AS n_vecs,
       |    sum(CAST(vv + cost AS DECIMAL(38,0))) AS inertia_dec
       |  FROM a$i GROUP BY cent_id),
       |s$i AS (SELECT cent_id, dim, sum(x) AS sx, count(*) AS c
       |  FROM a$i LATERAL VIEW posexplode(kv) t AS dim, x
       |  GROUP BY cent_id, dim),
       |c$i AS (SELECT cent_id,
       |    transform(array_sort(collect_list(named_struct('dim', dim, 'mean', sx DIV c))), z -> z.mean) AS cvec
       |  FROM s$i GROUP BY cent_id)""".stripMargin
  }

  /** Spark-dialect image of annPqExactSql — also composed into the
    * eval_retrieval_pq port below.
    */
  private val annPqExactSpark: String =
    """WITH e AS (SELECT vec_id,
        |    transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
        |  FROM embeddings),
        |mm AS (SELECT greatest(CAST(1 AS BIGINT), count(*) DIV least(CAST(256 AS BIGINT), greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
        |sub AS (SELECT vec_id, s, slice(cv, s * 8 + 1, 8) AS sv
        |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s),
        |cb AS (SELECT sub.s, sub.vec_id AS code_id, sub.sv AS cw
        |  FROM sub CROSS JOIN mm
        |  WHERE CAST(conv(substr(md5(CAST(sub.vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
        |enc0 AS (SELECT sub.vec_id, sub.s, cb.code_id,
        |    CAST(aggregate(zip_with(cb.cw, sub.sv, (cc, sx) -> cc * cc - 2 * sx * cc),
        |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
        |  FROM sub JOIN cb ON cb.s = sub.s),
        |codes AS (SELECT vec_id, s, code_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
        |      ORDER BY cost, code_id) AS rn FROM enc0) t WHERE rn = 1),
        |qs AS (SELECT vec_id AS query_id, s, slice(cv, s * 8 + 1, 8) AS qv
        |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s WHERE vec_id < 5),
        |lut AS (SELECT q.query_id, cb.s, cb.code_id,
        |    CAST(aggregate(zip_with(q.qv, cb.cw, (x, y) -> x * y),
        |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
        |  FROM qs q JOIN cb ON cb.s = q.s),
        |sc AS (SELECT l.query_id, c.vec_id, CAST(sum(l.qdot) AS BIGINT) AS score
        |  FROM codes c JOIN lut l ON l.s = c.s AND l.code_id = c.code_id
        |  WHERE c.vec_id <> l.query_id
        |  GROUP BY l.query_id, c.vec_id)
        |SELECT query_id, vec_id, score, rank FROM (
        |  SELECT query_id, vec_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
        |  FROM sc) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Spark-dialect image of IvfPq.annIvfpqExactSql — the IVFADC
    * composition over the shared exact-IVF assignment CTEs; also
    * composed into the eval_retrieval_ivfpq port.
    */
  private val annIvfpqSpark: String =
    s"""WITH $ivfxAssignSparkCtes,
       |pmm AS (SELECT greatest(CAST(1 AS BIGINT), count(*) DIV least(CAST(256 AS BIGINT), greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |sub AS (SELECT vec_id, s, slice(cv, s * 8 + 1, 8) AS sv
       |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s),
       |cb AS (SELECT sub.s, sub.vec_id AS code_id, sub.sv AS cw
       |  FROM sub CROSS JOIN pmm
       |  WHERE CAST(conv(substr(md5(CAST(sub.vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
       |enc0 AS (SELECT sub.vec_id, sub.s, cb.code_id,
       |    CAST(aggregate(zip_with(cb.cw, sub.sv, (cc, sx) -> cc * cc - 2 * sx * cc),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
       |  FROM sub JOIN cb ON cb.s = sub.s),
       |codes AS (SELECT vec_id, s, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM enc0) t WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < 5),
       |pd AS (SELECT q.query_id, c.cent_id,
       |    CAST(aggregate(zip_with(q.qv, c.cvec, (x, y) -> x * y),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
       |  FROM q CROSS JOIN cents c),
       |probes AS (SELECT query_id, cent_id FROM (
       |    SELECT query_id, cent_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
       |    FROM pd) t WHERE rn <= 8),
       |qsub AS (SELECT vec_id AS query_id, s, slice(cv, s * 8 + 1, 8) AS qsv
       |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s WHERE vec_id < 5),
       |lut AS (SELECT qsub.query_id, cb.s, cb.code_id,
       |    CAST(aggregate(zip_with(qsub.qsv, cb.cw, (x, y) -> x * y),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
       |  FROM qsub JOIN cb ON cb.s = qsub.s),
       |sc AS (SELECT p.query_id, a.vec_id, CAST(sum(l.qdot) AS BIGINT) AS score
       |  FROM probes p
       |  JOIN assigned a ON a.cent_id = p.cent_id
       |  JOIN codes c ON c.vec_id = a.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.s = c.s AND l.code_id = c.code_id
       |  WHERE a.vec_id <> p.query_id
       |  GROUP BY p.query_id, a.vec_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Spark-dialect image of IvfPq.annIvfpqResidualSql — the residual
    * IVFADC: clamp(cv − cvec) residuals, pqEncode-discipline residual
    * codebooks, coarse-plus-fine score cdot + Σ qdot.
    */
  private val annIvfpqResidualSpark: String = {
    val qb = operators.IvfPq.QBOUND
    s"""WITH $ivfxAssignSparkCtes,
       |rsd AS (SELECT a.vec_id,
       |    zip_with(a.cv, c.cvec, (x, y) ->
       |      greatest(least(x - y, CAST($qb AS BIGINT)), CAST(-$qb AS BIGINT))) AS rv
       |  FROM assigned a JOIN cents c ON c.cent_id = a.cent_id),
       |pmm AS (SELECT greatest(CAST(1 AS BIGINT), count(*) DIV least(CAST(256 AS BIGINT), greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |rsub AS (SELECT vec_id, s, slice(rv, s * 8 + 1, 8) AS sv
       |  FROM rsd LATERAL VIEW explode(sequence(0, 7)) t AS s),
       |rcb AS (SELECT rsub.s, rsub.vec_id AS code_id, rsub.sv AS cw
       |  FROM rsub CROSS JOIN pmm
       |  WHERE CAST(conv(substr(md5(CAST(rsub.vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
       |enc0 AS (SELECT rsub.vec_id, rsub.s, rcb.code_id,
       |    CAST(aggregate(zip_with(rcb.cw, rsub.sv, (cc, sx) -> cc * cc - 2 * sx * cc),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
       |  FROM rsub JOIN rcb ON rcb.s = rsub.s),
       |codes AS (SELECT vec_id, s, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM enc0) t WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < 5),
       |pd AS (SELECT q.query_id, c.cent_id,
       |    CAST(aggregate(zip_with(q.qv, c.cvec, (x, y) -> x * y),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
       |  FROM q CROSS JOIN cents c),
       |probes AS (SELECT query_id, cent_id, cdot FROM (
       |    SELECT query_id, cent_id, cdot,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
       |    FROM pd) t WHERE rn <= 8),
       |qsub AS (SELECT vec_id AS query_id, s, slice(cv, s * 8 + 1, 8) AS qsv
       |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s WHERE vec_id < 5),
       |lut AS (SELECT qsub.query_id, rcb.s, rcb.code_id,
       |    CAST(aggregate(zip_with(qsub.qsv, rcb.cw, (x, y) -> x * y),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
       |  FROM qsub JOIN rcb ON rcb.s = qsub.s),
       |sc AS (SELECT p.query_id, a.vec_id, CAST(p.cdot + sum(l.qdot) AS BIGINT) AS score
       |  FROM probes p
       |  JOIN assigned a ON a.cent_id = p.cent_id
       |  JOIN codes c ON c.vec_id = a.vec_id
       |  JOIN lut l ON l.query_id = p.query_id AND l.s = c.s AND l.code_id = c.code_id
       |  WHERE a.vec_id <> p.query_id
       |  GROUP BY p.query_id, a.vec_id, p.cdot)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** One per-subspace Lloyd round of the ann_pq_trained port. */
  private def pqtRoundSpark(i: Int): String = {
    val prev = s"pc${i - 1}"
    s"""pa${i}p AS (SELECT subt.vec_id, subt.s, subt.sv, c.code_id,
       |    CAST(aggregate(zip_with(c.cw, subt.sv, (cc, sx) -> cc * cc - 2 * sx * cc),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
       |  FROM subt JOIN $prev c ON c.s = subt.s),
       |pa$i AS (SELECT vec_id, s, sv, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM pa${i}p) t WHERE rn = 1),
       |ps$i AS (SELECT s, code_id, dim, sum(x) AS sx, count(*) AS c
       |  FROM pa$i LATERAL VIEW posexplode(sv) t AS dim, x
       |  GROUP BY s, code_id, dim),
       |pc$i AS (SELECT s, code_id,
       |    transform(array_sort(collect_list(named_struct('dim', dim, 'mean', sx DIV c))), z -> z.mean) AS cw
       |  FROM ps$i GROUP BY s, code_id)""".stripMargin
  }

  /** Spark-dialect image of IvfPq.annPqTrainedSql. */
  private val annPqTrainedSpark: String = {
    val off = operators.IvfPq.PQT_OFF
    val rounds = (1 to operators.IvfPq.PQT_ITERS).map(pqtRoundSpark).mkString(",\n")
    val last = s"pc${operators.IvfPq.PQT_ITERS}"
    s"""WITH e AS (SELECT vec_id,
       |    transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -256D), 256D) * 1e6) AS BIGINT)) AS cv
       |  FROM embeddings),
       |pmm AS (SELECT greatest(CAST(1 AS BIGINT), count(*) DIV least(CAST(256 AS BIGINT), greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |sub AS (SELECT vec_id, s,
       |    transform(slice(cv, s * 8 + 1, 8), x -> x + CAST($off AS BIGINT)) AS sv
       |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s),
       |tm AS (SELECT greatest(CAST(1 AS BIGINT), (count(*) + ${operators.Similarity.TRAIN_CAP - 1}) DIV ${operators.Similarity.TRAIN_CAP}) AS t FROM e),
       |subt AS (SELECT sub.* FROM sub CROSS JOIN tm
       |  WHERE CAST(conv(substr(md5(concat('t:', CAST(vec_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % t = 0),
       |pc0 AS (SELECT sub.s, sub.vec_id AS code_id, sub.sv AS cw
       |  FROM sub CROSS JOIN pmm
       |  WHERE CAST(conv(substr(md5(CAST(sub.vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
       |$rounds,
       |encp AS (SELECT sub.vec_id, sub.s, c.code_id,
       |    CAST(aggregate(zip_with(c.cw, sub.sv, (cc, sx) -> cc * cc - 2 * sx * cc),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
       |  FROM sub JOIN $last c ON c.s = sub.s),
       |codes AS (SELECT vec_id, s, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM encp) t WHERE rn = 1),
       |cbr AS (SELECT s, code_id, transform(cw, x -> x - CAST($off AS BIGINT)) AS cw FROM $last),
       |qs AS (SELECT vec_id AS query_id, s, slice(cv, s * 8 + 1, 8) AS qv
       |  FROM e LATERAL VIEW explode(sequence(0, 7)) t AS s WHERE vec_id < 5),
       |lut AS (SELECT q.query_id, c.s, c.code_id,
       |    CAST(aggregate(zip_with(q.qv, c.cw, (x, y) -> x * y),
       |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
       |  FROM qs q JOIN cbr c ON c.s = q.s),
       |sc AS (SELECT l.query_id, c.vec_id, CAST(sum(l.qdot) AS BIGINT) AS score
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.code_id = c.code_id
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc) t WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  private val mainPorts: Map[String, String] = basePorts ++ Map(
    "corpus_diff" ->
      """WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        |old AS (SELECT doc_id, md5(text) AS old_hash,
        |    CAST(length(text) AS BIGINT) AS old_len
        |  FROM d0 WHERE doc_id % 7 <> 3),
        |neu AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS new_hash,
        |    CAST(length(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS BIGINT) AS new_len
        |  FROM d0 WHERE doc_id % 13 <> 5)
        |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash <> new_hash THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COALESCE(old_len, CAST(-1 AS BIGINT)) AS old_len,
        |  COALESCE(new_len, CAST(-1 AS BIGINT)) AS new_len
        |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
        |ORDER BY doc_id""".stripMargin,

    "ann_pq_exact" -> annPqExactSpark,

    "quality_perceptron_train" -> {
      val (w0, w1, w2, w3, w4) = operators.TrainOps5.QC_W
      val sw = operators.TrainOps5.QC_STOPWORDS.map(w => s"'$w'").mkString(", ")
      def ep(i: Int): String = {
        val prev = s"wv${i - 1}"
        s"""m$i AS (SELECT f.*, y * (w.w0 * CAST(x0 AS DECIMAL(38,0)) + w.w1 * CAST(x1 AS DECIMAL(38,0))
           |      + w.w2 * CAST(x2 AS DECIMAL(38,0)) + w.w3 * CAST(x3 AS DECIMAL(38,0))
           |      + w.w4 * CAST(x4 AS DECIMAL(38,0))) AS marg
           |  FROM f CROSS JOIN $prev w),
           |u$i AS (SELECT
           |    greatest(1, CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT)) AS ne,
           |    CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_err,
           |    CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN y * x0 ELSE 0 END), 0) AS BIGINT) AS u0,
           |    CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN y * x1 ELSE 0 END), 0) AS BIGINT) AS u1,
           |    CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN y * x2 ELSE 0 END), 0) AS BIGINT) AS u2,
           |    CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN y * x3 ELSE 0 END), 0) AS BIGINT) AS u3,
           |    CAST(COALESCE(sum(CASE WHEN marg <= 0 THEN y * x4 ELSE 0 END), 0) AS BIGINT) AS u4
           |  FROM m$i),
           |wv$i AS (SELECT w.w0 + u.u0 DIV u.ne AS w0, w.w1 + u.u1 DIV u.ne AS w1,
           |    w.w2 + u.u2 DIV u.ne AS w2, w.w3 + u.u3 DIV u.ne AS w3,
           |    w.w4 + u.u4 DIV u.ne AS w4 FROM $prev w CROSS JOIN u$i u),
           |r$i AS (SELECT CAST($i AS BIGINT) AS epoch, u.n_err AS n_errors,
           |    w.w0, w.w1, w.w2, w.w3, w.w4
           |  FROM u$i u CROSS JOIN wv$i w)""".stripMargin
      }
      val cut = operators.Retrain.PCT_CUT
      val epochs = (1 to operators.Retrain.PCT_EPOCHS).map(ep).mkString(",\n")
      val union = (1 to operators.Retrain.PCT_EPOCHS)
        .map(i => s"SELECT * FROM r$i").mkString(" UNION ALL ")
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |feat AS (SELECT doc_id,
         |    CAST(size(toks) AS BIGINT) AS n_tokens,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS DOUBLE) / size(toks) END AS mean_len,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(size(filter(toks, x -> x IN ($sw))) AS DOUBLE) / size(toks) END AS stop_ratio,
         |    CASE WHEN size(toks) = 0 THEN 0.0
         |         ELSE CAST(size(array_distinct(toks)) AS DOUBLE) / size(toks) END AS distinct_ratio
         |  FROM base),
         |zz AS (SELECT doc_id, n_tokens,
         |    CAST(floor(mean_len * 1e6 + 0.5) AS BIGINT) AS r2,
         |    CAST(floor(stop_ratio * 1e6 + 0.5) AS BIGINT) AS r3,
         |    CAST(floor(distinct_ratio * 1e6 + 0.5) AS BIGINT) AS r4,
         |    ((($w0 + ($w1 * n_tokens)) + ($w2 * mean_len)) + (($w3 * stop_ratio) + ($w4 * distinct_ratio))) AS zv
         |  FROM feat),
         |raw AS (SELECT doc_id, n_tokens AS r1, r2, r3, r4,
         |    CASE WHEN CAST(floor((1.0 / (1.0 + exp(-zv))) * 1e6 + 0.5) AS BIGINT) >= $cut
         |         THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y
         |  FROM zz),
         |mu AS (SELECT sum(r1) DIV greatest(1, count(*)) AS m1, sum(r2) DIV greatest(1, count(*)) AS m2,
         |    sum(r3) DIV greatest(1, count(*)) AS m3, sum(r4) DIV greatest(1, count(*)) AS m4 FROM raw),
         |f AS (SELECT doc_id, CAST(1 AS BIGINT) AS x0, r1 - m1 AS x1, r2 - m2 AS x2,
         |    r3 - m3 AS x3, r4 - m4 AS x4, y FROM raw CROSS JOIN mu),
         |wv0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2,
         |  CAST(0 AS BIGINT) AS w3, CAST(0 AS BIGINT) AS w4),
         |$epochs
         |SELECT * FROM ($union) u ORDER BY epoch""".stripMargin
    },


    "ivf_skew_report" ->
      s"""WITH $ivfxAssignSparkCtes,
         |counts AS (SELECT c.cent_id, CAST(count(a.vec_id) AS BIGINT) AS n_vecs
         |  FROM cents c LEFT JOIN assigned a ON a.cent_id = c.cent_id
         |  GROUP BY c.cent_id),
         |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total, max(n_vecs) AS mx,
         |  CAST(count(*) AS BIGINT) AS k FROM counts)
         |SELECT cent_id, n_vecs,
         |  n_vecs * 1000000 DIV total AS share_ppm,
         |  (mx * k > 8 * total) AS rebuild
         |FROM counts CROSS JOIN t ORDER BY cent_id""".stripMargin,

    "kmeans_train" -> {
      val rounds = (1 to operators.Retrain.KM_ITERS).map(kmRoundSpark).mkString(",\n")
      val union = (1 to operators.Retrain.KM_ITERS)
        .map(i => s"SELECT * FROM r$i").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id,
         |    transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -1D), 1D) * 1e6) AS BIGINT)
         |      + CAST(1000000 AS BIGINT)) AS kv
         |  FROM embeddings),
         |va AS (SELECT vec_id, kv,
         |    CAST(aggregate(zip_with(kv, kv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS vv
         |  FROM e),
         |tm AS (SELECT greatest(CAST(1 AS BIGINT), (count(*) + ${operators.Similarity.TRAIN_CAP - 1}) div ${operators.Similarity.TRAIN_CAP}) AS t FROM va),
         |v AS (SELECT va.* FROM va CROSS JOIN tm
         |  WHERE CAST(conv(substr(md5(concat('t:', CAST(vec_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % t = 0),
         |mm AS (SELECT greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*))) AS BIGINT)) AS m FROM v),
         |c0 AS (SELECT vec_id AS cent_id, kv AS cvec FROM v CROSS JOIN mm
         |  WHERE CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
         |$rounds
         |SELECT iter, cent_id, n_vecs, CAST(inertia_dec AS DOUBLE) AS inertia
         |FROM ($union) u ORDER BY iter, cent_id""".stripMargin
    },
    "eval_retrieval" ->
      s"""WITH truth AS (SELECT query_id, vec_id FROM (
         |${basePorts("ann_quantized")}) tq),
         |cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
         |${basePorts("ann_lsh_exact")}) tc),
         |hits AS (SELECT c.query_id, c.cand_rank
         |  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id),
         |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
         |ha AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit, min(cand_rank) AS first_rel
         |  FROM hits GROUP BY query_id)
         |SELECT nt.query_id, n_truth,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) * 1000000 DIV n_truth AS recall_ppm,
         |  CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
         |       ELSE 1000000 DIV first_rel END AS rr_micros
         |FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id""".stripMargin,

    "eval_retrieval_pq" ->
      s"""WITH truth AS (SELECT query_id, vec_id FROM (
         |${basePorts("ann_quantized")}) tq),
         |cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
         |$annPqExactSpark) tc),
         |hits AS (SELECT c.query_id, c.cand_rank
         |  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id),
         |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
         |ha AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit, min(cand_rank) AS first_rel
         |  FROM hits GROUP BY query_id)
         |SELECT nt.query_id, n_truth,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) * 1000000 DIV n_truth AS recall_ppm,
         |  CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
         |       ELSE 1000000 DIV first_rel END AS rr_micros
         |FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id""".stripMargin,

    "eval_retrieval_ivf" ->
      s"""WITH $ivfxAssignSparkCtes,
         |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < 5),
         |pd AS (SELECT q.query_id, q.qv, c.cent_id,
         |    CAST(aggregate(zip_with(q.qv, c.cvec, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cdot
         |  FROM q CROSS JOIN cents c),
         |probes AS (SELECT query_id, qv, cent_id FROM (
         |    SELECT query_id, qv, cent_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
         |    FROM pd) t WHERE rn <= 8),
         |sc AS (SELECT p.query_id, a.vec_id,
         |    CAST(aggregate(zip_with(p.qv, a.cv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS qdot
         |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
         |  WHERE a.vec_id <> p.query_id),
         |cand AS (SELECT query_id, vec_id, rnk AS cand_rank FROM (
         |    SELECT query_id, vec_id,
         |      CAST(row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
         |    FROM sc) t WHERE rnk <= 10),
         |truth AS (SELECT query_id, vec_id FROM (
         |${basePorts("ann_quantized")}) tq),
         |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
         |ha AS (SELECT c.query_id, CAST(count(*) AS BIGINT) AS n_hit, min(c.cand_rank) AS first_rel
         |  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id
         |  GROUP BY c.query_id)
         |SELECT nt.query_id, n_truth,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) * 1000000 DIV n_truth AS recall_ppm,
         |  CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
         |       ELSE 1000000 DIV first_rel END AS rr_micros
         |FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id""".stripMargin,

    "dedup_paragraph_apply" -> {
      val w = operators.TrainOps5.PARA_W
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sized AS (SELECT doc_id, toks, size(toks) AS n FROM base),
         |chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
         |    array_join(slice(toks, i * $w + 1, $w), ' ') AS chunk,
         |    CAST(size(slice(toks, i * $w + 1, $w)) AS BIGINT) AS ntok
         |  FROM (SELECT doc_id, toks, n FROM sized WHERE n > 0) s
         |  LATERAL VIEW explode(sequence(0, CAST(ceil(n / $w.0) AS INT) - 1)) u AS i),
         |keepers AS (SELECT md5(chunk) AS ckey, min(struct(doc_id, idx)) AS kk
         |  FROM chunks GROUP BY md5(chunk)),
         |kept AS (SELECT c.doc_id, c.idx, c.chunk, c.ntok
         |  FROM chunks c JOIN keepers k ON md5(c.chunk) = k.ckey
         |  WHERE c.doc_id = k.kk.doc_id AND c.idx = k.kk.idx),
         |rebuilt AS (SELECT doc_id,
         |    array_join(transform(array_sort(collect_list(struct(idx, chunk))), x -> x.chunk), ' ') AS text_clean,
         |    CAST(count(*) AS BIGINT) AS n_chunks_kept,
         |    CAST(sum(ntok) AS BIGINT) AS n_tokens_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(text_clean, '') AS text_clean,
         |  COALESCE(n_chunks_kept, CAST(0 AS BIGINT)) AS n_chunks_kept,
         |  COALESCE(n_tokens_kept, CAST(0 AS BIGINT)) AS n_tokens_kept
         |FROM (SELECT doc_id FROM base) d LEFT JOIN rebuilt USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "ann_ivfpq_exact" -> annIvfpqSpark,

    "ann_ivfpq_residual" -> annIvfpqResidualSpark,

    "ann_pq_trained" -> annPqTrainedSpark,

    "eval_retrieval_ivfpq" ->
      s"""WITH truth AS (SELECT query_id, vec_id FROM (
         |${basePorts("ann_quantized")}) tq),
         |cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
         |$annIvfpqSpark) tc),
         |hits AS (SELECT c.query_id, c.cand_rank
         |  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id),
         |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
         |ha AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit, min(cand_rank) AS first_rel
         |  FROM hits GROUP BY query_id)
         |SELECT nt.query_id, n_truth,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
         |  COALESCE(n_hit, CAST(0 AS BIGINT)) * 1000000 DIV n_truth AS recall_ppm,
         |  CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
         |       ELSE 1000000 DIV first_rel END AS rr_micros
         |FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id""".stripMargin,

    "dedup_span_apply" -> {
      val w = operators.TrainOps3.SPAN_W
      s"""WITH base AS (SELECT doc_id,
         |    filter(split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sized AS (SELECT doc_id, toks, size(toks) AS n FROM base),
         |sh AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
         |    md5(array_join(slice(toks, i + 1, $w), ' ')) AS gkey
         |  FROM (SELECT doc_id, toks, n FROM sized WHERE n >= $w) s
         |  LATERAL VIEW explode(sequence(0, n - $w)) u AS i),
         |occ AS (SELECT doc_id, start,
         |    row_number() OVER (PARTITION BY gkey ORDER BY doc_id, start) AS rn,
         |    count(*) OVER (PARTITION BY gkey) AS c
         |  FROM sh),
         |cov AS (SELECT DISTINCT doc_id, start + j AS pos
         |  FROM (SELECT doc_id, start FROM occ WHERE c >= 2 AND rn > 1) d
         |  LATERAL VIEW explode(sequence(0, ${w - 1})) r AS j),
         |tokp AS (SELECT doc_id, CAST(p AS BIGINT) AS pos, tok
         |  FROM sized LATERAL VIEW posexplode(toks) t AS p, tok),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tokp t
         |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
         |  WHERE c.pos IS NULL),
         |reb AS (SELECT doc_id,
         |    array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ') AS text_clean,
         |    CAST(count(*) AS BIGINT) AS n_kept
         |  FROM kept GROUP BY doc_id),
         |sp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_cut FROM (
         |    SELECT doc_id, pos, lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |    FROM cov) t
         |  WHERE prev IS NULL OR prev < pos - 1 GROUP BY doc_id)
         |SELECT s.doc_id,
         |  COALESCE(text_clean, '') AS text_clean,
         |  CAST(n AS BIGINT) AS n_tokens,
         |  CAST(n AS BIGINT) - COALESCE(n_kept, CAST(0 AS BIGINT)) AS n_removed,
         |  COALESCE(n_spans_cut, CAST(0 AS BIGINT)) AS n_spans_cut,
         |  CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
         |       ELSE (CAST(n AS BIGINT) - COALESCE(n_kept, CAST(0 AS BIGINT))) * 1000000 DIV n END AS removed_ppm
         |FROM sized s LEFT JOIN reb ON s.doc_id = reb.doc_id
         |LEFT JOIN sp ON s.doc_id = sp.doc_id
         |ORDER BY s.doc_id""".stripMargin
    },

    "src_table_versioned" ->
      """WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
        |chg AS (
        |  SELECT doc_id, text || ' [v2]' AS text, 'U' AS op FROM d0 WHERE doc_id % 10 = 0
        |  UNION ALL SELECT doc_id, text, 'D' FROM d0 WHERE doc_id % 10 = 7
        |  UNION ALL SELECT doc_id + 1000000, 'ins ' || CAST(doc_id AS STRING), 'U'
        |    FROM d0 WHERE doc_id % 25 = 0),
        |ev AS (SELECT doc_id, text, 'B' AS op, 0 AS seq FROM d0
        |  UNION ALL SELECT doc_id, text, op, 1 FROM chg),
        |v1 AS (SELECT doc_id, text FROM (
        |    SELECT doc_id, text, op,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
        |    FROM ev) t WHERE rn = 1 AND op <> 'D'),
        |old AS (SELECT doc_id, md5(text) AS old_hash,
        |    CAST(length(text) AS BIGINT) AS old_len FROM d0),
        |neu AS (SELECT doc_id, md5(text) AS new_hash,
        |    CAST(length(text) AS BIGINT) AS new_len FROM v1)
        |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash <> new_hash THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COALESCE(old_len, CAST(-1 AS BIGINT)) AS old_len,
        |  COALESCE(new_len, CAST(-1 AS BIGINT)) AS new_len
        |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
        |ORDER BY doc_id""".stripMargin,

    // src_table_optimize: Spark-dialect image of
    // VersionedTable.srcTableOptimizeSql — v1 re-derived, Morton
    // z-tile locality via shiftleft/shiftright, protocol-ledger
    // constants; FILTER clauses become conditional aggregates.
    "src_table_optimize" -> {
      val zExpr = (0 until 16).map(j =>
        s"shiftleft(shiftright(zx, $j) & 1, ${2 * j}) + shiftleft(shiftright(zy, $j) & 1, ${2 * j + 1})")
        .mkString(" + ")
      s"""WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
         |chg AS (
         |  SELECT doc_id, text || ' [v2]' AS text, 'U' AS op FROM d0 WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id, text, 'D' FROM d0 WHERE doc_id % 10 = 7
         |  UNION ALL SELECT doc_id + 1000000, 'ins ' || CAST(doc_id AS STRING), 'U'
         |    FROM d0 WHERE doc_id % 25 = 0),
         |ev AS (SELECT doc_id, text, 'B' AS op, 0 AS seq FROM d0
         |  UNION ALL SELECT doc_id, text, op, 1 FROM chg),
         |v1 AS (SELECT doc_id, text FROM (
         |    SELECT doc_id, text, op,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
         |    FROM ev) t WHERE rn = 1 AND op <> 'D'),
         |z AS (SELECT doc_id, text, ($zExpr) DIV ${131072L} AS tile
         |  FROM (SELECT doc_id, text, CAST(doc_id % 65536 AS BIGINT) AS zx,
         |          CAST(length(text) % 65536 AS BIGINT) AS zy FROM v1) t),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         |    CAST(COUNT(DISTINCT tile) AS BIGINT) AS t_all,
         |    CAST(COUNT(CASE WHEN doc_id < 256 THEN 1 END) AS BIGINT) AS n_doc,
         |    CAST(COUNT(DISTINCT CASE WHEN doc_id < 256 THEN tile END) AS BIGINT) AS t_doc,
         |    CAST(COUNT(CASE WHEN length(text) BETWEEN 200 AND 600 THEN 1 END) AS BIGINT) AS n_len,
         |    CAST(COUNT(DISTINCT CASE WHEN length(text) BETWEEN 200 AND 600 THEN tile END) AS BIGINT) AS t_len
         |  FROM z)
         |SELECT * FROM (
         |  SELECT 'all_rows' AS metric, n_all AS n_rows, t_all AS detail FROM agg
         |  UNION ALL SELECT 'doc_lt_256', n_doc, t_doc FROM agg
         |  UNION ALL SELECT 'len_200_600', n_len, t_len FROM agg
         |  UNION ALL SELECT 'live_versions', CAST(2 AS BIGINT), CAST(2 AS BIGINT)) u
         |ORDER BY metric""".stripMargin
    },

    "pipe_index_maintain" -> {
      val np = operators.Retrain.PIM_NPROBE
      s"""WITH v0 AS (SELECT vec_id,
         |    CASE WHEN vec_id % 5 <> 0
         |      THEN transform(sequence(1, 64), i -> CASE WHEN i = 1 THEN CAST(2000000 AS BIGINT) ELSE CAST(1000000 AS BIGINT) END)
         |      ELSE transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -1D), 1D) * 1e6) AS BIGINT) + CAST(1000000 AS BIGINT)) END AS kv
         |  FROM embeddings),
         |v AS (SELECT vec_id, kv,
         |    CAST(aggregate(zip_with(kv, kv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS vv FROM v0),
         |mmv AS (SELECT greatest(CAST(1 AS BIGINT), CAST(floor(sqrt(count(*)) / 2) AS BIGINT)) AS m FROM v),
         |c0 AS (SELECT vec_id AS cent_id, kv AS cvec FROM v CROSS JOIN mmv
         |  WHERE CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % m = 0),
         |kb AS (SELECT CAST(count(*) AS BIGINT) AS k FROM c0),
         |a1p AS (SELECT v.vec_id, v.kv, v.vv, c.cent_id,
         |    CAST(aggregate(zip_with(c.cvec, v.kv, (cc, kx) -> cc * cc - 2 * kx * cc),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
         |  FROM v CROSS JOIN c0 c),
         |a1 AS (SELECT vec_id, kv, vv, cent_id, cost FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cost, cent_id) AS rn FROM a1p) t WHERE rn = 1),
         |tr AS (SELECT CAST(max(nv) AS BIGINT) AS mx, CAST(sum(nv) AS BIGINT) AS tot
         |  FROM (SELECT cent_id, count(*) AS nv FROM a1 GROUP BY cent_id) t),
         |tmc AS (SELECT greatest(CAST(1 AS BIGINT), (count(*) + ${operators.Similarity.TRAIN_CAP - 1}) DIV ${operators.Similarity.TRAIN_CAP}) AS t FROM v),
         |a1t AS (SELECT a1.* FROM a1 CROSS JOIN tmc
         |  WHERE CAST(conv(substr(md5(concat('t:', CAST(vec_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % t = 0),
         |s1 AS (SELECT cent_id, dim, sum(x) AS sx, count(*) AS c
         |  FROM a1t LATERAL VIEW posexplode(kv) t AS dim, x
         |  GROUP BY cent_id, dim),
         |cm1 AS (SELECT cent_id,
         |    transform(array_sort(collect_list(named_struct('dim', dim, 'mean', sx DIV c))), z -> z.mean) AS cvec
         |  FROM s1 GROUP BY cent_id),
         |em1 AS (SELECT cent_id, row_number() OVER (ORDER BY cent_id) AS rn
         |  FROM (SELECT cent_id FROM c0 EXCEPT SELECT cent_id FROM cm1) t),
         |fa1 AS (SELECT kv, row_number() OVER (ORDER BY (vv + cost) DESC, vec_id) AS rn
         |  FROM a1t),
         |c1 AS (SELECT cent_id, cvec FROM cm1
         |  UNION ALL SELECT e.cent_id, f.kv AS cvec
         |  FROM em1 e JOIN fa1 f ON f.rn = e.rn),
         |ka AS (SELECT CAST(count(*) AS BIGINT) AS k FROM c1),
         |nr AS (SELECT CAST(count(*) AS BIGINT) AS r FROM em1),
         |a2p AS (SELECT v.vec_id, v.kv, v.vv, c.cent_id,
         |    CAST(aggregate(zip_with(c.cvec, v.kv, (cc, kx) -> cc * cc - 2 * kx * cc),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS cost
         |  FROM v CROSS JOIN c1 c),
         |a2 AS (SELECT vec_id, kv, vv, cent_id, cost FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cost, cent_id) AS rn FROM a2p) t WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, kv AS qv FROM v
         |  WHERE vec_id % 5 = 0 AND vec_id < 25),
         |tp AS (SELECT q.query_id, v.vec_id,
         |    CAST(v.vv - 2 * aggregate(zip_with(q.qv, v.kv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT) AS dcost
         |  FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id),
         |truth AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY dcost, vec_id) AS rn FROM tp) t WHERE rn <= 10),
         |tc AS (SELECT CAST(count(*) AS BIGINT) AS t FROM truth),
         |pr0 AS (SELECT query_id, qv, cent_id FROM (
         |    SELECT q.query_id, q.qv, c.cent_id, row_number() OVER (
         |      PARTITION BY q.query_id ORDER BY
         |      CAST(aggregate(zip_with(c.cvec, q.qv, (cc, qx) -> cc * cc - 2 * qx * cc),
         |        CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT), c.cent_id) AS rn
         |    FROM q CROSS JOIN c0 c) t WHERE rn <= $np),
         |sc0 AS (SELECT p.query_id, a.vec_id,
         |    CAST(a.vv - 2 * aggregate(zip_with(p.qv, a.kv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p2) -> acc + p2) AS BIGINT) AS dcost
         |  FROM pr0 p JOIN a1 a ON a.cent_id = p.cent_id
         |  WHERE a.vec_id <> p.query_id),
         |sn0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc0),
         |cd0 AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY dcost, vec_id) AS rn FROM sc0) t WHERE rn <= 10),
         |h0 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |  FROM cd0 c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id),
         |pr1 AS (SELECT query_id, qv, cent_id FROM (
         |    SELECT q.query_id, q.qv, c.cent_id, row_number() OVER (
         |      PARTITION BY q.query_id ORDER BY
         |      CAST(aggregate(zip_with(c.cvec, q.qv, (cc, qx) -> cc * cc - 2 * qx * cc),
         |        CAST(0 AS BIGINT), (acc, p) -> acc + p) AS BIGINT), c.cent_id) AS rn
         |    FROM q CROSS JOIN c1 c) t WHERE rn <= $np),
         |sc1 AS (SELECT p.query_id, a.vec_id,
         |    CAST(a.vv - 2 * aggregate(zip_with(p.qv, a.kv, (x, y) -> x * y),
         |      CAST(0 AS BIGINT), (acc, p2) -> acc + p2) AS BIGINT) AS dcost
         |  FROM pr1 p JOIN a2 a ON a.cent_id = p.cent_id
         |  WHERE a.vec_id <> p.query_id),
         |sn1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc1),
         |cd1 AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY dcost, vec_id) AS rn FROM sc1) t WHERE rn <= 10),
         |h1 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |  FROM cd1 c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id)
         |SELECT phase, metric, value FROM (
         |  SELECT 'trigger' AS phase, 'max_share_ppm' AS metric,
         |    mx * 1000000 DIV tot AS value FROM tr
         |  UNION ALL SELECT 'trigger', 'rebuild_fired',
         |    CASE WHEN mx * k > 8 * tot THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END FROM tr CROSS JOIN kb
         |  UNION ALL SELECT 'rebuild', 'k_before', k FROM kb
         |  UNION ALL SELECT 'rebuild', 'k_after', k FROM ka
         |  UNION ALL SELECT 'rebuild', 'n_reseeded', r FROM nr
         |  UNION ALL SELECT 'regrade', 'recall_ppm_old',
         |    h * 1000000 DIV greatest(CAST(1 AS BIGINT), t) FROM h0 CROSS JOIN tc
         |  UNION ALL SELECT 'regrade', 'recall_ppm_new',
         |    h * 1000000 DIV greatest(CAST(1 AS BIGINT), t) FROM h1 CROSS JOIN tc
         |  UNION ALL SELECT 'regrade', 'scanned_old', n FROM sn0
         |  UNION ALL SELECT 'regrade', 'scanned_new', n FROM sn1
         |) u ORDER BY phase, metric""".stripMargin
    })
  /** The served port surface: stream_ivf_compact shares
    * stream_ivf_ingest's text — compaction is gated as
    * serving-invisible, so the SQL image of the served result is
    * identical by construction.
    */
  val sparkSql: Map[String, String] =
    mainPorts + ("stream_ivf_compact" -> mainPorts("stream_ivf_ingest"))

}
