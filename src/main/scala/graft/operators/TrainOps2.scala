package graft.operators

import graft.Tables
import graft.functions.{Expr => GExpr}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2C training-data pipeline operators, batch 3: benchmark
  * decontamination, repetition filtering, sequence packing, embedding
  * outlier detection, and data-mixing weights — all deterministic
  * integer/decimal/IEEE-exact math so every one carries a full DuckDB
  * oracle (no rows-only entries in this file).
  *
  * Scale posture per op is documented inline; the common theme is that
  * corpus-level statistics (eval shingle sets, per-(label,dim) sums,
  * per-source totals) are provably tiny relative to the corpus, so
  * they always travel as broadcasts and the corpus itself is shuffled
  * at most once.
  */
object TrainOps2 {
  type Q = (SparkSession, String) => DataFrame

  /** IEEE-exact snap to 6 decimals (SURVEY §6): multiply/add/floor/
    * divide are individually exactly-rounded, so both engines produce
    * the identical double for identical inputs (positive values).
    */
  private def snap6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6

  // --- decontam_overlap: eval-set contamination scan ------------------
  // Benchmark decontamination: flag training documents sharing any
  // 3-token shingle with a held-out eval set (doc_id % 97 == 0 — a
  // deterministic ~1% sample standing in for the external benchmark).
  // NO static broadcast hint on the eval side: the %97 stand-in makes
  // eval shingles O(corpus/97), which grows linearly with the corpus —
  // a hard-coded broadcast would OOM the driver at 100 TB. AQE decides
  // at runtime from post-shuffle sizes: a genuinely small eval set
  // (real benchmarks are KBs–MBs, fixed) still gets the broadcast
  // join; an unexpectedly large one degrades gracefully to a shuffle
  // hash join on `sh`. Then ONE aggregation shuffle on the
  // (train, eval) pair key whose cardinality is bounded by true
  // contamination, not corpus size. TrainOps2Spec asserts no
  // broadcast hint survives into the optimized plan.
  val EVAL_MOD = 97L

  val decontamOverlap: Q = (s, d) => {
    // NO wide(), deliberately: measured 0.58 s unwidened vs 0.84-1.18 s
    // widened at sf0.1 — the exchange disturbs the join's broadcast
    // sizing for the tiny eval side and costs more than the shingle
    // explode it would spread
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), explode(GExpr.trigramShingles(col("text"))).as("sh"))
    val eval = sh.filter(col("doc_id") % EVAL_MOD === 0)
      .withColumnRenamed("doc_id", "eval_doc_id")
    val train = sh.filter(col("doc_id") % EVAL_MOD =!= 0)
    train.join(eval, "sh")
      .groupBy(col("doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).cast("long").as("n_shared"))
      .orderBy(col("doc_id"), col("eval_doc_id"))
  }

  // Shingle comprehension mirrors Kernels.trigramShingles: split on
  // single space keeping empties, w[i:i+2] 3-token windows, distinct.
  val decontamOverlapSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(CASE WHEN len(string_split(text, ' ')) < 3
      |      THEN [text]
      |      ELSE [array_to_string(string_split(text, ' ')[i:i+2], ' ')
      |            FOR i IN range(1, len(string_split(text, ' ')) - 1)] END)) AS s
      |  FROM documents)
      |SELECT t.doc_id, e.doc_id AS eval_doc_id,
      |       CAST(count(*) AS BIGINT) AS n_shared
      |FROM sh t JOIN sh e ON t.s = e.s
      |WHERE e.doc_id % 97 = 0 AND t.doc_id % 97 <> 0
      |GROUP BY t.doc_id, e.doc_id
      |ORDER BY t.doc_id, eval_doc_id""".stripMargin

  // --- text_repetition: Gopher-style repetition metrics ---------------
  // Per-document bigram repetition statistics used by quality filters:
  // the share of bigram occurrences held by the most frequent bigram,
  // and the share belonging to any repeated bigram. All-integer counts
  // with a final snapped division; per-doc groupBy is the only
  // shuffle and map-side combine does most of the counting.
  val textRepetition: Q = (s, d) => {
    // wide(): the bigram explode + per-doc partial aggregation ran as
    // ONE 491 ms task on the single-split sf0.1 scan (graft.Profile);
    // the text exchange is far cheaper than the kernel it spreads
    val w = Tables.wide(Tables.documents(s, d)
        .select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    // Guard the bigram comprehension on size(w) >= 2: sequence(0, -1)
    // (a 1-token doc) would step BACKWARDS to [0, -1] and element_at(w, 0)
    // throws. The empty-array branch makes explode drop short docs —
    // exactly what the oracle's range(1, len(w)) does.
    val grams = w.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
      explode(expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(0, size(w) - 2), i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2))) ELSE CAST(array() AS ARRAY<STRING>) END")).as("gram"))
    val counts = grams.groupBy(col("doc_id"), col("n_tokens"), col("gram"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("c")).cast("long").as("n_bigrams"),
        count(lit(1)).cast("long").as("n_distinct"),
        max(col("c")).as("top_c"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_c"))
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"), col("n_distinct"),
        snap6(col("top_c").cast("double") / col("n_bigrams").cast("double")).as("top_bigram_frac"),
        snap6(col("dup_c").cast("double") / col("n_bigrams").cast("double")).as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  val textRepetitionSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
      |        unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS gram
      |      FROM w),
      |c AS (SELECT doc_id, n_tokens, gram, count(*) AS c
      |      FROM g GROUP BY doc_id, n_tokens, gram)
      |SELECT doc_id, n_tokens,
      |  CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  CAST(count(*) AS BIGINT) AS n_distinct,
      |  floor(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top_bigram_frac,
      |  floor(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
      |        / CAST(sum(c) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dup_bigram_frac
      |FROM c GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin

  // --- pack_sequences: contiguous token packing for pretraining -------
  // Greedy document packing: within each source stream, documents in
  // doc_id order are concatenated and cut into fixed SEQ_LEN-token
  // training sequences; each doc reports the sequence it starts in and
  // its token offset there.
  //
  // TWO-LEVEL cumulative sum, not one window per source: a
  // Window.partitionBy(source) alone makes every source ONE reducer
  // task — a 40 TB source would serialize through a single executor
  // thread. Instead (1) docs cumulate within (source, bucket) where
  // bucket = doc_id / PACK_BUCKET — thousands of independent window
  // partitions per source — and (2) per-bucket token totals (one tiny
  // row per bucket) cumulate across buckets in a second window whose
  // input is corpus/PACK_BUCKET rows. cum_before = bucket-offset +
  // within-bucket cum reproduces the single-window result exactly
  // (same oracle). The bucket-totals join key is (source, bucket);
  // AQE broadcasts the totals side when it is small (it always is:
  // 3 longs per PACK_BUCKET docs).
  val SEQ_LEN = 256L
  val PACK_BUCKET = 1024L

  val packSequences: Q = (s, d) => {
    // Null-doc policy: fully-null text packs as '' (one empty token,
    // _clean_cell None->'' semantics) and a null source is a real
    // stream key — the offsets join is null-safe so such docs keep
    // their slot instead of silently dropping. Mirrored in the SQL
    // port and the DuckDB oracle (window partitioning groups nulls).
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
      .withColumn("bkt", floor(col("doc_id") / PACK_BUCKET).cast("long"))
    val wIn = Window.partitionBy(col("source"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = toks.withColumn("in_before",
      coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    val wB = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
      .withColumn("bkt_before", coalesce(sum(col("bkt_tokens")).over(wB), lit(0L)))
      .select(col("source"), col("bkt"), col("bkt_before"))
    within.alias("w").join(offsets.alias("o"),
        col("w.source") <=> col("o.source") && col("w.bkt") === col("o.bkt"))
      .select(col("w.doc_id").as("doc_id"), col("w.source").as("source"),
        col("w.n_tokens").as("n_tokens"), col("w.in_before").as("in_before"),
        col("o.bkt_before").as("bkt_before"))
      .withColumn("cum_before", col("bkt_before") + col("in_before"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor(col("cum_before").cast("double") / SEQ_LEN).cast("long").as("seq_id"),
        (col("cum_before") % SEQ_LEN).as("seq_offset"))
      .orderBy(col("doc_id"))
  }

  val packSequencesSql: String =
    """WITH t AS (SELECT doc_id, source,
      |             CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |        coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |      FROM t)
      |SELECT doc_id, source, n_tokens,
      |  CAST(floor(CAST(cum_before AS DOUBLE) / 256) AS BIGINT) AS seq_id,
      |  CAST(cum_before % 256 AS BIGINT) AS seq_offset
      |FROM c ORDER BY doc_id""".stripMargin

  // --- embed_outliers: centroid-distance outliers, exact math ---------
  // Flag the 5 vectors farthest from their label centroid — the
  // embedding-space quality filter (mislabeled / off-distribution
  // docs). FP-drift-free by construction: components quantize to
  // int64 once (floor(x·1e6), the ann_quantized scheme), the centroid
  // comparison is n·q − Σq (all-integer, order-independent), and the
  // squared distance accumulates in DECIMAL(38,0) — exact, so the
  // per-label ranking is bit-stable in both engines. Shape: explode
  // ×dim → ONE shuffle to (label,dim) stats (labels×dims rows →
  // broadcast back) → ONE shuffle per-vector sum → tiny per-label
  // top-k window.
  val OUTLIER_K = 5

  val embedOutliers: Q = (s, d) => {
    val q = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim"),
        graft.functions.Expr.quant6(col("x")).as("qv"))
    val stats = q.groupBy(col("label"), col("dim"))
      .agg(sum(col("qv")).as("sumq"), count(lit(1)).as("n"))
    val diff = col("qv") * col("n") - col("sumq")
    val d2 = q.join(broadcast(stats), Seq("label", "dim"))
      .withColumn("term", diff.cast(DecimalType(38, 0)) * diff.cast(DecimalType(38, 0)))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("term")).as("d2x"))
    val w = Window.partitionBy(col("label")).orderBy(col("d2x").desc, col("vec_id"))
    d2.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= OUTLIER_K)
      .select(col("label"), col("vec_id"), col("d2x").cast("double").as("d2"), col("rank"))
      .orderBy(col("label"), col("rank"))
  }

  val embedOutliersSql: String =
    """WITH q AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS dim,
      |         CAST(floor(least(greatest(CAST(unnest(embedding) AS DOUBLE), -256), 256) * 1e6) AS BIGINT) AS qv
      |  FROM embeddings),
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
      |FROM r WHERE rank <= 5 ORDER BY label, rank""".stripMargin

  // --- mix_weights: temperature-scaled source mixing table ------------
  // Data-mixing ("domain reweighting"): per-source token counts →
  // sampling weights ∝ share^(1/2) (temperature T=2 upsampling of
  // small sources), normalized over sources. sqrt is IEEE
  // exactly-rounded in both engines; snapped weights are summed as
  // exact DECIMAL(18,6) so the normalizer is order-independent. The
  // whole result is one row per source — every join is a broadcast of
  // a scalar or a 20-row frame.
  val mixWeights: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
    val per = toks.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"), sum(col("t")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("token_share", snap6(col("n_tokens").cast("double") / col("total").cast("double")))
      .withColumn("w_dec",
        snap6(sqrt(col("n_tokens").cast("double") / col("total").cast("double")))
          .cast(DecimalType(18, 6)))
    val z = scored.agg(sum(col("w_dec")).as("z"))
    scored.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("token_share"),
        snap6(col("w_dec").cast("double") / col("z").cast("double")).as("mix_weight"))
      .orderBy(col("source"))
  }

  val mixWeightsSql: String =
    """WITH per AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per),
      |sc AS (
      |  SELECT source, n_docs, n_tokens,
      |    floor(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS token_share,
      |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6
      |         AS DECIMAL(18,6)) AS w_dec
      |  FROM per, tot),
      |z AS (SELECT sum(w_dec) AS z FROM sc)
      |SELECT source, n_docs, n_tokens, token_share,
      |  floor(CAST(w_dec AS DOUBLE) / CAST(z AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mix_weight
      |FROM sc, z ORDER BY source""".stripMargin

  // --- chunk_sliding: overlapping token-window chunking ---------------
  // Context-window chunking (RAG / long-doc training prep): each doc
  // becomes ceil-fitted 64-token windows at stride 32. Pure per-row
  // array math — embarrassingly parallel, no shuffle at all until a
  // consumer aggregates; output order is (doc, chunk) so downstream
  // packing sees chunks contiguously.
  val CHUNK_W = 64
  val CHUNK_S = 32

  val chunkSliding: Q = (s, d) => {
    val w = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("n_chunks",
        greatest(lit(1L),
          (ceil((col("n_tokens") - CHUNK_W).cast("double") / CHUNK_S) + 1).cast("long")))
    w.select(col("doc_id"), col("n_tokens"),
        posexplode(expr(
          s"transform(sequence(0, cast(n_chunks - 1 AS INT)), i -> array_join(slice(w, i * $CHUNK_S + 1, $CHUNK_W), ' '))"))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("n_tokens"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        least(lit(CHUNK_W.toLong), col("n_tokens") - col("chunk_id") * CHUNK_S).as("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val chunkSlidingSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
      |c AS (SELECT doc_id, n_tokens, w,
      |        greatest(1, CAST(ceil((n_tokens - 64) / 32.0) AS BIGINT) + 1) AS n_chunks FROM w)
      |SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_id,
      |  array_to_string(w[i*32+1 : i*32+64], ' ') AS chunk_text,
      |  CAST(least(64, n_tokens - i*32) AS BIGINT) AS n_chunk_tokens
      |FROM c, unnest(range(0, n_chunks)) AS t(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "chunk_sliding" -> chunkSliding,
    "decontam_overlap" -> decontamOverlap,
    "text_repetition" -> textRepetition,
    "pack_sequences" -> packSequences,
    "embed_outliers" -> embedOutliers,
    "mix_weights" -> mixWeights)

  val oracles: Map[String, String] = Map(
    "chunk_sliding" -> chunkSlidingSql,
    "decontam_overlap" -> decontamOverlapSql,
    "text_repetition" -> textRepetitionSql,
    "pack_sequences" -> packSequencesSql,
    "embed_outliers" -> embedOutliersSql,
    "mix_weights" -> mixWeightsSql)
}
