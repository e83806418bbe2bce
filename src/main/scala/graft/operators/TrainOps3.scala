package graft.operators

import graft.Tables
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, batch 3: span-level duplication,
  * unigram-LM rarity scoring, corpus vocabulary statistics,
  * incremental batch dedup, and k-NN graph construction. All five are
  * hash-gated — every score is integer or exact-decimal math, so the
  * DuckDB oracle matches bit-for-bit.
  */
object TrainOps3 {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(c, " ")

  // --- dedup_substring: duplicated n-gram span detection --------------
  // Corpus-wide substring-level duplication (the signal behind
  // span-level dedup of training corpora: a doc can be unique as a
  // whole yet consist mostly of boilerplate spans seen elsewhere).
  // 8-token shingles at every position; a span is "duplicated" when
  // its gram occurs ≥2 times across the corpus. Per doc: span count,
  // duplicated-span count, and a ppm fraction — all integer math.
  // Scale: per-doc span counts never join anything (one aggregation);
  // only the DUPLICATED grams (count ≥ 2 after the gram aggregation —
  // a tiny fraction of the gram space in a healthy corpus) join back
  // against the spans, so the wide join's build side is small and AQE
  // broadcasts it. The join key is the gram string because the oracle
  // must reproduce it; at 100 TB the key would be xxhash64(gram) —
  // same plan, 8-byte keys.
  val dedupSubstring: Q = (s, d) => {
    // wide(): the gram explode + aggregation is per-row kernel work;
    // a single-split local corpus would otherwise run it on one core,
    // and the explicit exchange is REUSED by the three sh consumers
    // (one tokenize pass instead of three corpus scans)
    val w = Tables.wide(Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 8), col("doc_id"))
    val sh = w.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(w) - 8), i -> array_join(slice(w, i + 1, 8), ' '))"))
      .as("gram"))
    val spans = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    val dupGrams = sh.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gram"))
    val dupSpans = sh.join(dupGrams, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_c"))
    spans.join(dupSpans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("dup_c"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_ppm", expr("(n_dup_spans * 1000000) div n_spans"))
      .orderBy(col("doc_id"))
  }

  val dedupSubstringSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents WHERE len(string_split(text, ' ')) >= 8),
      |sh AS (SELECT doc_id,
      |         unnest([array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS gram
      |       FROM w),
      |spans AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY doc_id),
      |dg AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM sh GROUP BY gram)
      |       WHERE c >= 2),
      |ds AS (SELECT doc_id, COUNT(*) AS dup_c FROM sh JOIN dg USING (gram)
      |       GROUP BY doc_id)
      |SELECT spans.doc_id, n_spans,
      |  CAST(COALESCE(dup_c, 0) AS BIGINT) AS n_dup_spans,
      |  CAST((CAST(COALESCE(dup_c, 0) AS BIGINT) * 1000000) // n_spans AS BIGINT) AS dup_ppm
      |FROM spans LEFT JOIN ds ON spans.doc_id = ds.doc_id
      |ORDER BY spans.doc_id""".stripMargin

  // --- dedup_span_apply: maximal-span substring dedup, APPLY face -----
  // dedup_substring REPORTS overlapping duplicated shingles;
  // dedup_paragraph_apply removes fixed 10-token windows. This
  // operator closes the remaining gap vs deduplicate-text-datasets
  // practice: ADJACENT duplicated shingles merge into MAXIMAL spans
  // and those spans are cut — so a 40-token plagiarized passage
  // disappears as one contiguous span instead of surviving wherever
  // the fixed window grid happens to split it.
  //
  // Semantics (all engine-reproducible): 8-token shingles at every
  // position (dedup_substring's geometry, md5 gram keys); a shingle
  // occurrence is REMOVABLE when its gram occurs ≥ 2 times corpus-wide
  // and the occurrence is not the lexicographically-first
  // (min (doc_id, start) keeps its text — the dedup_paragraph keeper
  // discipline, via a map-side-combinable min(struct), never a gram
  // window sort); a token position is cut when ANY removable shingle
  // covers it; consecutive cut positions form the maximal spans the
  // per-doc report counts. Scale: the gram shuffle carries fixed-width
  // md5 keys; only duplicated grams join back (AQE-broadcast-sized in
  // a healthy corpus); removable occurrences merge into maximal
  // [start, start+W-1] intervals ARITHMETICALLY (same-width intervals
  // sorted by start: a new span opens iff start > prev_start + W, so
  // one lag + running sum per doc suffices) BEFORE any per-position
  // explode — only the disjoint merged spans expand to positions, so
  // the exploded row count equals the removed-token count instead of
  // W x occurrences, and no distinct is needed; the per-doc occurrence
  // window and ordered rebuild are bounded by the doc's own length.
  private[graft] val SPAN_W = 8

  val dedupSpanApply: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // wide(): the md5-gram explode (sh, computed for the keeper agg
    // AND the removable join) plus the posexplode rebuild are per-row
    // kernel passes — widened, the explicit exchange is shared by all
    // consumers (one tokenize) and every pass runs at session width
    val base = Tables.wide(Tables.documents(s, d)
      .select(col("doc_id"),
        filter(split(coalesce(col("text"), lit("")), " "),
          x => x =!= lit("")).as("toks"))
      .withColumn("n", size(col("toks"))), col("doc_id"))
    // cached AND pre-partitioned by gkey: the keeper aggregation and
    // the removable join are BOTH keyed by gkey, so one explicit
    // exchange ahead of the cache serves them co-partitioned — without
    // it each consumer shuffled the gram frame separately (two ~10 MB
    // twin exchange-write stages at sf0.1, graft.Profile 173/174);
    // with it the groupBy needs no exchange and the join is
    // zero-exchange co-partitioned (guide §2.4: operations keyed the
    // same way share one exchange)
    val sh = graft.Caches.cached(base.filter(col("n") >= SPAN_W)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, n - $SPAN_W),
           |  i -> struct(CAST(i AS BIGINT) AS start,
           |              md5(array_join(slice(toks, i + 1, $SPAN_W), ' ')) AS gkey))""".stripMargin))
        .as("c"))
      .select(col("doc_id"), col("c.start").as("start"), col("c.gkey").as("gkey"))
      .repartition(col("gkey")))
    val dupKeepers = sh.groupBy(col("gkey"))
      .agg(count(lit(1)).as("c"), min(struct(col("doc_id"), col("start"))).as("k"))
      .filter(col("c") >= 2)
      .select(col("gkey"), col("k.doc_id").as("kd"), col("k.start").as("ks"))
    val removable = sh.join(dupKeepers, "gkey")
      .filter(!(col("doc_id") === col("kd") && col("start") === col("ks")))
      .select(col("doc_id"), col("start"))
    // merge same-width intervals [start, start+W-1] into maximal spans:
    // (doc_id, start) is unique per occurrence, so a per-doc lag over
    // sorted starts finds every span boundary (start > prev + W ⇔ a
    // kept position separates the intervals) and a running boundary sum
    // numbers the spans
    val wOcc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val spans = removable
      .withColumn("newspan",
        when(lag(col("start"), 1).over(wOcc) < col("start") - SPAN_W, 1L)
          .otherwise(lit(0L)))
      .withColumn("span_id", sum(col("newspan")).over(wOcc))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("start")).as("s0"),
        (max(col("start")) + lit(SPAN_W - 1L)).as("s1"))
      .localCheckpoint(true)
    // spans are disjoint by construction → exploded positions are
    // exactly the removed set, no distinct
    val cov = spans.select(col("doc_id"),
      explode(sequence(col("s0"), col("s1"))).as("pos"))
    val tokp = base.select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("pos"), col("tok"))
    val kept = tokp.join(cov, Seq("doc_id", "pos"), "left_anti")
    val reb = kept.groupBy(col("doc_id")).agg(
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), " ").as("text_clean"),
      count(lit(1)).as("n_kept"))
    val sp = spans.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans_cut"))
    base.select(col("doc_id"), col("n"))
      .join(reb, Seq("doc_id"), "left").join(sp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n").cast("long").as("n_tokens"),
        (col("n").cast("long") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("n_spans_cut"), lit(0L)).as("n_spans_cut"))
      .withColumn("removed_ppm", when(col("n_tokens") === 0L, 0L)
        .otherwise(expr("(n_removed * 1000000) div n_tokens")))
      .orderBy(col("doc_id"))
  }

  val dedupSpanApplySql: String =
    s"""WITH base AS (SELECT doc_id,
       |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |sized AS (SELECT doc_id, toks, len(toks) AS n FROM base),
       |sh AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
       |    md5(array_to_string(toks[i + 1 : i + $SPAN_W], ' ')) AS gkey
       |  FROM sized, UNNEST(range(0, greatest(n - ${SPAN_W - 1}, 0))) AS u(i)),
       |keepers AS (
       |  -- grouped min (keeper) instead of a row_number window over
       |  -- every shingle: the window sorts ~150M md5-keyed rows at the
       |  -- 100x corpus and exceeds single-node memory; the hash
       |  -- aggregate streams (grace-spillable) with per-gram state
       |  SELECT gkey, count(*) AS c, min([doc_id, start]) AS k
       |  FROM sh GROUP BY gkey),
       |removable AS (SELECT sh.doc_id, sh.start
       |  FROM sh JOIN keepers USING (gkey)
       |  WHERE c >= 2 AND NOT (sh.doc_id = k[1] AND sh.start = k[2])),
       |sp0 AS (SELECT doc_id, start,
       |    CASE WHEN lag(start) OVER (PARTITION BY doc_id ORDER BY start)
       |           < start - $SPAN_W THEN 1 ELSE 0 END AS ns
       |  FROM removable),
       |spid AS (SELECT doc_id, start,
       |    sum(ns) OVER (PARTITION BY doc_id ORDER BY start
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM sp0),
       |spans AS (SELECT doc_id, sid, min(start) AS s0,
       |    max(start) + ${SPAN_W - 1} AS s1
       |  FROM spid GROUP BY doc_id, sid),
       |cov AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos
       |  FROM spans, UNNEST(range(s0, s1 + 1)) AS r(pos)),
       |tokp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
       |  FROM sized, UNNEST(range(1, n + 1)) AS t(i)),
       |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tokp t
       |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
       |  WHERE c.pos IS NULL),
       |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean,
       |    CAST(count(*) AS BIGINT) AS n_kept
       |  FROM kept GROUP BY doc_id),
       |sp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_cut
       |  FROM spans GROUP BY doc_id)
       |SELECT s.doc_id,
       |  COALESCE(text_clean, '') AS text_clean,
       |  CAST(n AS BIGINT) AS n_tokens,
       |  CAST(n - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
       |  COALESCE(n_spans_cut, 0) AS n_spans_cut,
       |  CAST(CASE WHEN n = 0 THEN 0
       |       ELSE (n - COALESCE(n_kept, 0)) * 1000000 // n END AS BIGINT) AS removed_ppm
       |FROM sized s LEFT JOIN reb ON s.doc_id = reb.doc_id
       |LEFT JOIN sp ON s.doc_id = sp.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // --- text_lm_rarity: unigram-LM surprisal proxy ----------------------
  // The perplexity-style quality signal: rare-token-heavy documents
  // score high. Token rarity = corpus_total/count as a ppm integer
  // ((T·1e6) div c — integer division is bit-identical across
  // engines, unlike log/double math). Per doc: token count, total
  // rarity, mean rarity. Scale: one token-count shuffle; the
  // counts side joins back by token — post-aggregation it is
  // vocabulary-sized, AQE broadcasts it; the scalar total rides a
  // broadcast. No doubles anywhere.
  val textLmRarity: Q = (s, d) => {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val cnt = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("t"))
    tok.join(cnt, "tok").crossJoin(broadcast(tot))
      .select(col("doc_id"), expr("(t * 1000000) div c").as("r"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("r")).as("sum_rarity"))
      .select(col("doc_id"), col("n_tokens"), col("sum_rarity"),
        expr("sum_rarity div n_tokens").as("mean_rarity"))
      .orderBy(col("doc_id"))
  }

  val textLmRaritySql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
      |r AS (SELECT doc_id, (t * 1000000) // c AS r FROM tok JOIN cnt USING (tok), tot)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(r) AS BIGINT) AS sum_rarity,
      |  CAST(CAST(SUM(r) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_rarity
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- corpus_token_hist: vocabulary head + coverage curve ------------
  // Tokenizer/vocab planning view: top-50 tokens by frequency with
  // the cumulative corpus-coverage fraction (ppm integer). The global
  // top-50 is TakeOrdered (per-partition heads → driver merge of 50
  // rows, never a global sort); the running sum's unpartitioned
  // window is over the ALREADY-LIMITED 50 rows — bounded by
  // construction, not by data size.
  val corpusTokenHist: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("t"))
    val top = cnt.orderBy(col("c").desc, col("tok")).limit(50)
    val wOrd = Window.orderBy(col("c").desc, col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(Window.orderBy(col("c").desc, col("tok"))).cast("long"))
      .withColumn("cum", sum(col("c")).over(wOrd))
      .select(col("rank"), col("tok"), col("c"), col("cum"),
        expr("(cum * 1000000) div t").as("cov_ppm"))
      .orderBy(col("rank"))
  }

  val corpusTokenHistSql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
      |top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 50)
      |SELECT CAST(row_number() OVER w AS BIGINT) AS rank, tok, c,
      |  CAST(SUM(c) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |  CAST((CAST(SUM(c) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000)
      |       // t AS BIGINT) AS cov_ppm
      |FROM top, tot
      |WINDOW w AS (ORDER BY c DESC, tok)
      |ORDER BY rank""".stripMargin

  // --- dedup_incremental: new batch vs existing corpus ----------------
  // The incremental-ingest dedup path: a new batch (stand-in: doc_id
  // ≡ 9 mod 10) lands against the already-ingested corpus. Content
  // key = md5 of the sorted DISTINCT token set (bag-of-words
  // signature — catches shuffled near-copies exact-text dedup
  // misses). Each new doc is classified dup_corpus (content already
  // ingested), dup_batch (an earlier doc in the same batch has it),
  // or unique; match_id names the kept canonical doc. Scale: the
  // corpus side reduces to (signature, min id) before the join — one
  // shuffle each side on a shuffle-friendly 32-byte key; the
  // batch-internal check is the same aggregation on the small side.
  val dedupIncremental: Q = (s, d) => {
    val sig = md5(array_join(array_sort(array_distinct(toks(col("text")))), " "))
    val docs = Tables.documents(s, d).select(col("doc_id"), sig.as("h"))
    val batch = docs.filter(col("doc_id") % 10 === 9)
    val corpus = docs.filter(col("doc_id") % 10 =!= 9)
      .groupBy(col("h")).agg(min(col("doc_id")).as("corpus_match"))
    val batchMin = batch.groupBy(col("h")).agg(min(col("doc_id")).as("batch_min"))
    batch.join(corpus, Seq("h"), "left")
      .join(batchMin, "h")
      .select(col("doc_id"),
        when(col("corpus_match").isNotNull, lit("dup_corpus"))
          .when(col("doc_id") > col("batch_min"), lit("dup_batch"))
          .otherwise(lit("unique")).as("status"),
        coalesce(col("corpus_match"),
          when(col("doc_id") > col("batch_min"), col("batch_min"))).as("match_id"))
      .orderBy(col("doc_id"))
  }

  val dedupIncrementalSql: String =
    """WITH sigs AS (
      |  SELECT doc_id,
      |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
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
      |ORDER BY b.doc_id""".stripMargin

  // --- knn_graph: blocked exact k-NN graph with mutual edges ----------
  // Neighbor-graph construction (the backbone of graph clustering and
  // mutual-kNN near-dup mining): within each label block, exact
  // integer-quantized dot-product top-5 neighbors per vector, plus a
  // mutuality flag (edge kept by both endpoints). Scores use the
  // ann_quantized scheme — floor(x·1e6) int64 terms, drift-free, so
  // the FULL graph hash-matches DuckDB. Scale: block-local quadratic
  // with a HARD CAP — a label block past KNN_BLOCK_CAP vectors is
  // deterministically sub-split (md5(vec_id) mod ⌈size/cap⌉ — a hash,
  // so strided id allocations cannot collapse the split — mirrored in
  // the oracle), so per-block work is bounded regardless of corpus
  // size: the standard capped-blocking trade (bounded work, neighbors
  // confined to the sub-block) every production kNN-graph build
  // makes; at 100 TB the block key is an LSH/IVF cell, same plan.
  // Top-5 runs through the bounded-heap TopKPerGroup physical
  // operator, so the shuffle carries ≤5 rows per vector; the mutual
  // check is a self-join of the already-k-bounded edge list.
  val KNN_BLOCK_CAP = 512

  /** Oversized-block sub-split key: md5-derived hash of vec_id, not
    * the raw id — stride- or residue-allocated ids would collapse a
    * raw modulo into one class and defeat the cap (the same
    * degeneracy the jaccard level-2 split guards against). md5 keeps
    * the DuckDB oracle bit-mirrorable.
    */
  private[graft] def idSub(lsz: Column): Column =
    pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10).cast("long"),
      ceil(lsz / KNN_BLOCK_CAP))

  /** The SQL mirror of [[idSub]]. */
  private[graft] val idSubSql: String =
    s"CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % CAST(ceil(lsz / $KNN_BLOCK_CAP.0) AS BIGINT)"

  val knnGraph: Q = (s, d) => {
    def quant(c: Column): Column = graft.functions.Expr.quantVec(c)
    val sizes = Tables.embeddings(s, d).groupBy(col("label"))
      .agg(count(lit(1)).as("lsz"))
    val v = Tables.embeddings(s, d)
      .join(broadcast(sizes), "label")
      .select(col("vec_id"), col("label"), quant(col("embedding")).as("qv"),
        idSub(col("lsz")).as("sub"))
    val pairs = v.as("a").join(v.as("b"),
        col("a.label") === col("b.label") && col("a.sub") === col("b.sub") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        col("a.label").as("label"),
        graft.functions.Expr.longDot(col("a.qv"), col("b.qv")).as("score"))
    val edges = TopK.topKPerGroup(pairs, Seq("src"),
        Seq(("score", true), ("dst", false)), 5)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("score").desc, col("dst"))).cast("long"))
    edges.as("e")
      .join(edges.select(col("src").as("rs"), col("dst").as("rd")).as("r"),
        col("e.src") === col("r.rd") && col("e.dst") === col("r.rs"), "left")
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.label").as("label"),
        col("e.score").as("score"), col("e.rank").as("rank"),
        col("r.rs").isNotNull.as("is_mutual"))
      .orderBy(col("src"), col("rank"))
  }

  val knnGraphSql: String =
    s"""WITH sz AS (SELECT label, COUNT(*) AS lsz FROM embeddings GROUP BY label),
      |v AS (SELECT vec_id, e.label,
      |        [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS qv,
      |        $idSubSql AS sub
      |      FROM embeddings e JOIN sz ON e.label = sz.label),
      |pairs AS (
      |  SELECT a.vec_id AS src, b.vec_id AS dst, a.label AS label,
      |    CAST(list_sum([a.qv[i]*b.qv[i] FOR i IN range(1, len(a.qv)+1)]) AS BIGINT) AS score
      |  FROM v a JOIN v b ON a.label = b.label AND a.sub = b.sub
      |    AND a.vec_id <> b.vec_id),
      |edges AS (
      |  SELECT src, dst, label, score,
      |    CAST(row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS BIGINT) AS rank
      |  FROM pairs QUALIFY rank <= 5)
      |SELECT e.src, e.dst, e.label, e.score, e.rank,
      |  (r.src IS NOT NULL) AS is_mutual
      |FROM edges e LEFT JOIN edges r ON e.src = r.dst AND e.dst = r.src
      |ORDER BY e.src, e.rank""".stripMargin

  // --- pipe_quality_funnel: staged curation funnel report -------------
  // The per-stage accounting every corpus-curation run ships with:
  // four sequential gates (length → language → token repetition →
  // lexical diversity), each reporting docs in, dropped, surviving,
  // and a ppm drop rate — the numbers that tell an operator WHICH
  // stage ate the corpus. One exploded token pass feeds a per-doc
  // aggregate (sum/max/distinct-count in the same shuffle); the four
  // gates are then one single-row aggregate stacked to four rows —
  // no per-stage rescans. All thresholds are integer algebra
  // (maxc·8 ≤ n, nd·5 ≥ 2n) so both engines agree bit-for-bit.
  val pipeQualityFunnel: Q = (s, d) => {
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n"), max(col("c")).as("maxc"), count(lit(1)).as("nd"))
      .select(
        (col("n") >= 20 && col("n") <= 1000).as("f1"),
        (col("lang") === "en").as("f2"),
        (col("maxc") * 8 <= col("n")).as("f3"),
        (col("nd") * 5 >= col("n") * 2).as("f4"))
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    perDoc.agg(
        count(lit(1)).as("s0"),
        cnt(col("f1")).as("s1"),
        cnt(col("f1") && col("f2")).as("s2"),
        cnt(col("f1") && col("f2") && col("f3")).as("s3"),
        cnt(col("f1") && col("f2") && col("f3") && col("f4")).as("s4"))
      .selectExpr(
        """stack(4,
          |  1L, 'length',     s0, s0 - s1, s1,
          |  2L, 'language',   s1, s1 - s2, s2,
          |  3L, 'repetition', s2, s2 - s3, s3,
          |  4L, 'diversity',  s3, s3 - s4, s4
          |) AS (stage, gate, n_in, n_dropped, n_out)""".stripMargin)
      // a fully-draining stage leaves n_in = 0 downstream (ANSI div
      // raises); an empty funnel stage drops nothing by definition
      .withColumn("drop_ppm",
        expr("CASE WHEN n_in = 0 THEN 0L ELSE (n_dropped * 1000000) div n_in END"))
      .orderBy(col("stage"))
  }

  val pipeQualityFunnelSql: String =
    """WITH t AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
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
      |  CAST(CASE WHEN n_in = 0 THEN 0 ELSE (n_dropped * 1000000) // n_in END AS BIGINT) AS drop_ppm
      |FROM st ORDER BY stage""".stripMargin

  // --- eval_split: deterministic train/val/test assignment ------------
  // Reproducible 90/5/5 split with per-split accounting. Assignment
  // hashes the doc id (salted), never RNG state — the same doc lands
  // in the same split on any engine, cluster size, or rerun, which is
  // what makes held-out sets trustworthy across pipeline versions.
  // Thresholds are exact hex bounds (0.05·2³² = 0x0CCCCCCC); the
  // comparison is plain lexicographic on the md5 prefix, as in
  // sample_stratified. One aggregation; the total rides a broadcast.
  val evalSplit: Q = (s, d) => {
    val h = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8)
    val tagged = Tables.documents(s, d).select(
      when(h < "0ccccccc", "test").when(h < "19999999", "val")
        .otherwise("train").as("split"),
      size(toks(col("text"))).cast("long").as("n_tok"), col("n_chars"))
    val per = tagged.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    val tot = per.agg(sum(col("n_docs")).as("t"))
    per.crossJoin(broadcast(tot))
      .select(col("split"), col("n_docs"), col("n_tokens"), col("n_chars"),
        expr("(n_docs * 1000000) div t").as("share_ppm"))
      .orderBy(col("split"))
  }

  val evalSplitSql: String =
    """WITH tagged AS (
      |  SELECT CASE WHEN md5('split:' || CAST(doc_id AS VARCHAR))[1:8] < '0ccccccc' THEN 'test'
      |              WHEN md5('split:' || CAST(doc_id AS VARCHAR))[1:8] < '19999999' THEN 'val'
      |              ELSE 'train' END AS split,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, n_chars
      |  FROM documents),
      |per AS (SELECT split, COUNT(*) AS n_docs,
      |          CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |          CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |        FROM tagged GROUP BY split),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t FROM per)
      |SELECT split, n_docs, n_tokens, n_chars,
      |  CAST((n_docs * 1000000) // t AS BIGINT) AS share_ppm
      |FROM per, tot ORDER BY split""".stripMargin

  // --- bpe_pair_counts: tokenizer-training pair statistics ------------
  // The first BPE merge iteration's input: corpus-wide counts of
  // adjacent character pairs inside tokens, top-20. (A full BPE train
  // iterates this against a shrinking symbol table; the per-iteration
  // dataflow is exactly this one aggregation, so the shape is the
  // interesting part.) The rank window is bounded post-limit.
  val bpePairCounts: Q = (s, d) => {
    // wide(): the double explode (tokens, then character pairs per
    // token) is pure per-row kernel work — unwidened it ran as ONE
    // 661 ms task on the single-split sf0.1 scan (graft.Profile);
    // no-op once the input has enough splits
    val cnt = Tables.wide(Tables.documents(s, d)
        .select(col("doc_id"), col("text")), col("doc_id"))
      .select(explode(toks(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c"))
    cnt.orderBy(col("c").desc, col("pair")).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("pair"))).cast("long"))
      .select(col("rank"), col("pair"), col("c"))
      .orderBy(col("rank"))
  }

  val bpePairCountsSql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |p AS (SELECT unnest([substr(tok, i, 2) FOR i IN range(1, len(tok))]) AS pair
      |      FROM tok WHERE len(tok) >= 2),
      |cnt AS (SELECT pair, COUNT(*) AS c FROM p GROUP BY pair),
      |top AS (SELECT pair, c FROM cnt ORDER BY c DESC, pair LIMIT 20)
      |SELECT CAST(row_number() OVER (ORDER BY c DESC, pair) AS BIGINT) AS rank, pair, c
      |FROM top ORDER BY rank""".stripMargin

  // --- dedup_semantic_keep: near-dup resolution with canonical pick ---
  // The step AFTER near-dup detection: for every document whose
  // embedding has an in-block neighbor above the similarity threshold,
  // decide WHICH copy survives. A doc is dropped when a neighbor
  // dominates it (longer text, ties to the lower id); the output maps
  // each dropped doc to its dominating keeper. Embedding similarity is
  // the exact int64-quantized dot product (normalized vectors →
  // qdot ≈ cosine·1e12), blocks are the capped (label, sub) scheme
  // knn_graph uses, and the keeper pick is a deterministic window —
  // so the whole resolution is hash-gated. Only docs that HAVE an
  // embedding participate (inner join on vec_id = doc_id): the
  // realistic shape, since embedding coverage lags ingestion.
  val SEMANTIC_THRESH = 300000000000L // qdot ≥ 0.30·1e12

  val dedupSemanticKeep: Q = (s, d) => {
    def quant(c: Column): Column = graft.functions.Expr.quantVec(c)
    val sizes = Tables.embeddings(s, d).groupBy(col("label"))
      .agg(count(lit(1)).as("lsz"))
    val v = Tables.embeddings(s, d)
      .join(broadcast(sizes), "label")
      .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("label"), quant(col("embedding")).as("qv"),
        col("n_chars"), idSub(col("lsz")).as("sub"))
    val dominated = v.as("a").join(v.as("b"),
        col("a.label") === col("b.label") && col("a.sub") === col("b.sub") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          (col("b.n_chars") > col("a.n_chars") ||
            (col("b.n_chars") === col("a.n_chars") && col("b.vec_id") < col("a.vec_id"))))
      .select(col("a.vec_id").as("doc_id"), col("b.vec_id").as("keep_id"),
        col("b.n_chars").as("keep_chars"),
        graft.functions.Expr.longDot(col("a.qv"), col("b.qv")).as("score"))
      .filter(col("score") >= SEMANTIC_THRESH)
    val pick = Window.partitionBy(col("doc_id"))
      .orderBy(col("keep_chars").desc, col("keep_id"))
    dominated.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
      .select(col("doc_id"), col("keep_id"), col("score"))
      .orderBy(col("doc_id"))
  }

  val dedupSemanticKeepSql: String =
    s"""WITH sz AS (SELECT label, COUNT(*) AS lsz FROM embeddings GROUP BY label),
      |v AS (SELECT vec_id, e.label,
      |        [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS qv,
      |        n_chars, $idSubSql AS sub
      |      FROM embeddings e JOIN sz ON e.label = sz.label
      |        JOIN documents d ON e.vec_id = d.doc_id),
      |dom AS (
      |  SELECT a.vec_id AS doc_id, b.vec_id AS keep_id, b.n_chars AS keep_chars,
      |    CAST(list_sum([a.qv[i]*b.qv[i] FOR i IN range(1, len(a.qv)+1)]) AS BIGINT) AS score
      |  FROM v a JOIN v b ON a.label = b.label AND a.sub = b.sub
      |    AND a.vec_id <> b.vec_id
      |    AND (b.n_chars > a.n_chars
      |         OR (b.n_chars = a.n_chars AND b.vec_id < a.vec_id)))
      |SELECT doc_id, keep_id, score FROM dom
      |WHERE score >= $SEMANTIC_THRESH
      |QUALIFY row_number() OVER (PARTITION BY doc_id
      |  ORDER BY keep_chars DESC, keep_id) = 1
      |ORDER BY doc_id""".stripMargin

  // --- embed_dim_stats: per-dimension embedding QA ---------------------
  // The statistics an embedding pipeline watches per dimension: count,
  // exact sum / sum-of-squares (for mean/variance downstream), min and
  // max — all over floor(x·1e6) int64 quantization, so 64 rows of
  // drift-free numbers that flag dead dimensions, scale drift, or a
  // mis-normalized batch. One posexplode + one aggregation by
  // dimension id (64 groups — trivially parallel at any corpus size).
  // sum_sq AGGREGATES in DECIMAL(38,0): q²≤1e12, so a LongType sum
  // (or a down-cast to long mid-pipeline) silently wraps once a
  // dimension sees ~9.2M vectors — exactly the scale this targets —
  // while the DuckDB oracle sums in HUGEINT. The EMITTED column is
  // double, not decimal: the driver's gate hashes typed values, and
  // Spark's parquet decimal128 vs DuckDB's HUGEINT/DECIMAL
  // materialization hash-differ even when every value is identical
  // (the r5 red row). Both engines round the same exact integer
  // through the same IEEE-754 conversion, so the double hashes match
  // at any corpus size and the aggregation itself never wraps.
  val embedDimStats: Q = (s, d) => {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select((col("dim") + 1).cast("long").as("dim"),
        graft.functions.Expr.quant6(col("x")).as("q"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"),
        sum((col("q") * col("q")).cast(dec)).cast("double").as("sum_sq"),
        min(col("q")).as("min_q"), max(col("q")).as("max_q"))
      .orderBy(col("dim"))
  }

  val embedDimStatsSql: String =
    """WITH x AS (
      |  SELECT CAST(i AS BIGINT) AS dim,
      |    CAST(floor(least(greatest(embedding[i], -256), 256) * 1e6) AS BIGINT) AS q
      |  FROM embeddings, range(1, 65) t(i))
      |SELECT dim, COUNT(*) AS n,
      |  CAST(SUM(q) AS BIGINT) AS sum_q,
      |  CAST(SUM(q * q) AS DOUBLE) AS sum_sq,
      |  min(q) AS min_q, max(q) AS max_q
      |FROM x GROUP BY dim ORDER BY dim""".stripMargin

  // --- bpe_train_merges: the full BPE merge-training loop -------------
  // bpe_pair_counts is ONE iteration's input; this is the actual
  // tokenizer-induction loop (Sennrich et al. 2016, word-level BPE):
  // aggregate the corpus ONCE into (word, freq) — the only
  // corpus-scale shuffle — then iterate K times over the vocab-sized
  // frame: count adjacent symbol pairs weighted by word freq, pick the
  // global argmax (count desc, pair asc — a deterministic tie-break),
  // and rewrite every word's symbol sequence with the pair merged.
  // The driver-side argmax per round is the same pattern as
  // graph_pagerank's convergence loop: each round's reduction is tiny
  // (vocab-sized), and K is a constant, so the loop adds no
  // corpus-scale work after the first aggregation. At 100 TB the
  // vocab frame is Heaps-law bounded (~millions of rows for billions
  // of docs) and fits one executor's partition comfortably; the word
  // count itself is a plain map-side-combined groupBy.
  //
  // Merge semantics: a sequence is a space-joined symbol string; a
  // merge replaces ' a b ' with ' ab ' in TWO left-to-right
  // non-overlapping replace passes over the space-padded sequence
  // (pass 1 consumes the shared boundary space, pass 2 catches the
  // occurrence it thereby skipped: ' a b a b a b ' -> 'ab ab ab').
  // For runs of a self-pair ('l l l l l' -> 'll l ll') this differs
  // from canonical greedy BPE ('ll ll l') but is deterministic and
  // IDENTICAL in Spark and DuckDB (both replace() scan forward
  // without rescanning replaced text), which is what makes the whole
  // training loop oracle-gated — rare self-pair runs only shift which
  // equal-count pair wins a later round.
  private[graft] val BPE_MERGES = 6

  /** Shared trainer for bpe_train_merges / bpe_tokenize: the K-round
    * loop over the vocab frame. Each round's frame is persisted and
    * the previous round's is dropped as soon as its successor is
    * materialized: round k's argmax job then reads round k-1's cache
    * instead of replaying the whole replace chain from the parquet
    * scan (which would make the loop O(K^2) in corpus passes — at
    * 100 TB the ONE corpus-scale word count must run once, not once
    * per merge). Same lineage-truncation discipline as dedup_cluster's
    * pointer-jump loop.
    *
    * Returns the merge table and, when keepFinal, the final vocab
    * frame after all merges — materialized off the last round's cache
    * and registered with the Caches registry (the caller hands it to
    * a lazy consumer, so release happens at phase end, not inline).
    */
  private def bpeLoop(s: SparkSession, d: String, keepFinal: Boolean,
      trainFilter: Option[Column] = None)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    import org.apache.spark.sql.Row
    val base = trainFilter.foldLeft(Tables.documents(s, d))((df, f) => df.filter(f))
    // wide(): the ONE corpus-scale pass of the loop (tokenize + word
    // count) runs at session width instead of one task per split
    val vocab = Tables.wide(base.select(col("doc_id"), col("text")), col("doc_id"))
      .select(explode(toks(col("text"))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // seq: 'h e l l o' (split('') keeps a trailing '' under Spark's
    // limit=-1; filter it before joining). ONE eager materialization
    // (localCheckpoint truncates the corpus lineage); each round's
    // state is then a FOLDED replace expression over this checkpoint
    // — the bpe_apply_batch discipline — instead of a fresh cached
    // frame per round. Before: every round persisted a new frame and
    // re-analyzed the full corpus lineage, and the driver spent
    // ~1 s/query in per-round planning + cache materialization
    // (thread-dump-verified; jobs summed to ~0.5 s of a 1.5-2.0 s
    // plan-construction). After: per round = one 2-stage argmax over
    // a 3-node LogicalRDD plan. Re-applying k cheap string replaces
    // per round over the vocab-sized frame costs far less than the
    // materializations it replaces.
    val seqs0 = vocab.select(col("freq"),
      array_join(filter(split(col("word"), ""), x => x =!= lit("")), " ").as("seq"))
      .localCheckpoint(true)
    var seqExpr: Column = col("seq")
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var k = 0
    var exhausted = false
    while (k < BPE_MERGES && !exhausted) {
      val best: Array[Row] = seqs0
        .select(col("freq"), split(seqExpr, " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val c = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        out += ((k + 1L, pair, merged, c))
        val pat = lit(s" $pair ")
        val rep = lit(s" $merged ")
        seqExpr = trim(replace(replace(
          concat(lit(" "), seqExpr, lit(" ")), pat, rep), pat, rep))
        k += 1
      }
    }
    // the final frame is a lazy replace-fold projection of the
    // checkpoint — consumers pay one cheap vocab-sized pass; the
    // checkpoint blocks are reclaimed by the ContextCleaner once the
    // frame is unreferenced (the bench GCs between queries)
    (out.toSeq, seqs0.select(col("freq"), seqExpr.as("seq")))
  }

  val bpeTrainMerges: Q = (s, d) => {
    val (merges, _) = bpeLoop(s, d, keepFinal = false)
    import s.implicits._
    merges.toDF("rank", "pair", "merged", "c").orderBy(col("rank"))
  }

  // --- bpe_tokenize: serve side of the trained tokenizer --------------
  // Corpus token statistics under the K trained merges. Key identity:
  // tokenizing the CORPUS with a word-level tokenizer is tokenizing
  // the weighted VOCAB — every occurrence of word w yields the same
  // token sequence, so the final training frame (vocab after all K
  // merges, freq-weighted) already IS the tokenized corpus. No second
  // corpus pass: explode the vocab-sized frame and sum freq per token.
  // Output: top-25 (token, count), count desc / token asc — the vocab
  // histogram a tokenizer-induction pipeline reports.
  val bpeTokenize: Q = (s, d) => {
    val (_, fin) = bpeLoop(s, d, keepFinal = true)
    fin.select(col("freq"), explode(split(col("seq"), " ")).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("token")).limit(25)
  }

  // --- bpe_apply_batch: incremental serve + tokenizer QA --------------
  // The deployment reality bpe_tokenize's corpus identity cannot
  // cover: NEW data arrives after training. Train the K merges on the
  // corpus COMPLEMENT (doc_id % 7 <> 3 — the same deterministic
  // held-out convention as dedup_incremental's batch split), then
  // apply them to the held-out batch and report the two tokenizer-QA
  // metrics per source: FERTILITY (tokens per word, ppm — the
  // compression the tokenizer actually achieves on unseen text) and
  // OOV rate (emitted tokens absent from the trained vocabulary).
  // The merge table is driver-held (K rows — the centroid pattern),
  // so application is a literal 12-deep replace fold inside ONE
  // codegen'd projection: no join against the training frame for
  // tokenization, and the only batch-side shuffle is the per-source
  // aggregate. The OOV check joins batch tokens against the
  // Heaps-bounded trained-vocabulary frame. The oracle re-derives the
  // merges with the same unrolled MATERIALIZED-CTE chain restricted
  // to the training slice, then unrolls the application chain over
  // the batch — the full train-on-old/serve-on-new flow under one
  // hash gate.
  val bpeApplyBatch: Q = (s, d) => {
    val (merges, fin) = bpeLoop(s, d, keepFinal = true,
      trainFilter = Some(col("doc_id") % 7 =!= 3))
    val vtoks = fin.select(explode(split(col("seq"), " ")).as("vtok")).distinct()
    // cached: words feeds the tokenized-batch aggregate AND the
    // per-source word count — uncached, the held-out slice was
    // re-tokenized (and the 12-deep replace fold re-planned) twice
    val words = graft.Caches.cached(Tables.documents(s, d)
      .filter(col("doc_id") % 7 === 3)
      .select(col("source"), explode(toks(col("text"))).as("word"))
      .filter(length(col("word")) >= 1))
    val seq0 = array_join(filter(split(col("word"), ""), x => x =!= lit("")), " ")
    val applied = merges.foldLeft(seq0) { case (c, (_, pair, merged, _)) =>
      val (pat, rep) = (lit(s" $pair "), lit(s" $merged "))
      trim(replace(replace(concat(lit(" "), c, lit(" ")), pat, rep), pat, rep))
    }
    val toksOut = words
      .select(col("source"), explode(split(applied, " ")).as("tok"))
      .join(vtoks, col("tok") === col("vtok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("vtok").isNull, 1L).otherwise(0L)).as("n_oov"))
    val wcount = words.groupBy(col("source")).agg(count(lit(1)).as("n_words"))
    wcount.join(toksOut, "source")
      .select(col("source"), col("n_words"), col("n_tokens"),
        expr("n_tokens * 1000000 DIV n_words").as("fertility_ppm"),
        col("n_oov"),
        when(col("n_tokens") === 0L, 0L)
          .otherwise(expr("n_oov * 1000000 DIV n_tokens")).as("oov_ppm"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_substring" -> dedupSubstring,
    "dedup_span_apply" -> dedupSpanApply,
    "text_lm_rarity" -> textLmRarity,
    "corpus_token_hist" -> corpusTokenHist,
    "dedup_incremental" -> dedupIncremental,
    "knn_graph" -> knnGraph,
    "pipe_quality_funnel" -> pipeQualityFunnel,
    "eval_split" -> evalSplit,
    "bpe_pair_counts" -> bpePairCounts,
    "bpe_train_merges" -> bpeTrainMerges,
    "bpe_tokenize" -> bpeTokenize,
    "bpe_apply_batch" -> bpeApplyBatch,
    "dedup_semantic_keep" -> dedupSemanticKeep,
    "embed_dim_stats" -> embedDimStats)

  // Unrolled K-iteration oracle, generated (EtlOps3.scala:76 pattern —
  // generated texts beat hand-maintained ones for loop unrolls). Each
  // iteration k: p_k counts pairs over s_k, b_k is the argmax row,
  // s_{k+1} rewrites sequences via the same two-pass padded replace as
  // the Scala loop. After exhaustion b_k is empty: the chr(1) COALESCE
  // keeps the replace a no-op (no symbol contains control chars), and
  // the final union simply has no row for that k.
  // Every CTE is AS MATERIALIZED: s_k is referenced by both p_k and
  // s_{k+1}, so under DuckDB's default inlining the chain expands
  // exponentially (measured: >120 s at sf0.01 inlined, 4.5 s
  // materialized). The argmax row joins in via LEFT JOIN ON TRUE —
  // one reference per consumer instead of four scalar subqueries —
  // and the unused final s_K is not emitted for the training oracle
  // (DuckDB evaluates materialized CTEs even when unreferenced;
  // skipping it halved the oracle wall) — the tokenize oracle DOES
  // emit it, because the final frame is its subject. After early
  // exhaustion b_k is empty, so s_{k+1} == s_k and the tokenize
  // aggregate still reads the right final state.
  private def bpeChainSql(withFinalSeq: Boolean, trainWhere: String = ""): String = {
    val iters = (0 until BPE_MERGES).map { k =>
      val (pat, rep) = (
        "COALESCE(' ' || bp.pair || ' ', chr(1))",
        "COALESCE(' ' || bp.merged || ' ', chr(1))")
      val head =
        s"""p$k AS MATERIALIZED (SELECT pair, SUM(freq) AS c FROM (
           |  SELECT freq, unnest([s[i] || ' ' || s[i+1] FOR i IN range(1, len(s))]) AS pair
           |  FROM (SELECT freq, string_split(seq, ' ') AS s FROM s$k) t
           |  WHERE len(s) >= 2) GROUP BY pair),
           |b$k AS MATERIALIZED (SELECT pair, replace(pair, ' ', '') AS merged, c
           |        FROM p$k ORDER BY c DESC, pair LIMIT 1)""".stripMargin
      if (k == BPE_MERGES - 1 && !withFinalSeq) head
      else head +
        s""",
           |s${k + 1} AS MATERIALIZED (SELECT freq,
           |  trim(replace(replace(' ' || seq || ' ', $pat, $rep), $pat, $rep)) AS seq
           |  FROM s$k LEFT JOIN b$k bp ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (SELECT word, COUNT(*) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents$trainWhere)
       |  WHERE len(word) >= 1 GROUP BY word),
       |s0 AS MATERIALIZED (SELECT freq, array_to_string(string_split(word, ''), ' ') AS seq FROM w),
       |$iters""".stripMargin
  }

  val bpeTrainMergesSql: String = {
    val union = (0 until BPE_MERGES).map(k =>
      s"SELECT ${k + 1} AS k, pair, merged, c FROM b$k").mkString("\nUNION ALL ")
    s"""${bpeChainSql(withFinalSeq = false)}
       |SELECT CAST(k AS BIGINT) AS rank, pair, merged, CAST(c AS BIGINT) AS c
       |FROM ($union)
       |ORDER BY rank""".stripMargin
  }

  val bpeTokenizeSql: String =
    s"""${bpeChainSql(withFinalSeq = true)}
       |SELECT token, CAST(SUM(freq) AS BIGINT) AS c
       |FROM (SELECT freq, unnest(string_split(seq, ' ')) AS token FROM s$BPE_MERGES)
       |GROUP BY token
       |ORDER BY c DESC, token LIMIT 25""".stripMargin

  val bpeApplyBatchSql: String = {
    val applyIters = (0 until BPE_MERGES).map { k =>
      val pat = "COALESCE(' ' || bp.pair || ' ', chr(1))"
      val rep = "COALESCE(' ' || bp.merged || ' ', chr(1))"
      s"""a${k + 1} AS MATERIALIZED (SELECT source,
         |  trim(replace(replace(' ' || seq || ' ', $pat, $rep), $pat, $rep)) AS seq
         |  FROM a$k LEFT JOIN b$k bp ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""${bpeChainSql(withFinalSeq = true, trainWhere = " WHERE doc_id % 7 <> 3")},
       |vset AS MATERIALIZED (SELECT DISTINCT unnest(string_split(seq, ' ')) AS vtok FROM s$BPE_MERGES),
       |bwords AS MATERIALIZED (SELECT source, word FROM (
       |  SELECT source, unnest(string_split(text, ' ')) AS word
       |  FROM documents WHERE doc_id % 7 = 3) t WHERE len(word) >= 1),
       |a0 AS MATERIALIZED (SELECT source, array_to_string(string_split(word, ''), ' ') AS seq FROM bwords),
       |$applyIters,
       |btok AS (SELECT source, unnest(string_split(seq, ' ')) AS tok FROM a$BPE_MERGES),
       |tc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |  FROM btok LEFT JOIN vset ON tok = vtok GROUP BY source),
       |wc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_words FROM bwords GROUP BY source)
       |SELECT wc.source, n_words, n_tokens,
       |  CAST(n_tokens * 1000000 // n_words AS BIGINT) AS fertility_ppm,
       |  n_oov,
       |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(n_oov * 1000000 // n_tokens AS BIGINT) END AS oov_ppm
       |FROM wc JOIN tc USING (source)
       |ORDER BY wc.source""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_substring" -> dedupSubstringSql,
    "dedup_span_apply" -> dedupSpanApplySql,
    "text_lm_rarity" -> textLmRaritySql,
    "corpus_token_hist" -> corpusTokenHistSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "knn_graph" -> knnGraphSql,
    "pipe_quality_funnel" -> pipeQualityFunnelSql,
    "eval_split" -> evalSplitSql,
    "bpe_pair_counts" -> bpePairCountsSql,
    "bpe_train_merges" -> bpeTrainMergesSql,
    "bpe_tokenize" -> bpeTokenizeSql,
    "bpe_apply_batch" -> bpeApplyBatchSql,
    "dedup_semantic_keep" -> dedupSemanticKeepSql,
    "embed_dim_stats" -> embedDimStatsSql)
}
