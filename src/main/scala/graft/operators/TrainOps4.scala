package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C training-data pipeline, part 4: epoch shuffling and
  * token-budget curation — the ordering/selection stages between a
  * curated corpus and the training loader.
  */
object TrainOps4 {
  type Q = (SparkSession, String) => DataFrame

  // --- shuffle_epoch: deterministic distributed training order ------
  /** Training loaders need a different, reproducible document order
    * per epoch, computed WITHOUT a global sort point: the shuffle key
    * is md5(epoch || '_' || doc_id) (stateless, seedable, identical
    * on any cluster size), the 60-bit key prefix places the doc in
    * one of 32 shards, and rank is
    * row_number() OVER (PARTITION BY epoch, shard ORDER BY k, doc_id)
    * — but computed WITHOUT funneling a shard through one task. A
    * per-shard window would make one partition sort a whole shard
    * (~3 TB per task at 100 TB); instead the global row_number over
    * the total (epoch, shard, k, doc_id) order comes from
    * Rank.globalRowNumber (ONE range shuffle + in-partition sort +
    * projection-derived local rank + broadcast offsets — every task
    * holds a balanced range slice regardless of shard count or shard
    * skew), and the per-group rank is rebased to the group's first
    * global rank. The base is NOT re-aggregated from the ranked
    * frame: groups are contiguous in the global order, so
    * base(epoch, shard) = 1 + Σ counts of lexically earlier groups —
    * a SHARDS×EPOCHS-row aggregate over the keyed input with a
    * broadcast theta-join running sum, never touching the ranked
    * subtree twice. The two formulations are identical row-for-row —
    * the oracle stays the plain window SQL. A loader streams shards
    * in order, rows in rank order; shards map to output files,
    * parallelism to range slices, and neither is a per-task sort
    * ceiling.
    */
  val EPOCHS = 2
  val SHARDS = 32

  /** The ranked frame before the presentation sort — partitioning here
    * is globalRowNumber's balanced range slices (broadcast joins keep
    * the streamed side's partitioning), which is what the scale spec
    * measures: the data is shuffled exactly once (the range exchange),
    * and no slice holds more than ~n/parallelism rows no matter how
    * skewed the (epoch, shard) groups are.
    */
  def shuffleEpochRanked(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val epochs = (0 until EPOCHS).map(e => docs.withColumn("epoch", lit(e.toLong)))
      .reduce(_ unionByName _)
    val key = conv(substring(md5(concat(col("epoch"), lit("_"), col("doc_id"))), 1, 15), 16, 10)
      .cast("long")
    val keyed = epochs.withColumn("k", key)
      .withColumn("shard", pmod(col("k"), lit(SHARDS.toLong)))
    val ranked = Rank.globalRowNumber(keyed,
      Seq(col("epoch"), col("shard"), col("k"), col("doc_id")), "__grn")
    // Group bases WITHOUT re-deriving the ranked subtree: groups are
    // contiguous in the (epoch, shard, k, doc_id) order, so a group's
    // first global rank is 1 + the total count of lexically earlier
    // groups. One map-side-combined aggregate (≤ EPOCHS×SHARDS rows)
    // plus a broadcast theta-join running sum over that bounded frame.
    val gcnt = keyed.groupBy(col("epoch"), col("shard")).agg(count(lit(1)).as("__cnt"))
    val bases = gcnt.alias("a")
      .join(broadcast(gcnt.alias("b")),
        col("b.epoch") < col("a.epoch") ||
          (col("b.epoch") === col("a.epoch") && col("b.shard") < col("a.shard")),
        "left")
      .groupBy(col("a.epoch").as("epoch"), col("a.shard").as("shard"))
      .agg((coalesce(sum(col("b.__cnt")), lit(0L)) + 1L).as("__base"))
    ranked.join(broadcast(bases), Seq("epoch", "shard"))
      .withColumn("pos", col("__grn") - col("__base") + lit(1L))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
  }

  val shuffleEpoch: Q = (s, d) =>
    shuffleEpochRanked(s, d).orderBy(col("epoch"), col("shard"), col("pos"))

  val shuffleEpochSql: String =
    s"""WITH ep AS (SELECT doc_id, e.epoch
      |           FROM documents
      |           CROSS JOIN (SELECT unnest(range($EPOCHS)) AS epoch) e),
      |keyed AS (SELECT epoch, doc_id,
      |            CAST(concat('0x', substr(md5(epoch || '_' || doc_id), 1, 15)) AS BIGINT) AS k
      |          FROM ep)
      |SELECT epoch, k % $SHARDS AS shard,
      |  CAST(row_number() OVER (PARTITION BY epoch, k % $SHARDS
      |    ORDER BY k, doc_id) AS BIGINT) AS pos,
      |  doc_id
      |FROM keyed ORDER BY epoch, shard, pos""".stripMargin

  // --- budget_select: per-source token-budget curation ---------------
  /** Data curation under a token budget: each source contributes its
    * longest documents (n_chars DESC, doc_id tiebreak) until the
    * source's cumulative token count would exceed the budget. All
    * counts are integers (whitespace tokens), the running sum is a
    * per-source window — the shuffle key is `source`, so the work
    * distributes by source and a skewed source bounds only its own
    * partition (a production run sub-budgets giant sources first).
    */
  val TOKEN_BUDGET = 2000L

  val budgetSelect: Q = (s, d) => {
    // single-space split — the text_tokens parity-proven tokenizer
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_tok", sum(col("tok")).over(w))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
      .filter(col("cum_tok") <= TOKEN_BUDGET)
      .select(col("source"), col("rank"), col("doc_id"), col("tok"), col("cum_tok"))
      .orderBy(col("source"), col("rank"))
  }

  val budgetSelectSql: String =
    s"""WITH t AS (SELECT source, doc_id, n_chars,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |           FROM documents),
      |r AS (SELECT source, doc_id, tok,
      |        CAST(SUM(tok) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
      |        CAST(row_number() OVER (PARTITION BY source
      |          ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
      |      FROM t)
      |SELECT source, rank, doc_id, tok, cum_tok
      |FROM r WHERE cum_tok <= $TOKEN_BUDGET
      |ORDER BY source, rank""".stripMargin

  // --- corpus_report: per-source corpus health in one pass -----------
  /** The summary a curation run starts from: per source, document and
    * token volume, length distribution, language mix, and the exact-
    * duplicate rate (distinct normalized-text hashes vs rows). One
    * groupBy over a per-row projection — a single shuffle keyed by
    * source at any corpus size; the dup rate rides the same pass as a
    * count distinct. All emitted numbers are integers (ppm for rates)
    * so the gate compares exactly.
    */
  val corpusReport: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("source"), col("lang"),
      col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("tok"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("tok")).as("total_tokens"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(col("n_chars")).as("sum_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("h")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("min_chars"), col("max_chars"),
        // scaled numerators in DECIMAL(38,0) before the integral div
        // (same class as embed_dim_stats): sum_chars * 1e6 wraps int64
        // at ~9 TB of text per source — exactly this op's target scale
        expr("(cast(sum_chars as decimal(38,0)) * 1000000) div n_docs")
          .as("mean_chars_ppm"),
        col("n_langs"),
        expr("(cast(n_docs - n_distinct as decimal(38,0)) * 1000000) div n_docs")
          .as("dup_rate_ppm"))
      .orderBy(col("source"))
  }

  val corpusReportSql: String =
    """WITH t AS (SELECT source, lang, n_chars,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
      |             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      |           FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
      |  CAST(CAST(SUM(n_chars) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS mean_chars_ppm,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(CAST(COUNT(*) - COUNT(DISTINCT h) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS dup_rate_ppm
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  // --- sketch_cms_exact: count-min sketch with derivable hashes ------
  /** A 4-row × 1024-bucket count-min sketch over the corpus token
    * stream, with hash rows derived from md5 — so the SKETCH ITSELF is
    * bit-identical in both engines and the whole sketch lifecycle
    * (build → point query → error observation) sits under the hash
    * gate. Emits the top-20 tokens with true count, CMS estimate, and
    * overcount (estimate − truth ≥ 0, the CMS guarantee the spec
    * asserts). The build is one groupBy over (row, bucket) — 4 096
    * cells regardless of corpus size, the whole point of a sketch at
    * 100 TB: the shuffle reduces to a fixed-size frame that then
    * broadcasts to answer point queries.
    */
  val CMS_ROWS = 4
  val CMS_BUCKETS = 1024L

  private def cmsBucket(r: Column, w: Column): Column =
    pmod(conv(substring(md5(concat(lit("c"), r.cast("string"), lit("_"), w)), 1, 15),
      16, 10).cast("long"), lit(CMS_BUCKETS))

  val sketchCmsExact: Q = (s, d) => {
    // wide() BEFORE the explode, hashed on doc_id (hash repartition
    // skips round-robin's deterministic pre-sort — sorting the
    // exploded token stream cost more than the spread won): the truth
    // aggregation and the CMS_ROWS union legs all REUSE the one
    // explicit exchange and the md5 bucketing runs at session width
    val toks = Tables.wide(Tables.documents(s, d)
        .select(col("doc_id"), col("text")), col("doc_id"))
      .select(explode(split(col("text"), " ")).as("w"))
    val truth = graft.Caches.cached(
      toks.groupBy(col("w")).agg(count(lit(1)).as("true_cnt")))
    // Hash the VOCABULARY, not the token stream: a CMS cell is
    // Σ occurrences over the words hashing into it, and `truth`
    // already holds per-word occurrence counts — so each union leg
    // md5-buckets the Heaps-bounded distinct-word frame weighted by
    // true_cnt instead of re-hashing every corpus token occurrence
    // (guide §2.3 "aggregate before you shuffle": the md5 count drops
    // from CMS_ROWS × |tokens| to CMS_ROWS × |vocab|). Identical
    // cells — sum of per-word longs in place of a row count.
    val sketch = (0 until CMS_ROWS).map { r =>
      truth.select(lit(r.toLong).as("r"), cmsBucket(lit(r), col("w")).as("bucket"),
        col("true_cnt"))
    }.reduce(_ unionByName _)
      .groupBy(col("r"), col("bucket")).agg(sum(col("true_cnt")).as("cell"))
    val queried = truth
      .orderBy(col("true_cnt").desc, col("w")).limit(20)
    val est = (0 until CMS_ROWS).map { r =>
      queried.select(col("w"), col("true_cnt"),
        lit(r.toLong).as("r"), cmsBucket(lit(r), col("w")).as("bucket"))
    }.reduce(_ unionByName _)
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("w"), col("true_cnt")).agg(min(col("cell")).as("cms_est"))
    est.select(col("w"), col("true_cnt"), col("cms_est"),
        (col("cms_est") - col("true_cnt")).as("overcount"))
      .orderBy(col("true_cnt").desc, col("w"))
  }

  val sketchCmsExactSql: String =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |truth AS (SELECT w, COUNT(*) AS true_cnt FROM toks GROUP BY w),
      |rows_ AS (SELECT unnest(range($CMS_ROWS)) AS r),
      |sk AS (SELECT r,
      |         CAST(concat('0x', substr(md5('c' || r || '_' || w), 1, 15)) AS BIGINT)
      |           % $CMS_BUCKETS AS bucket,
      |         COUNT(*) AS cell
      |       FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
      |queried AS (SELECT w, true_cnt FROM truth ORDER BY true_cnt DESC, w LIMIT 20),
      |est AS (SELECT q.w, q.true_cnt, MIN(sk.cell) AS cms_est
      |        FROM queried q CROSS JOIN rows_
      |        JOIN sk ON sk.r = rows_.r AND sk.bucket =
      |          CAST(concat('0x', substr(md5('c' || rows_.r || '_' || q.w), 1, 15)) AS BIGINT)
      |            % $CMS_BUCKETS
      |        GROUP BY q.w, q.true_cnt)
      |SELECT w, true_cnt, cms_est, cms_est - true_cnt AS overcount
      |FROM est ORDER BY true_cnt DESC, w""".stripMargin

  // --- sketch_bloom_exact: Bloom-filter join pruning, derivable ------
  /** The join-pruning sketch: a k=3 / 8192-bit Bloom filter over the
    * corpus's normalized-text keys, probed by an incoming batch (100
    * exact corpus copies that MUST hit + 100 'novel'-prefixed texts
    * that should miss). Bit positions come from md5, so filter and
    * probes are bit-identical across engines and the emitted rows —
    * in_bloom, exact membership, and the observed false positives —
    * all sit under the hash gate. This is the structure behind
    * runtime bloom-filter join pruning at scale: the filter is a
    * fixed-size broadcast regardless of corpus size, and every probe
    * that misses skips the expensive exact join.
    */
  val BLOOM_BITS = 8192L
  val BLOOM_K = 3

  private def bloomBit(k: Int, key: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"b${k}_"), key)), 1, 15), 16, 10).cast("long"),
      lit(BLOOM_BITS))

  private def textKey(t: Column): Column =
    md5(regexp_replace(lower(trim(t)), "\\s+", " "))

  val sketchBloomExact: Q = (s, d) => {
    // NULL texts hash to NULL keys; keep them out of the key set on
    // BOTH engines — a NULL in DuckDB's IN-subquery would turn every
    // non-matching membership probe into NULL (three-valued logic)
    // while Spark's left-join coalesces to false
    val corpusKeys = Tables.documents(s, d).select(textKey(col("text")).as("key"))
      .filter(col("key").isNotNull).distinct()
    val bits = (0 until BLOOM_K).map(k =>
      corpusKeys.select(lit(k).as("k"), bloomBit(k, col("key")).as("bit")))
      .reduce(_ unionByName _).distinct()
    val head = Tables.documents(s, d).filter(col("doc_id") < 100)
    val incoming = head.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(head.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("novel "), col("text")).as("text")))
      .select(col("doc_id"), textKey(col("text")).as("key"))
    val probes = (0 until BLOOM_K).map(k =>
      incoming.select(col("doc_id"), col("key"), lit(k).as("k"),
        bloomBit(k, col("key")).as("bit")))
      .reduce(_ unionByName _)
    val hitCount = probes
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("k", "bit"), "left")
      .groupBy(col("doc_id"), col("key"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("nbits"))
    hitCount
      .withColumn("in_bloom", col("nbits") === BLOOM_K)
      .join(corpusKeys.withColumn("m", lit(true)), Seq("key"), "left")
      .withColumn("is_member", coalesce(col("m"), lit(false)))
      .select(col("doc_id"), col("in_bloom"), col("is_member"),
        (col("in_bloom") && !col("is_member")).as("false_positive"))
      .orderBy(col("doc_id"))
  }

  val sketchBloomExactSql: String =
    s"""WITH keyc AS (SELECT DISTINCT
      |         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS key
      |       FROM documents WHERE text IS NOT NULL),
      |ks AS (SELECT unnest(range($BLOOM_K)) AS k),
      |bits AS (SELECT DISTINCT ks.k,
      |           CAST(concat('0x', substr(md5('b' || ks.k || '_' || key), 1, 15)) AS BIGINT)
      |             % $BLOOM_BITS AS bit
      |         FROM keyc CROSS JOIN ks),
      |head AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
      |inc AS (
      |  SELECT doc_id + 1000000 AS doc_id,
      |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS key FROM head
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |    md5(regexp_replace(lower(trim('novel ' || text)), '\\s+', ' ', 'g')) FROM head),
      |probes AS (SELECT doc_id, key, ks.k,
      |             CAST(concat('0x', substr(md5('b' || ks.k || '_' || key), 1, 15)) AS BIGINT)
      |               % $BLOOM_BITS AS bit
      |           FROM inc CROSS JOIN ks),
      |hc AS (SELECT p.doc_id, p.key,
      |         SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nbits
      |       FROM probes p LEFT JOIN bits b ON b.k = p.k AND b.bit = p.bit
      |       GROUP BY p.doc_id, p.key)
      |SELECT doc_id, nbits = $BLOOM_K AS in_bloom,
      |  COALESCE(key IN (SELECT key FROM keyc), FALSE) AS is_member,
      |  nbits = $BLOOM_K AND NOT COALESCE(key IN (SELECT key FROM keyc), FALSE)
      |    AS false_positive
      |FROM hc ORDER BY doc_id""".stripMargin

  // --- sketch_quantile_exact: histogram quantile sketch --------------
  /** The quantile sketch completing the trio (frequency = CMS,
    * membership = Bloom, quantiles = this): a 1024-bin equi-width
    * histogram over integer price cents, queried for 7 percentiles by
    * cumulative-count walk. Everything is integer arithmetic over a
    * ≤1024-row frame after one groupBy — the t-digest role with
    * deterministic, engine-independent bins. The only full-corpus
    * work is the min/max/count pass and the binning groupBy; the
    * cumulative window runs over the bounded bin frame, never the
    * data. Estimate error ≤ one bin width by construction
    * (spec-asserted against the exact order statistic).
    */
  val QSKETCH_BINS = 1024L
  private val QSKETCH_PCTS = Seq(1, 5, 25, 50, 75, 95, 99)

  val sketchQuantileExact: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    // NO wide() here, deliberately: the repartition's shuffle WRITE
    // runs at the scan's own (narrow) split count, so for this
    // one-long-column projection it costs more than the second parquet
    // scan it would save (measured: wide() version 0.89-1.04 s vs
    // 0.55 s baseline at sf0.1 — the 3-task exchange write alone was
    // 438 ms). Columnar re-scans of a single long column are cheaper
    // than a row-oriented shuffle round-trip; guide §1.2 — fix the
    // algorithm only where the per-row work dominates.
    val v = Tables.lineitem(s, d)
      .select((col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
    // cached: statsDf (one row) feeds both the binning pass and the
    // percentile targets — uncached, the min/max/count pass ran twice
    val statsDf = graft.Caches.cached(
      v.agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
        count(lit(1)).as("n")))
    val binned = v.crossJoin(broadcast(statsDf))
      .select(expr(s"((c - mn) * $QSKETCH_BINS) div (mx - mn + 1)").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("cum", sum(col("cnt")).over(wcum))
    val qdf = statsDf.select(
        explode(array(QSKETCH_PCTS.map(p => lit(p.toLong)): _*)).as("q_pct"),
        col("n"), col("mn"), col("mx"))
      .withColumn("k", expr("(q_pct * n + 99) div 100"))
    qdf.join(cum, cum("cum") >= qdf("k"))
      .groupBy(col("q_pct"), col("k"), col("mn"), col("mx"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("q_pct"), col("qbin"),
        expr(s"mn + (qbin * (mx - mn + 1)) div $QSKETCH_BINS").as("est_cents"),
        col("k"))
      .orderBy(col("q_pct"))
  }

  val sketchQuantileExactSql: String =
    s"""WITH v AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |           FROM lineitem),
      |st AS (SELECT min(c) AS mn, max(c) AS mx, COUNT(*) AS n FROM v),
      |binned AS (SELECT CAST((c - mn) * $QSKETCH_BINS // (mx - mn + 1) AS BIGINT) AS bin,
      |             COUNT(*) AS cnt
      |           FROM v CROSS JOIN st GROUP BY 1),
      |cum AS (SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |        FROM binned),
      |q AS (SELECT q_pct, mn, mx,
      |        CAST((q_pct * n + 99) // 100 AS BIGINT) AS k
      |      FROM st CROSS JOIN (SELECT unnest([${QSKETCH_PCTS.mkString(", ")}]) AS q_pct) p),
      |sel AS (SELECT q.q_pct, q.k, q.mn, q.mx, MIN(cum.bin) AS qbin
      |        FROM q JOIN cum ON cum.cum >= q.k
      |        GROUP BY q.q_pct, q.k, q.mn, q.mx)
      |SELECT CAST(q_pct AS BIGINT) AS q_pct, qbin,
      |  CAST(mn + (qbin * (mx - mn + 1)) // $QSKETCH_BINS AS BIGINT) AS est_cents, k
      |FROM sel ORDER BY q_pct""".stripMargin

  // --- sketch_kmv_exact: k-minimum-values cardinality sketch --------
  /** Cardinality estimation completing the sketch quartet (frequency,
    * membership, quantiles, and now distinct counts — the HLL role):
    * keep the k smallest 60-bit md5 hash values of the key stream;
    * the k-th smallest estimates density, so n̂ = (k−1)·U/kth. The
    * estimate divides on the 2³⁰-scaled kth so every intermediate
    * fits int64 on both engines ((k−1)·2³⁰ ≤ 2³⁶) — deterministic,
    * identical rounding, no HUGEINT dependence. Fewer than k distinct
    * values means the sketch IS the exact set. The sketch state is k
    * values regardless of corpus size — a TakeOrdered(k), no full
    * shuffle; true_distinct rides along as the accuracy baseline.
    */
  val KMV_K = 64

  val sketchKmvExact: Q = (s, d) => {
    // one key derivation (textKey), and NULLs filtered on BOTH sides:
    // Spark's orderBy is NULLS FIRST, DuckDB's LIMIT is NULLS LAST —
    // a null text would put a null hash in one engine's k-window only
    val h = Tables.documents(s, d)
      .select(conv(substring(textKey(col("text")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .filter(col("h").isNotNull)
      .distinct()
    val kmin = h.orderBy(col("h")).limit(KMV_K)
      .agg(max(col("h")).as("kth"), count(lit(1)).as("kk"))
    val truth = h.agg(count(lit(1)).as("true_distinct"))
    kmin.crossJoin(truth)
      .select(col("kk"), col("kth"), col("true_distinct"),
        expr(s"""CASE WHEN kk < $KMV_K THEN kk
                 ELSE ((kk - 1) * 1073741824) div greatest(1, kth div 1073741824)
                 END""").as("est_distinct"))
  }

  val sketchKmvExactSql: String =
    s"""WITH h AS (SELECT DISTINCT
      |         CAST(concat('0x', substr(md5(
      |           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 15)) AS BIGINT) AS h
      |       FROM documents WHERE text IS NOT NULL),
      |kmin AS (SELECT max(h) AS kth, COUNT(*) AS kk
      |         FROM (SELECT h FROM h ORDER BY h LIMIT $KMV_K) t),
      |truth AS (SELECT COUNT(*) AS true_distinct FROM h)
      |SELECT kk, kth, true_distinct,
      |  CAST(CASE WHEN kk < $KMV_K THEN kk
      |       ELSE ((kk - 1) * 1073741824) // greatest(1, kth // 1073741824)
      |       END AS BIGINT) AS est_distinct
      |FROM kmin CROSS JOIN truth""".stripMargin

  // --- corpus_diff: snapshot diff for dataset versioning --------------
  // The ops primitive behind corpus version bumps ("what changed
  // between v1 and v2 of the training set?"): per-doc disposition
  // added / removed / changed / unchanged by CONTENT HASH, never by
  // text equality at the join — each side reduces to (doc_id, md5,
  // len) BEFORE the full-outer join, so the one shuffle carries
  // fixed-width rows regardless of document size (at 100 TB the diff
  // of two corpus snapshots is doc-count-sized, not byte-sized).
  // Snapshots are deterministic slices of the documents table: old =
  // doc_id % 7 <> 3 with original text; new drops doc_id % 13 = 5 and
  // revises doc_id % 11 = 0 (a ' [rev2]' suffix — a byte-appending
  // transform both engines apply identically on ANY text; upper() was
  // rejected because Java full case mapping and DuckDB simple mapping
  // diverge on non-ASCII, e.g. ß) — so all four dispositions occur and
  // the oracle rebuilds both snapshots exactly. Absent-side lengths
  // surface as -1 (a sentinel both engines emit identically; NULL
  // would hash engine-dependently).
  val corpusDiff: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val old = docs.filter(col("doc_id") % 7 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("old_hash"),
        length(col("text")).cast("long").as("old_len"))
    val neu = docs.filter(col("doc_id") % 13 =!= 5)
      .withColumn("text2",
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .select(col("doc_id"), md5(col("text2")).as("new_hash"),
        length(col("text2")).cast("long").as("new_len"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") =!= col("new_hash"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("old_len"), lit(-1L)).as("old_len"),
        coalesce(col("new_len"), lit(-1L)).as("new_len"))
      .orderBy(col("doc_id"))
  }

  val corpusDiffSql: String =
    """WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      |old AS (SELECT doc_id, md5(text) AS old_hash,
      |    CAST(len(text) AS BIGINT) AS old_len
      |  FROM d0 WHERE doc_id % 7 <> 3),
      |neu AS (SELECT doc_id,
      |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS new_hash,
      |    CAST(len(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS BIGINT) AS new_len
      |  FROM d0 WHERE doc_id % 13 <> 5)
      |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
      |  CASE WHEN old_hash IS NULL THEN 'added'
      |       WHEN new_hash IS NULL THEN 'removed'
      |       WHEN old_hash <> new_hash THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  COALESCE(old_len, -1) AS old_len,
      |  COALESCE(new_len, -1) AS new_len
      |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "corpus_diff" -> corpusDiff,
    "shuffle_epoch" -> shuffleEpoch,
    "budget_select" -> budgetSelect,
    "corpus_report" -> corpusReport,
    "sketch_cms_exact" -> sketchCmsExact,
    "sketch_bloom_exact" -> sketchBloomExact,
    "sketch_quantile_exact" -> sketchQuantileExact,
    "sketch_kmv_exact" -> sketchKmvExact)

  val oracles: Map[String, String] = Map(
    "corpus_diff" -> corpusDiffSql,
    "shuffle_epoch" -> shuffleEpochSql,
    "budget_select" -> budgetSelectSql,
    "corpus_report" -> corpusReportSql,
    "sketch_cms_exact" -> sketchCmsExactSql,
    "sketch_bloom_exact" -> sketchBloomExactSql,
    "sketch_quantile_exact" -> sketchQuantileExactSql,
    "sketch_kmv_exact" -> sketchKmvExactSql)
}
