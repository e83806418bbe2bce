package graft.operators

import graft.Tables
import graft.functions.Expr
import graft.plans.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C ann_ivfpq: the IVFADC composition — coarse IVF pruning over the
  * PERSISTED cell-partitioned index composed with product-quantized
  * Asymmetric Distance Computation serve. This is the shape a
  * billion-vector deployment actually runs (the FAISS IVFADC posture):
  * the coarse quantizer routes a query to a handful of cells, and
  * inside those cells candidates are scored from their 8-byte PQ codes
  * against a broadcast query LUT — the corpus is touched only in the
  * probed partitions and only as codes, never as full vectors.
  *
  * Both halves already exist gated in this library (ann_ivf_index /
  * eval_retrieval_ivf for the IVF side; ann_pq_exact /
  * eval_retrieval_pq for the PQ side); this operator is their
  * composition over ONE persisted index:
  *
  *   - the coarse quantizer and cell assignment are EXACTLY the
  *     persisted exact-IVF index eval_retrieval_ivf grades
  *     (Similarity.ensureIvfxIndex: frozen md5-sampled quantizer,
  *     build on the %7<>3 slice + held-out append, corpus partitioned
  *     by cent_id under the versioned commit protocol);
  *   - the PQ layer (per-subspace codebooks + per-vector codes) is
  *     trained over the indexed corpus with ann_pq_exact's exact
  *     int64 discipline (md5-sampled donor codebooks, K = min(256,
  *     floor(√n)), argmin |cw|²−2·sv·cw encode with lower-code ties)
  *     and PERSISTED next to the corpus, codes partitioned by the SAME
  *     cent_id — so a probe prunes codes and vectors with one filter;
  *   - serve = probe-cell selection (broadcast centroid frame, bounded
  *     TopK) → literal cent_id partition pruning on the codes scan
  *     (the stream_bm25_gate discipline: the probed-cell set is
  *     queries × nProbe, metadata-sized at any corpus scale, and
  *     literals give PLAN-TIME PartitionFilters) → broadcast LUT join
  *     → ONE map-side-combinable aggregation summing the per-subspace
  *     LUT entries per (query, candidate).
  *
  * Every step is integer-exact and engine-reproducible, so the whole
  * composition — index build, append, PQ training, encode, probe, ADC
  * ranking — sits under the DuckDB hash gate (the oracle recomputes
  * the identical index and codes from the raw corpus). Scale shape:
  * the per-query cost is nProbe cells × cell-size codes (8 small ints
  * per candidate, the 32x memory story), the LUT is queries × K × M
  * rows (broadcast), and nothing outside the probed partitions is
  * read — PlanAuditSpec asserts the pruning and the partial ADC
  * aggregation on the physical plan.
  */
object IvfPq {
  type Q = (SparkSession, String) => DataFrame

  private val pqCodesSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "vec_id BIGINT, s BIGINT, code_id BIGINT, cent_id BIGINT")
  private val pqCbSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "s BIGINT, code_id BIGINT, cw ARRAY<BIGINT>")

  /** Session-memoized PQ layers (write-once per index path+process). */
  private val builtPq =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Ensure the persisted IVF index at the standard path ALSO carries
    * its PQ layer: per-subspace codebooks (metadata-sized, ≈ K×M rows)
    * and per-vector codes partitioned by the corpus's own cent_id.
    * Write-once per process, layered on the memoized exact-IVF index
    * so ann_ivfpq_exact, eval_retrieval_ivfpq, eval_retrieval_ivf and
    * ivf_skew_report all measure the SAME index.
    */
  private[graft] def ensureIvfxPqIndex(s: SparkSession, d: String): String = {
    val path = Similarity.ensureIvfxIndex(s, d)
    builtPq.computeIfAbsent(path, { _ =>
      val corpus = s.read.schema(Similarity.ivfxCorpusSchema)
        .parquet(Similarity.liveCorpusPath(s, path))
      val e = corpus.select(col("vec_id"), col("cv"))
      val m = Similarity.pqModulus(e.count())
      val (cb, codes) = Similarity.pqEncode(e, m)
      cb.select(col("s").cast("long").as("s"), col("code_id"), col("cw"))
        .write.mode("overwrite").parquet(s"$path/pq/codebook")
      codes.select(col("vec_id"), col("s").cast("long").as("s"), col("code_id"))
        .join(corpus.select(col("vec_id"), col("cent_id")), Seq("vec_id"))
        .repartition(col("cent_id"))
        .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/pq/codes")
      java.lang.Boolean.TRUE
    })
    path
  }

  /** The query set's per-subspace slices (query_id, s, qsv). */
  private def querySubvectors(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < Similarity.NQUERIES)
      .select(col("vec_id").as("query_id"),
        Expr.quantVec(col("embedding")).as("qv"))
      .select(col("query_id"),
        explode(sequence(lit(0L), lit(Similarity.PQ_M - 1L))).as("s"), col("qv"))
      .select(col("query_id"), col("s"),
        expr(s"slice(qv, s * ${Similarity.PQ_SUBD} + 1, ${Similarity.PQ_SUBD})")
          .as("qsv"))

  val annIvfpqExact: Q = (s, d) => {
    val path = ensureIvfxPqIndex(s, d)
    val cents = s.read.schema(Similarity.ivfxCentSchema)
      .parquet(s"$path/centroids")
    val qs = Tables.embeddings(s, d).filter(col("vec_id") < Similarity.NQUERIES)
      .select(col("vec_id").as("query_id"),
        Expr.quantVec(col("embedding")).as("qv"))
    val probes = TopK.topKPerGroup(
        qs.crossJoin(broadcast(cents))
          .select(col("query_id"), col("cent_id"),
            Expr.longDot(col("qv"), col("cvec")).as("cdot")),
        Seq("query_id"), Seq(("cdot", true), ("cent_id", false)),
        Similarity.IVFX_NPROBE)
      .select(col("query_id"), col("cent_id"))
    // the probed-cell set is queries × nProbe — metadata-sized at any
    // corpus scale — so collecting it to literals is what turns the
    // codes scan into a plan-time PartitionFilter (directory
    // elimination; the unprobed bulk of a 100 TB index is never read)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    val codes = Similarity.partitionedFrame(s, s"$path/pq/codes", pqCodesSchema)
      .filter(col("cent_id").isin(probedCells: _*))
    val cb = s.read.schema(pqCbSchema).parquet(s"$path/pq/codebook")
    val lut = querySubvectors(s, d).join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code_id"),
        Expr.longDot(col("qsv"), col("cw")).as("qdot"))
    val scored = codes.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qdot")).as("score"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("score", true), ("vec_id", false)), Similarity.TOPK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The full IVFADC recomputed in SQL: the exact-IVF assignment CTEs
    * (shared verbatim with eval_retrieval_ivf / ivf_skew_report, so
    * the composition can never drift from the index it serves) plus
    * ann_pq_exact's codebook/encode CTEs over the same quantized
    * corpus, probed and ADC-scored.
    */
  val annIvfpqExactSql: String = {
    import Similarity.{PQ_M, PQ_SUBD, PQ_KMAX, IVFX_NPROBE, NQUERIES, TOPK}
    s"""WITH ${Similarity.ivfxAssignCtes},
       |pmm AS (SELECT greatest(1, count(*) // least($PQ_KMAX, greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |sub AS (SELECT vec_id, s, cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS sv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s)),
       |cb AS (SELECT s.s, s.vec_id AS code_id, s.sv AS cw
       |  FROM sub s, pmm
       |  WHERE CAST(concat('0x', substr(md5(CAST(s.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % m = 0),
       |enc0 AS (SELECT sub.vec_id, sub.s, cb.code_id,
       |    CAST(list_sum([cb.cw[j]*cb.cw[j] - 2*sub.sv[j]*cb.cw[j]
       |      FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS cost
       |  FROM sub JOIN cb ON cb.s = sub.s),
       |codes AS (
       |  -- streaming argmin (lexicographic [cost, code_id] min), NOT a
       |  -- row_number window: the window form materializes+sorts
       |  -- |corpus|x8x256 rows and spills >76GB in DuckDB at the 100x
       |  -- corpus; the grouped min streams in |corpus|x8 group state
       |  SELECT vec_id, s, CAST(min([cost, code_id])[2] AS BIGINT) AS code_id
       |  FROM enc0 GROUP BY vec_id, s),
       |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < $NQUERIES),
       |pd AS (SELECT q.query_id, c.cent_id,
       |    CAST(list_sum([q.qv[i] * c.cvec[i] FOR i IN range(1, len(q.qv) + 1)]) AS BIGINT) AS cdot
       |  FROM q CROSS JOIN cents c),
       |probes AS (SELECT query_id, cent_id FROM (
       |    SELECT query_id, cent_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
       |    FROM pd) t WHERE rn <= $IVFX_NPROBE),
       |qsub AS (SELECT vec_id AS query_id, s, cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS qsv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s) WHERE vec_id < $NQUERIES),
       |lut AS (SELECT qsub.query_id, cb.s, cb.code_id,
       |    CAST(list_sum([qsub.qsv[j]*cb.cw[j] FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS qdot
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
       |  FROM sc) t WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin
  }

  // --- eval_retrieval_ivfpq: grade the composed head ------------------
  // The measurement that closes the IVFADC story: recall@10/MRR of the
  // partition-pruned compressed serve against the exact int64 truth —
  // the number a deployment compares against eval_retrieval_ivf
  // (pruning-only) and eval_retrieval_pq (compression-only) to see
  // what the COMPOSITION costs beyond each half alone. Same
  // retrievalMetrics block, all-integer, hash-gated.
  val evalRetrievalIvfpq: Q = (s, d) => {
    val truth = Similarity.annQuantized(s, d).select(col("query_id"), col("vec_id"))
    val cand = annIvfpqExact(s, d)
      .select(col("query_id"), col("vec_id"), col("rank").as("cand_rank"))
    Similarity.retrievalMetrics(truth, cand)
  }

  val evalRetrievalIvfpqSql: String =
    s"""WITH truth AS (SELECT query_id, vec_id FROM (
       |${Similarity.annQuantizedSql}) tq),
       |cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
       |${annIvfpqExactSql}) tc),
       |hits AS (SELECT c.query_id, c.cand_rank
       |  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id),
       |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
       |ha AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_hit, min(cand_rank) AS first_rel
       |  FROM hits GROUP BY query_id)
       |SELECT nt.query_id, n_truth,
       |  CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       |  CAST(COALESCE(n_hit, 0) * 1000000 // n_truth AS BIGINT) AS recall_ppm,
       |  CAST(CASE WHEN first_rel IS NULL THEN 0
       |       ELSE 1000000 // first_rel END AS BIGINT) AS rr_micros
       |FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id""".stripMargin

  // --- ann_pq_trained: Lloyd-trained PQ codebooks ---------------------
  // ann_pq_exact bootstraps its codebooks by md5-sampling corpus
  // subvectors (the standard bootstrap; SURVEY §2C names kmeans_train
  // as the trained upgrade). This key IS that upgrade: the same
  // deterministic integer Lloyd that kmeans_train gates, run PER
  // SUBSPACE over the corpus's subvector frame, with the sampled
  // donors as seeds — then the trained codebooks feed the IDENTICAL
  // encode + ADC serve plan. Exactness discipline (kmeans_train's,
  // applied per subspace):
  //   - training runs in OFFSET space (component + PQT_OFF > 0) so the
  //     centroid mean's integer division truncates identically in both
  //     engines (trunc == floor on non-negative operands; L2
  //     assignment is translation-invariant, so offset-space argmin ==
  //     raw-space argmin);
  //   - assignment is argmin |c|²−2v·c on the codegen'd long-dot
  //     kernel, ties to the lower code_id; empty cells drop (standard
  //     practical Lloyd, deterministic);
  //   - the ADC LUT uses the trained codewords translated BACK to raw
  //     space (ADC is a dot product — NOT translation-invariant — so
  //     the LUT must be computed where the query vectors live).
  // Scale shape: each round is one broadcast assignment pass over the
  // n×M subvector frame (cb ≤ 256×M rows broadcast) plus one
  // (s, code_id, dim)-keyed aggregation whose output is K×M×SUBD rows;
  // the subvector frame localCheckpoints once. PqSpec asserts the
  // trained codebooks beat the sampled bootstrap on total quantization
  // error (the thing Lloyd descends).
  private[graft] val PQT_ITERS = 2
  private[graft] val PQT_OFF = 257000000L

  /** The corpus subvector frame in OFFSET space: (vec_id, s, sv). */
  private[graft] def pqtSubvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("cv"),
        explode(sequence(lit(0L), lit(Similarity.PQ_M - 1L))).as("s"))
      .select(col("vec_id"), col("s"),
        expr(s"transform(slice(cv, s * ${Similarity.PQ_SUBD} + 1, " +
          s"${Similarity.PQ_SUBD}), x -> x + ${PQT_OFF}L)").as("sv"))

  /** PQT_ITERS deterministic Lloyd rounds over all subspaces at once
    * (keyed (s, code_id)); input and output codebooks in offset space.
    *
    * The per-round assignment was a broadcast join on s + bounded-TopK
    * argmin (n×M×K joined rows per round); the codebook is
    * metadata-sized (≤ PQ_KMAX per subspace — it was already collected
    * into each round's BroadcastExchange), so it now lives driver-local
    * between rounds and assignment is one codegen'd argmin expression
    * over the subvector pass (guide §2.4/§1.2; the kmeans_train
    * driver-local-state discipline). Each round's only distributed job
    * is the vecMean collect — the per-round localCheckpoint
    * materializations disappear. Same long arithmetic, same tie rule —
    * bit-identical codebooks.
    */
  private[graft] def pqTrain(sub: DataFrame, cb0: DataFrame): DataFrame = {
    val spark = sub.sparkSession
    var rows = cb0.select(col("s"), col("code_id"), col("cw")).collect()
    var schema = cb0.select(col("s"), col("code_id"), col("cw")).schema
    for (_ <- 1 to PQT_ITERS) {
      val local = Similarity.localCodebook(rows, Similarity.PQ_M)
      // empty-codebook edge decided driver-side — an isNotNull filter
      // under the project would run the argmin kernel twice per row
      // (guide §4.4 duplication); see pqEncode
      val assigned = sub.select(col("vec_id"), col("s"), col("sv"),
        Expr.quantAssign(col("s"), col("sv"), local, Similarity.PQ_SUBD)
          .getField("code_id").as("code_id"))
      val assign = if (rows.isEmpty) assigned.filter(lit(false)) else assigned
      val next = Retrain.vecMean(assign, Seq("s", "code_id"), "sv",
        Similarity.PQ_SUBD, "cw")
      schema = next.schema
      rows = next.collect()
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Memoized trained-PQ state per (session, corpus dir): the
    * checkpointed subvector frame and the Lloyd-trained codebook
    * (driver-local, ≤ PQ_KMAX×PQ_M codewords). Training is a
    * write-once artifact of the corpus exactly like the trained IVF
    * quantizer (Similarity.centCache) and the persisted PQ layers
    * (builtPq) — serve calls don't re-run Lloyd. Invalidated with the
    * rest of the trained state (the bench clears per query).
    */
  private val trainedPqState = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), (DataFrame, Array[Array[(Long, Array[Long])]])]()

  val annPqTrained: Q = (s, d) => {
    val (sub, cbLocal) = trainedPqState.computeIfAbsent(
      (System.identityHashCode(s), d), { _ =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), Expr.quantVec(col("embedding")).as("cv"))
        val n = graft.operators.Dedup.corpusSize(
          Tables.embeddings(s, d), s"$d/embeddings")
        val m = Similarity.pqModulus(n)
        // ONE eager materialization: the subvector frame (e itself is
        // consumed only by this checkpoint, so checkpointing it too
        // was a second full pass for nothing)
        val subF = pqtSubvectors(e).localCheckpoint(true)
        val seeds = subF.filter(Similarity.md5Mod(col("vec_id"), m) === 0)
          .select(col("s"), col("vec_id").as("code_id"), col("sv").as("cw"))
        // Lloyd TRAINING runs on the md5-bounded vector sample
        // (Similarity.TRAIN_CAP — per-round cost ≤ cap×M×K at any
        // corpus size; modulus 1 below the cap, so small-scale
        // codebooks are unchanged); the ENCODE pass below still
        // assigns the full corpus — the one-shot index build.
        val tm = Similarity.trainMod(n)
        val subT = (if (tm == 1L) subF
                    else subF.filter(Similarity.md5TrainMod(col("vec_id"), tm) === 0)
                      .localCheckpoint(true))
        val cb = pqTrain(subT, seeds)
        (subF, Similarity.localCodebook(
          cb.select(col("s"), col("code_id"), col("cw")).collect(),
          Similarity.PQ_M))
      })
    // encode in offset space (assignment is translation-invariant):
    // the trained codebook is driver-local, so the full-corpus encode
    // is the codegen'd argmin expression pass — no join, no TopK
    val assigned = sub.select(col("vec_id"), col("s"),
        Expr.quantAssign(col("s"), col("sv"), cbLocal, Similarity.PQ_SUBD)
          .getField("code_id").as("code_id"))
    val codes = (if (cbLocal.forall(_.isEmpty)) assigned.filter(lit(false))
                 else assigned)
      .select(col("vec_id"), col("s"), col("code_id"))
    // ADC LUT in RAW space: translate the trained codewords back
    val ss = s
    import ss.implicits._
    val cbRaw = cbLocal.iterator.zipWithIndex.flatMap { case (cs, sIdx) =>
      cs.iterator.map { case (cid, cw) =>
        (sIdx.toLong, cid, cw.map(_ - PQT_OFF).toSeq) }
    }.toSeq.toDF("s", "code_id", "cw")
    val lut = querySubvectors(s, d).join(broadcast(cbRaw), Seq("s"))
      .select(col("query_id"), col("s"), col("code_id"),
        Expr.longDot(col("qsv"), col("cw")).as("qdot"))
    val scored = codes.join(broadcast(lut), Seq("s", "code_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qdot")).as("score"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("score", true), ("vec_id", false)), Similarity.TOPK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** One Lloyd round over the subvector frame as CTEs (the
    * kmeans_train oracle discipline, keyed (s, code_id)).
    */
  private def pqtRoundSql(i: Int): String = {
    val prev = s"pc${i - 1}"
    val SUBD = Similarity.PQ_SUBD
    s"""pa${i}p AS (SELECT subt.vec_id, subt.s, subt.sv, c.code_id,
       |    CAST(list_sum([c.cw[j]*c.cw[j] - 2*subt.sv[j]*c.cw[j]
       |      FOR j IN range(1, $SUBD + 1)]) AS BIGINT) AS cost
       |  FROM subt JOIN $prev c ON c.s = subt.s),
       |pa$i AS (SELECT vec_id, s, sv, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM pa${i}p) t WHERE rn = 1),
       |px$i AS (SELECT s, code_id, generate_subscripts(sv, 1) AS dim,
       |    unnest(sv) AS x FROM pa$i),
       |ps$i AS (SELECT s, code_id, dim, sum(x) AS sx, count(*) AS c
       |  FROM px$i GROUP BY s, code_id, dim),
       |pc$i AS (SELECT s, code_id, list(sx // c ORDER BY dim) AS cw
       |  FROM ps$i GROUP BY s, code_id)""".stripMargin
  }

  val annPqTrainedSql: String = {
    import Similarity.{PQ_M, PQ_SUBD, PQ_KMAX, NQUERIES, TOPK}
    val rounds = (1 to PQT_ITERS).map(pqtRoundSql).mkString(",\n")
    val last = s"pc$PQT_ITERS"
    s"""WITH e AS (SELECT vec_id,
       |    [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS cv
       |  FROM embeddings),
       |pmm AS (SELECT greatest(1, count(*) // least($PQ_KMAX, greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |sub AS (SELECT vec_id, s,
       |    [x + $PQT_OFF FOR x IN cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD]] AS sv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s)),
       |tm AS (SELECT greatest(1, (count(*) + ${Similarity.TRAIN_CAP - 1}) // ${Similarity.TRAIN_CAP}) AS t FROM e),
       |subt AS (SELECT sub.* FROM sub, tm
       |  WHERE CAST(concat('0x', substr(md5(concat('t:', CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) % t = 0),
       |pc0 AS (SELECT s.s, s.vec_id AS code_id, s.sv AS cw
       |  FROM sub s, pmm
       |  WHERE CAST(concat('0x', substr(md5(CAST(s.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % m = 0),
       |$rounds,
       |encp AS (SELECT sub.vec_id, sub.s, c.code_id,
       |    CAST(list_sum([c.cw[j]*c.cw[j] - 2*sub.sv[j]*c.cw[j]
       |      FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS cost
       |  FROM sub JOIN $last c ON c.s = sub.s),
       |codes AS (SELECT vec_id, s, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM encp) t WHERE rn = 1),
       |cbr AS (SELECT s, code_id, [x - $PQT_OFF FOR x IN cw] AS cw FROM $last),
       |qs AS (SELECT vec_id AS query_id, s, cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS qv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s) WHERE vec_id < $NQUERIES),
       |lut AS (SELECT q.query_id, c.s, c.code_id,
       |    CAST(list_sum([q.qv[j]*c.cw[j] FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS qdot
       |  FROM qs q JOIN cbr c ON c.s = q.s),
       |sc AS (SELECT l.query_id, c.vec_id, CAST(sum(l.qdot) AS BIGINT) AS score
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.code_id = c.code_id
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc) t WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin
  }

  // --- ann_ivfpq_residual: residual-encoded IVFADC --------------------
  // ann_ivfpq_exact PQ-encodes RAW vectors; the canonical IVFADC
  // (FAISS IndexIVFPQ, encode_residual) quantizes each vector's
  // RESIDUAL against its coarse centroid instead — inside a cell the
  // residuals concentrate near the origin, so the same K codewords
  // spend their resolution on a much smaller ball and reconstruction
  // error drops (PqSpec asserts this on a clustered corpus). The serve
  // algebra changes by one term: for candidate v in cell c,
  //   q·v̂ = q·cvec(c) + Σ_s q_s·rcw_s
  // and q·cvec is EXACTLY the cdot the probe stage already computed —
  // the coarse term rides along with the probe list for free, and the
  // fine term is the same broadcast-LUT ADC aggregation.
  //
  // Exactness bound: quantVec clamps components to ±QBOUND, so raw
  // ADC scores are ≤ 64·QBOUND² ≈ 4.2e18. A residual can reach
  // ±2·QBOUND, which would push the worst-case coarse+fine sum past
  // int64; clamping residual components back into ±QBOUND (identical
  // greatest/least in both engines, vacuous on real embeddings where
  // components sit orders of magnitude below the bound) keeps
  // |cdot| + |Σ q_s·rcw_s| ≤ 8.4e18 < 2⁶³ on ANY input, so the ANSI
  // overflow class stays closed even on adversarial corpora.
  private[graft] val QBOUND = 256000000L

  /** Session-memoized residual-PQ layers (write-once per path+process). */
  private val builtPqr =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Layer residual-PQ codebooks + codes (under `pqr/`) onto the same
    * persisted exact-IVF index the raw-PQ layer and the eval heads
    * measure: residual = clamp(cv − cvec), codebooks md5-sampled from
    * the residual subvectors (same donor discipline as pqEncode),
    * codes partitioned by the corpus's own cent_id so one probe prunes
    * codes, vectors, and residual codes alike.
    */
  private[graft] def ensureIvfxPqResIndex(s: SparkSession, d: String): String = {
    val path = Similarity.ensureIvfxIndex(s, d)
    builtPqr.computeIfAbsent(path, { _ =>
      val corpus = s.read.schema(Similarity.ivfxCorpusSchema)
        .parquet(Similarity.liveCorpusPath(s, path))
      val cents = s.read.schema(Similarity.ivfxCentSchema)
        .parquet(s"$path/centroids")
      val resid = corpus.join(broadcast(cents), Seq("cent_id"))
        .select(col("vec_id"),
          zip_with(col("cv"), col("cvec"), (x, c) =>
            greatest(least(x - c, lit(QBOUND)), lit(-QBOUND))).as("cv"))
      val m = Similarity.pqModulus(resid.count())
      val (cb, codes) = Similarity.pqEncode(resid, m)
      cb.select(col("s").cast("long").as("s"), col("code_id"), col("cw"))
        .write.mode("overwrite").parquet(s"$path/pqr/codebook")
      codes.select(col("vec_id"), col("s").cast("long").as("s"), col("code_id"))
        .join(corpus.select(col("vec_id"), col("cent_id")), Seq("vec_id"))
        .repartition(col("cent_id"))
        .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/pqr/codes")
      java.lang.Boolean.TRUE
    })
    path
  }

  val annIvfpqResidual: Q = (s, d) => {
    val path = ensureIvfxPqResIndex(s, d)
    val cents = s.read.schema(Similarity.ivfxCentSchema)
      .parquet(s"$path/centroids")
    val qs = Tables.embeddings(s, d).filter(col("vec_id") < Similarity.NQUERIES)
      .select(col("vec_id").as("query_id"),
        Expr.quantVec(col("embedding")).as("qv"))
    // unlike the raw head, cdot stays in the probe frame: it IS the
    // score's coarse term, not just a routing criterion
    val probes = TopK.topKPerGroup(
        qs.crossJoin(broadcast(cents))
          .select(col("query_id"), col("cent_id"),
            Expr.longDot(col("qv"), col("cvec")).as("cdot")),
        Seq("query_id"), Seq(("cdot", true), ("cent_id", false)),
        Similarity.IVFX_NPROBE)
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    val codes = Similarity.partitionedFrame(s, s"$path/pqr/codes", pqCodesSchema)
      .filter(col("cent_id").isin(probedCells: _*))
    val cb = s.read.schema(pqCbSchema).parquet(s"$path/pqr/codebook")
    val lut = querySubvectors(s, d).join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code_id"),
        Expr.longDot(col("qsv"), col("cw")).as("qdot"))
    // cdot is functionally determined by (query_id, vec_id) — a vector
    // lives in exactly one cell — so carrying it through the grouping
    // key keeps the ADC sum map-side-combinable with no second join
    val scored = codes.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(lut), Seq("query_id", "s", "code_id"))
      .groupBy(col("query_id"), col("vec_id"), col("cdot"))
      .agg(sum(col("qdot")).as("rdot"))
      .select(col("query_id"), col("vec_id"),
        (col("cdot") + col("rdot")).as("score"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("score", true), ("vec_id", false)), Similarity.TOPK)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The residual IVFADC recomputed in SQL: the shared exact-IVF
    * assignment CTEs, residuals clamped against the assigned centroid,
    * residual codebooks/codes under the pqEncode discipline, and the
    * coarse-plus-fine score cdot + Σ qdot.
    */
  val annIvfpqResidualSql: String = {
    import Similarity.{PQ_M, PQ_SUBD, PQ_KMAX, IVFX_NPROBE, NQUERIES, TOPK}
    s"""WITH ${Similarity.ivfxAssignCtes},
       |rsd AS (SELECT a.vec_id,
       |    [greatest(least(a.cv[i] - c.cvec[i], $QBOUND), -$QBOUND)
       |      FOR i IN range(1, len(a.cv) + 1)] AS rv
       |  FROM assigned a JOIN cents c USING (cent_id)),
       |pmm AS (SELECT greatest(1, count(*) // least($PQ_KMAX, greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |rsub AS (SELECT vec_id, s, rv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS sv
       |  FROM rsd CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s)),
       |rcb AS (SELECT r.s, r.vec_id AS code_id, r.sv AS cw
       |  FROM rsub r, pmm
       |  WHERE CAST(concat('0x', substr(md5(CAST(r.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % m = 0),
       |enc0 AS (SELECT rsub.vec_id, rsub.s, rcb.code_id,
       |    CAST(list_sum([rcb.cw[j]*rcb.cw[j] - 2*rsub.sv[j]*rcb.cw[j]
       |      FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS cost
       |  FROM rsub JOIN rcb ON rcb.s = rsub.s),
       |codes AS (
       |  -- streaming argmin (lexicographic [cost, code_id] min), NOT a
       |  -- row_number window: the window form materializes+sorts
       |  -- |corpus|x8x256 rows and spills >76GB in DuckDB at the 100x
       |  -- corpus; the grouped min streams in |corpus|x8 group state
       |  SELECT vec_id, s, CAST(min([cost, code_id])[2] AS BIGINT) AS code_id
       |  FROM enc0 GROUP BY vec_id, s),
       |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < $NQUERIES),
       |pd AS (SELECT q.query_id, c.cent_id,
       |    CAST(list_sum([q.qv[i] * c.cvec[i] FOR i IN range(1, len(q.qv) + 1)]) AS BIGINT) AS cdot
       |  FROM q CROSS JOIN cents c),
       |probes AS (SELECT query_id, cent_id, cdot FROM (
       |    SELECT query_id, cent_id, cdot,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
       |    FROM pd) t WHERE rn <= $IVFX_NPROBE),
       |qsub AS (SELECT vec_id AS query_id, s, cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS qsv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s) WHERE vec_id < $NQUERIES),
       |lut AS (SELECT qsub.query_id, rcb.s, rcb.code_id,
       |    CAST(list_sum([qsub.qsv[j]*rcb.cw[j] FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS qdot
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
       |  FROM sc) t WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin
  }

  // a stale PQ layer over a rebuilt assignment would serve codes
  // against the wrong cells — drop the write-once records whenever the
  // base index's memo is invalidated (in-process corpus rewrites)
  Similarity.onClearTrainedState { () =>
    builtPq.clear(); builtPqr.clear(); trainedPqState.clear()
  }

  val queries: Map[String, Q] = Map(
    "ann_ivfpq_exact" -> annIvfpqExact,
    "ann_ivfpq_residual" -> annIvfpqResidual,
    "ann_pq_trained" -> annPqTrained,
    "eval_retrieval_ivfpq" -> evalRetrievalIvfpq)

  val oracles: Map[String, String] = Map(
    "ann_ivfpq_exact" -> annIvfpqExactSql,
    "ann_ivfpq_residual" -> annIvfpqResidualSql,
    "ann_pq_trained" -> annPqTrainedSql,
    "eval_retrieval_ivfpq" -> evalRetrievalIvfpqSql)
}
