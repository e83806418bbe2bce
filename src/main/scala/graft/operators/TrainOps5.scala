package graft.operators

import graft.Tables
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C training-data pipeline, part 5: retrieval and span-level corpus
  * cleaning — BM25 ranked retrieval over a query set (the IR primitive
  * behind decontamination-by-retrieval and targeted curation), and
  * C4-style duplicated-passage removal (non-overlapping token windows,
  * first occurrence wins corpus-wide).
  */
object TrainOps5 {
  type Q = (SparkSession, String) => DataFrame

  private def toksOf(c: Column): Column =
    filter(split(coalesce(c, lit("")), " "), x => x =!= lit(""))

  // --- bm25_retrieval: BM25 top-5 docs per query ----------------------
  // Okapi BM25 (k1=1.2, b=0.75) over a static query set. Dataflow is
  // sized by the MATCHED tokens, not the corpus: dl (doc length) is a
  // per-row projection, N and total-token count are one scalar
  // aggregate, and the token stream is filtered against the broadcast
  // term set BEFORE any shuffle — no corpus-wide inverted index is
  // materialized (at 100 TB the tf/df shuffles carry only rows whose
  // token appears in some query). Per-term weights are computed in
  // DOUBLE with an identical operation sequence in both engines, then
  // snapped (floor(w*1e6+0.5), SURVEY §6) to integer micros BEFORE the
  // per-(query,doc) sum — integer summation is order-free, so the
  // score is bit-stable under any partitioning. Top-5 per query runs
  // through the bounded-heap TopKPerGroup physical operator
  // (≤5 rows per query cross the final shuffle).
  val BM25_QUERIES: Seq[(Long, String)] = Seq(
    1L -> "data query plan",
    2L -> "window merge batch",
    3L -> "slow scan filter",
    4L -> "customer order line",
    5L -> "stream join state",
    6L -> "hash group sort")
  private[graft] val BM25_K1 = "1.2"
  private[graft] val BM25_B = "0.75"

  /** The scored (query_id, doc_id, score_micros, n_terms_hit, dl)
    * frame both retrieval heads share — everything up to (but not
    * including) the per-query top-k.
    */
  private def bm25Pairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val qterms = BM25_QUERIES.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    val terms = qterms.select(col("term")).distinct()
    // tf per (doc, matched term); dl rides the explode so no second
    // corpus join is needed to recover it.
    // cached: tf feeds both the document-frequency aggregate and the
    // scoring join — uncached, each consumer re-tokenized the corpus
    // (the scan+explode is the whole cost; tf itself is bounded by
    // docs × matched query terms)
    val tf = graft.Caches.cached(docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .join(broadcast(terms), col("token") === col("term"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl")))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // Identical IEEE operation sequence as the DuckDB oracle text:
    // idf = ln(1.0 + (N - df + 0.5) / (df + 0.5))
    // w   = idf * ((tf * (k1+1)) / (tf + (k1 * ((1.0 - b) + ((b * dl) / avgdl)))))
    val scored = tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("t_tokens").cast("double") / col("n_docs"))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w", col("idf") * ((col("tf") * expr(s"($BM25_K1 + 1.0)")) /
        (col("tf") + (expr(BM25_K1) * ((lit(1.0) - expr(BM25_B)) +
          ((expr(BM25_B) * col("dl")) / col("avgdl")))))))
      .withColumn("w_micros", floor(col("w") * 1e6 + 0.5).cast("long"))
    scored
      .join(broadcast(qterms), col("token") === col("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micros")).as("score_micros"),
        count(lit(1)).cast("long").as("n_terms_hit"),
        max(col("dl")).as("dl"))
  }

  val bm25Retrieval: Q = (s, d) => {
    val pairs = bm25Pairs(s, d)
    TopK.topKPerGroup(pairs, Seq("query_id"),
        Seq(("score_micros", true), ("doc_id", false)), 5)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_micros").desc, col("doc_id"))).cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micros"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --- rag_context_pack: budgeted context assembly ---------------------
  // The serving stage after retrieval: for each query, take the top-16
  // BM25 candidates and include them in rank order while the running
  // token total stays within a 512-token context budget (greedy prefix
  // — the standard RAG context-window assembly rule). Excluded
  // candidates stay in the report with included=false so the cut line
  // is visible. Scale: the candidate set is TopKPerGroup-bounded
  // BEFORE the running-sum window, so the per-query window sorts ≤16
  // rows no matter how many documents matched — the window never sees
  // corpus-sized partitions. All-integer (score micros + token
  // counts), hash-gated.
  private[graft] val RAG_CAND = 16
  private[graft] val RAG_BUDGET = 512L

  val ragContextPack: Q = (s, d) => {
    val cand = TopK.topKPerGroup(bm25Pairs(s, d), Seq("query_id"),
      Seq(("score_micros", true), ("doc_id", false)), RAG_CAND)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micros").desc, col("doc_id"))
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_tokens", sum(col("dl")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("included", col("cum_tokens") <= RAG_BUDGET)
      .select(col("query_id"), col("rank"), col("doc_id"), col("dl"),
        col("cum_tokens"), col("included"))
      .orderBy(col("query_id"), col("rank"))
  }

  val ragContextPackSql: String =
    s"""WITH queries(query_id, qtext) AS (VALUES $bm25QueryValues),
       |qterms AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |                  unnest(string_split(qtext, ' ')) AS term FROM queries),
       |terms AS (SELECT DISTINCT term FROM qterms),
       |docs AS (SELECT doc_id,
       |  list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |dld AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS t_tokens FROM dld),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dld) t
       |  JOIN terms ON token = term
       |  GROUP BY doc_id, token),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
       |scored AS (SELECT tf.doc_id, tf.token, tf.dl,
       |    CAST(floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |      ((tf * ($BM25_K1 + 1.0)) / (tf + ($BM25_K1 * ((1.0 - $BM25_B) +
       |        (($BM25_B * dl) / (CAST(t_tokens AS DOUBLE) / n_docs))))))) * 1e6 + 0.5) AS BIGINT) AS w_micros
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
       |  FROM ranked WHERE rank <= $RAG_CAND)
       |SELECT query_id, rank, doc_id, dl, cum_tokens,
       |       cum_tokens <= $RAG_BUDGET AS included
       |FROM packed ORDER BY query_id, rank""".stripMargin

  // --- bm25_index: the persisted write-once inverted index ------------
  // bm25_retrieval deliberately avoids materializing an inverted index
  // (right for one-shot scoring); a SERVING deployment builds the index
  // once and answers many query sets against it. The postings table
  // (token, doc_id, tf, dl) is written PARTITIONED BY an md5-derived
  // 64-way token bucket — the distributed analog of inverted-list
  // seeks: a query set touches only the partitions its terms hash to
  // (STATIC partition pruning; the probe bucket set is computed
  // driver-side from the literal terms, so the directories are
  // eliminated at plan time, before any IO — asserted in
  // TrainOps5Spec). Corpus stats (N, total tokens) persist beside the
  // postings so a serving process needs no corpus pass at all. Same
  // write-once discipline as ann_ivf_index: repartition(bucket) before
  // partitionBy bounds the layout at one file per bucket; builds are
  // memoized per path+process. Scores are identical to bm25_retrieval
  // by construction, so the SAME DuckDB oracle gates the whole
  // build→persist→prune→score path.
  private[graft] val BM25_BUCKETS = 64

  private def tokenBucket(c: Column): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(BM25_BUCKETS.toLong))

  /** Driver-side mirror of [[tokenBucket]] for the literal query terms
    * (15 hex chars = 60 bits, fits a long; parity spec-asserted).
    */
  private[graft] def tokenBucketLocal(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    math.floorMod(java.lang.Long.parseLong(hex.substring(0, 15), 16), BM25_BUCKETS.toLong)
  }

  // --- index commit protocol -------------------------------------------
  // Postings land as immutable per-batch DELTA directories (delta_v0 =
  // the build, delta_vN = append N), each partitioned by the 64-way
  // token bucket, and a batch becomes VISIBLE only when its cumulative
  // stats directory (stats_vN) commits — readers resolve the newest
  // stats_vN whose _SUCCESS marker exists and read exactly
  // delta_v0..vN (or a committed compact_vK plus the deltas after K —
  // see compactBm25Index). The cumulative TERM DICTIONARY df_vN (df
  // per token across all committed batches) is written between the
  // delta and the stats commit, so every committed version carries its
  // dictionary — serving-path readers (queryBm25Index,
  // Streaming.bm25GateBatch) probe the vocab-sized dictionary instead
  // of re-aggregating the index-sized postings. Serve therefore
  // observes a committed prefix of batches: entirely pre-append or
  // entirely post-append, never new postings scored with old N/avgdl
  // or a mixed dictionary. A failure between the delta write and the
  // stats write leaves orphan delta/df dirs that readers ignore;
  // retrying the append overwrites them (writes are idempotent per
  // version). All listings go through the Hadoop FileSystem API, so
  // the protocol works unchanged on file:/hdfs:/s3a: paths — the
  // stats marker is the single atomic commit point.
  //
  // SINGLE-WRITER CONTRACT: one appendBm25Index (or compactBm25Index)
  // at a time per index path. Two concurrent appenders would both read
  // committedVersion = v and both write version v+1 (delta writes are
  // overwrite-mode for orphan-retry idempotence), committing stats
  // inconsistent with the delta contents. Readers are unrestricted and
  // lock-free; writers must be serialized by the ingest pipeline (the
  // usual posture: one ingest job owns an index). TrainOps5Spec
  // interleaves append and serve to assert the fully-old-or-fully-new
  // reader guarantee.

  private val postingsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, token STRING, tf BIGINT, dl BIGINT, bucket BIGINT")
  private val statsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "n_docs BIGINT, t_tokens BIGINT")
  private val dfSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "token STRING, df BIGINT, bucket BIGINT")

  /** The index root's FileSystem + Path — resolved through Hadoop so
    * the protocol's listings/deletes run identically on local, HDFS,
    * and object-store URIs (the parquet writes already do).
    */
  private def indexFs(path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    (p.getFileSystem(conf), p)
  }

  /** Newest batch version whose stats directory committed (_SUCCESS is
    * written last by the parquet commit protocol, so a half-written
    * stats dir is invisible).
    */
  private[graft] def committedVersion(path: String): Option[Int] = {
    val (fs, root) = indexFs(path)
    if (!fs.exists(root)) return None
    val vs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("stats_v\\d+")
        && !IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("stats_v").toInt)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(root, s"stats_v$v/_SUCCESS")))
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Newest committed compaction at or below version v (compact_vK's
    * own parquet _SUCCESS is its commit marker): readers substitute it
    * for delta_v0..K.
    */
  private[graft] def committedCompact(path: String, v: Int): Option[Int] = {
    val (fs, root) = indexFs(path)
    if (!fs.exists(root)) return None
    val ks = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("compact_v\\d+")
        && !IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("compact_v").toInt)
      .filter(k => k <= v &&
        fs.exists(new org.apache.hadoop.fs.Path(root, s"compact_v$k/_SUCCESS")))
    if (ks.isEmpty) None else Some(ks.max)
  }

  private def readDeltas(s: SparkSession, path: String, v: Int): DataFrame = {
    val roots = committedCompact(path, v) match {
      case Some(k) => s"$path/compact_v$k" +: (k + 1 to v).map(i => s"$path/delta_v$i")
      case None    => (0 to v).map(i => s"$path/delta_v$i")
    }
    roots.map(r => s.read.schema(postingsSchema).parquet(r))
      .reduce(_ unionByName _)
  }

  /** One batch's postings → its immutable delta directory. Postings
    * are per-(doc_id, token) aggregates, so a batch's rows are exactly
    * the rows a full rebuild would produce for those docs — PROVIDED
    * batches partition documents (enforceable via checkDisjoint).
    */
  private[graft] def writeDelta(docs0: DataFrame, deltaPath: String): (Long, Long) = {
    val docs = docs0
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val a = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("t")).collect()(0)
    val postings = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("bucket", tokenBucket(col("token")))
    // token-sorted within each bucket file: parquet row-group min/max
    // stats become tight on token, so a serving probe's pushed
    // token-IN filter skips row groups instead of decoding the bucket.
    // bucket leads the sort so the partitioned writer's required
    // ordering is already satisfied and no order-destroying re-sort is
    // inserted above it.
    postings.repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("token"))
      .write.mode("overwrite").partitionBy("bucket").parquet(deltaPath)
    (a.getLong(0), if (a.isNullAt(1)) 0L else a.getLong(1))
  }

  /** Cumulative term dictionary for version v: document frequency of
    * every index token across batches 0..v. Postings are per
    * (doc_id, token) and batches partition documents, so df is ADDITIVE
    * across batches: version v's dictionary = version v-1's plus the
    * new delta's per-token row counts — an append pays one batch-sized
    * aggregation plus one vocab-sized merge, never an index-sized scan.
    * Bucket-partitioned like the postings so literal term probes prune
    * directories. Written after the delta and BEFORE the stats commit,
    * so every committed version has its dictionary.
    */
  private[graft] def writeDf(s: SparkSession, path: String, v: Int): Unit = {
    val batch = s.read.schema(postingsSchema).parquet(s"$path/delta_v$v")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val cum =
      if (v == 0) batch
      else s.read.schema(dfSchema).parquet(s"$path/df_v${v - 1}")
        .select(col("token"), col("df"))
        .unionByName(batch)
        .groupBy(col("token")).agg(sum(col("df")).as("df"))
    cum.withColumn("bucket", tokenBucket(col("token")))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/df_v$v")
  }

  /** Commit point: cumulative stats for version v. The cumulative
    * ingest-epoch ledger rides INSIDE the stats row (an `epochs`
    * column), so the parquet _SUCCESS that commits the version is the
    * single atomic point covering stats AND ledger — there is no
    * window where a version is committed but its ledger is not, and a
    * crashed writer can never leave a truncated ledger file (the old
    * side-file design had both failure modes).
    */
  private[graft] def writeStats(s: SparkSession, path: String, v: Int,
      nDocs: Long, tTokens: Long, epochs: Seq[Long] = Nil): Unit = {
    import s.implicits._
    Seq((nDocs, tTokens, epochs.distinct.sorted))
      .toDF("n_docs", "t_tokens", "epochs")
      .write.mode("overwrite").parquet(s"$path/stats_v$v")
  }

  /** Stats schema with the ledger column; a legacy stats file that
    * predates the column reads as NULL under this schema (Spark fills
    * requested-but-absent parquet columns with null).
    */
  private val statsLedgerSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "n_docs BIGINT, t_tokens BIGINT, epochs ARRAY<BIGINT>")

  /** Every ingest epoch the committed chain has ever absorbed.
    * Resolution order per stats version: the in-commit `epochs` column
    * (authoritative — atomic with the version), else the legacy
    * side-file `_EPOCHS` (validated line-by-line; a torn write fails
    * LOUDLY instead of silently re-opening the history). The newest
    * committed version is read first; if it carries no ledger in
    * either form (a legacy non-streaming append landed on top of a
    * streamed chain), the walk falls back to the highest EARLIER
    * stats version that has one — stats_v{v-1} still holds the full
    * history until compaction retires it. Per-version `_EPOCH_<id>`
    * markers (post-commit annotations) are unioned in from every
    * still-live stats dir as a belt-and-braces floor.
    */
  private[graft] def committedEpochs(s: SparkSession, path: String): Set[Long] = {
    val (fs, root) = indexFs(path)
    val newest = committedVersion(path).getOrElse(return Set.empty)
    def statsDir(v: Int) = new org.apache.hadoop.fs.Path(root, s"stats_v$v")
    def ledgerOf(v: Int): Option[Set[Long]] = {
      val row = s.read.schema(statsLedgerSchema)
        .parquet(s"$path/stats_v$v").select(col("epochs")).collect()(0)
      if (!row.isNullAt(0))
        return Some(row.getSeq[Long](0).toSet)
      val legacy = new org.apache.hadoop.fs.Path(statsDir(v), "_EPOCHS")
      if (!fs.exists(legacy)) return None
      val in = fs.open(legacy)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
        finally in.close()
      val ids = lines.filter(_.nonEmpty)
      val bad = ids.filterNot(_.matches("\\d{1,18}"))
      if (bad.nonEmpty) throw new IllegalStateException(
        s"corrupt epoch ledger $legacy: non-numeric line(s) " +
          s"${bad.take(3).mkString("'", "', '", "'")} — a torn write; " +
          "rebuild the ledger from the _EPOCH_ markers before ingesting")
      Some(ids.map(_.toLong).toSet)
    }
    val liveVersions = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("stats_v\\d+")
        && !IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("stats_v").toInt)
      .filter(_ <= newest).sorted.reverse
    val ledger = liveVersions.iterator.flatMap(ledgerOf).take(1).toSeq
      .headOption.getOrElse(Set.empty[Long])
    val markers = liveVersions.flatMap { v =>
      fs.listStatus(statsDir(v)).map(_.getPath.getName).collect {
        case n if n.startsWith("_EPOCH_") && n.stripPrefix("_EPOCH_").matches("\\d{1,18}") =>
          n.stripPrefix("_EPOCH_").toLong
      }
    }
    ledger ++ markers
  }

  /** The directory names this protocol owns at an index root. */
  private def isProtocolEntry(name: String): Boolean =
    name.matches("(delta|stats|df|compact)_v\\d+")

  /** Clear an index root for a rebuild — but ONLY if everything inside
    * is protocol-owned (delta_vN, stats_vN, df_vN, compact_vN). A build
    * pointed at the wrong directory (a dataset dir, a home dir) must
    * refuse loudly instead of silently destroying unrelated data.
    */
  private[graft] def clearIndexRoot(path: String): Unit = {
    val (fs, root) = indexFs(path)
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root)
    val foreign = entries.map(_.getPath.getName).filterNot(isProtocolEntry)
    require(foreign.isEmpty,
      s"buildBm25Index: refusing to clear $path — it contains non-index " +
        s"entries ${foreign.take(5).mkString(", ")}; builds only replace " +
        "directories that hold nothing but delta_v*/stats_v*/df_v*/compact_v*")
    entries.foreach(st => fs.delete(st.getPath, true))
  }

  /** Build + persist postings, term dictionary, and stats as version 0;
    * returns (n_docs, t_tokens). A build REPLACES any prior index at
    * the path (old versions are cleared so stale ones cannot shadow the
    * new corpus); the clear refuses directories holding anything the
    * protocol does not own.
    */
  def buildBm25Index(docs0: DataFrame, path: String,
      epochs: Seq[Long] = Nil): (Long, Long) = {
    clearIndexRoot(path)
    val s = docs0.sparkSession
    val (nDocs, tTokens) = writeDelta(docs0, s"$path/delta_v0")
    writeDf(s, path, 0)
    writeStats(s, path, 0, nDocs, tTokens, epochs)
    (nDocs, tTokens)
  }

  /** One committed version's worth of index state: postings, corpus
    * stats, and the term dictionary — all three resolved at the SAME
    * version, so a reader can never mix pre- and post-append state.
    */
  final case class Bm25View(
      postings: DataFrame, stats: DataFrame, dfreq: DataFrame, version: Int)

  /** Open the committed version of a persisted index — the serving
    * face other operators compose over (stream_bm25_gate scores an
    * ingest stream against it). One schema-explicit read PER delta
    * root (each root carries its own bucket partition layout; a
    * multi-root read would need a shared basePath and lose per-root
    * pruning), unioned — a bucket probe filter pushes into every
    * delta's scan as a static PartitionFilter. The version is resolved
    * ONCE for postings + stats + dictionary.
    */
  def openBm25View(s: SparkSession, path: String): Bm25View = {
    val v = committedVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed bm25 index at $path"))
    Bm25View(
      readDeltas(s, path, v),
      s.read.schema(statsSchema).parquet(s"$path/stats_v$v"),
      s.read.schema(dfSchema).parquet(s"$path/df_v$v"),
      v)
  }

  /** Back-compat two-frame face. */
  def openBm25Index(s: SparkSession, path: String): (DataFrame, DataFrame) = {
    val view = openBm25View(s, path)
    (view.postings, view.stats)
  }

  /** Memoized build over `docs` at `path` (write-once per path+process;
    * released by clearIndexState — ScaleData's in-place corpus rewrite
    * hooks and Bench's per-query isolation block both call it).
    */
  def ensureBm25Index(docs: => DataFrame, path: String): Unit =
    builtBm25.computeIfAbsent(path, _ => buildBm25Index(docs, path))

  /** Serve the static query set against a persisted index: reads the
    * newest COMMITTED version's stats plus its delta prefix.
    */
  def queryBm25Index(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    val view = openBm25View(s, path)
    val (postings, stats) = (view.postings, view.stats)
    val qterms = BM25_QUERIES.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
    val terms = BM25_QUERIES.flatMap(_._2.split(" ")).distinct
    val buckets = terms.map(tokenBucketLocal).distinct
    // bucket ∈ literals lands in PartitionFilters (directory-level
    // elimination at plan time); token ∈ literals is the row filter
    // inside the surviving buckets.
    val tf = postings
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
      .select(col("doc_id"), col("token"), col("tf"), col("dl"))
    // df comes from the persisted dictionary (same bucket pruning), not
    // a re-aggregation of the postings — identical values by protocol
    // (the dictionary is the per-token posting-row count at the same
    // committed version).
    val dfreq = view.dfreq
      .filter(col("bucket").isin(buckets: _*) && col("token").isin(terms: _*))
      .select(col("token"), col("df"))
    val scored = tf
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("t_tokens").cast("double") / col("n_docs"))
      .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w", col("idf") * ((col("tf") * expr(s"($BM25_K1 + 1.0)")) /
        (col("tf") + (expr(BM25_K1) * ((lit(1.0) - expr(BM25_B)) +
          ((expr(BM25_B) * col("dl")) / col("avgdl")))))))
      .withColumn("w_micros", floor(col("w") * 1e6 + 0.5).cast("long"))
    val pairs = scored
      .join(broadcast(qterms), col("token") === col("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_micros")).as("score_micros"),
        count(lit(1)).cast("long").as("n_terms_hit"))
    TopK.topKPerGroup(pairs, Seq("query_id"),
        Seq(("score_micros", true), ("doc_id", false)), 5)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_micros").desc, col("doc_id"))).cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micros"), col("n_terms_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Incremental maintenance: append a NEW batch of documents to an
    * existing index. Postings are per (doc_id, token) aggregates and a
    * document lives in exactly one batch, so batch-local tf/dl rows
    * are EXACTLY the rows a full rebuild would produce — the append is
    * lossless by construction (gated below). The batch lands as the
    * next delta version under the same bucket partitioning (serve-side
    * pruning is unchanged); the cumulative stats write is the commit
    * point (see the protocol note above), with the authoritative
    * previous totals read from the persisted stats, not caller state.
    * At 100 TB this is the difference between re-tokenizing the corpus
    * per ingest and paying only for the new batch.
    *
    * CALLER CONTRACT: batches must partition documents — a doc_id
    * re-ingested in a later batch would double-count tf/df/stats.
    * `checkDisjoint = true` enforces it with a left-semi probe of the
    * incoming ids against the committed postings (one index-sized
    * distinct + a broadcast-able batch side; opt-in because the scan
    * is a real job at scale, and ingest pipelines that already key
    * batches by arrival partition don't need to re-pay it).
    */
  def appendBm25Index(newDocs: DataFrame, path: String,
      checkDisjoint: Boolean = false, epochs: Seq[Long] = Nil): (Long, Long) = {
    val s = newDocs.sparkSession
    val v = committedVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed bm25 index at $path"))
    if (checkDisjoint) {
      val existing = readDeltas(s, path, v).select(col("doc_id")).distinct()
      val overlap = newDocs.select(col("doc_id")).distinct()
        .join(existing, Seq("doc_id"), "left_semi").limit(1).count()
      require(overlap == 0L,
        s"appendBm25Index: batch re-ingests doc_ids already indexed at $path " +
          "(postings are per-(doc,token) aggregates and would double-count); " +
          "batches must partition documents")
    }
    val prev = s.read.schema(statsSchema).parquet(s"$path/stats_v$v").collect()(0)
    // carry the ingest-epoch ledger forward on EVERY append (streamed
    // or not), so a non-streaming append on top of a streamed chain
    // can never orphan the history the next trigger dedups against
    val carried = committedEpochs(s, path)
    val (bDocs, bTokens) = writeDelta(newDocs, s"$path/delta_v${v + 1}")
    writeDf(s, path, v + 1)
    val nd = (prev.getLong(0) + bDocs, prev.getLong(1) + bTokens)
    writeStats(s, path, v + 1, nd._1, nd._2, (carried ++ epochs).toSeq)
    nd
  }

  /** Compact the committed delta chain into one consolidated postings
    * root. Serve cost over a long-ingested index grows with the number
    * of delta roots (one directory listing + scan union per batch);
    * compaction rewrites delta_v0..v (or the previous compact plus its
    * trailing deltas) into compact_v{v} — same bucket partitioning,
    * back to ONE file per bucket — and retires the subsumed roots.
    * Atomicity rides the existing protocol: compact_v's own parquet
    * _SUCCESS is its commit marker, readers resolving version v pick
    * the newest committed compact ≤ v, and stats/df are untouched (the
    * compacted rows are a pure reshuffle of the same postings), so
    * serve output is IDENTICAL before and after — TrainOps5Spec
    * asserts the equality. Same single-writer contract as append.
    *
    * Subsumed roots: with `retireGraceMs == 0` they are deleted as
    * soon as the compact commits (single-reader / test posture). A
    * deployment with long-running concurrent readers passes a grace
    * period instead — subsumed roots are then only MARKED retired
    * (IndexMaintenance.retire; readers resolving the current version
    * never touch them, but a reader that resolved its roots before
    * the compact landed can finish its scan) and a later
    * vacuumBm25Index pass deletes them once the marker has aged past
    * the grace period.
    */
  def compactBm25Index(s: SparkSession, path: String,
      retireGraceMs: Long = 0L): Unit = {
    val v = committedVersion(path).getOrElse(
      throw new IllegalStateException(s"no committed bm25 index at $path"))
    val priorCompact = committedCompact(path, v)
    if (priorCompact.contains(v)) return // already compacted at v
    readDeltas(s, path, v)
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("token"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/compact_v$v")
    val (fs, root) = indexFs(path)
    def sub(n: String) = new org.apache.hadoop.fs.Path(root, n)
    val first = priorCompact.map(_ + 1).getOrElse(0)
    (first to v).foreach { i =>
      IndexMaintenance.retireOrDelete(fs, sub(s"delta_v$i"), retireGraceMs)
    }
    priorCompact.foreach { k =>
      IndexMaintenance.retireOrDelete(fs, sub(s"compact_v$k"), retireGraceMs)
    }
    // superseded dictionary/stats versions are dead weight too: readers
    // resolve only the newest committed version, and the df chain needs
    // only df_v{v} for the next append — retire everything below v
    // (64 files per df version on a long chain is most of the index's
    // file count after the deltas are gone)
    fs.listStatus(root)
      .map(_.getPath.getName)
      .collect {
        case n if n.matches("df_v\\d+") && n.stripPrefix("df_v").toInt < v    => n
        case n if n.matches("stats_v\\d+") && n.stripPrefix("stats_v").toInt < v => n
      }
      .foreach(n => IndexMaintenance.retireOrDelete(fs, sub(n), retireGraceMs))
  }

  /** Delete retired index roots whose grace period has elapsed (see
    * compactBm25Index); returns the deleted directory names. Run it on
    * the maintenance cadence with graceMs ≥ the deployment's longest
    * query — everything it deletes has been invisible to version
    * resolution since its compact committed.
    */
  def vacuumBm25Index(path: String, graceMs: Long): Seq[String] = {
    val (fs, root) = indexFs(path)
    IndexMaintenance.vacuum(fs, root, graceMs)
  }

  /** bm25_index_incr: the maintenance path under the SAME oracle —
    * build the index from the doc_id % 7 <> 3 slice, APPEND the
    * held-out batch, serve. Output must equal a fresh whole-corpus
    * retrieval bit-for-bit, which is exactly what the shared DuckDB
    * oracle asserts: incremental maintenance is lossless.
    */
  val bm25IndexIncr: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_bm25i_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    builtBm25.computeIfAbsent(path, { _ =>
      buildBm25Index(
        Tables.documents(s, d).filter(col("doc_id") % 7 =!= 3), path)
      appendBm25Index(
        Tables.documents(s, d).filter(col("doc_id") % 7 === 3), path,
        checkDisjoint = true)
    })
    queryBm25Index(s, path)
  }

  /** bm25_index_compact: the full index lifecycle under the SAME
    * oracle — build on the doc_id % 7 <> 3 slice, append the held-out
    * batch, COMPACT the two-delta chain under a retirement grace
    * period, vacuum the aged-out roots, serve. The serve must equal a
    * fresh whole-corpus retrieval bit-for-bit (shared oracle with
    * bm25_retrieval): compaction and vacuum are lossless REWRITES, and
    * this puts that claim under the gated battery — DuckDB recomputes
    * the retrieval from the raw corpus, so any row the rewrite
    * drops/duplicates/re-scores fails the hash gate, not just a spec.
    */
  val bm25IndexCompact: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_bm25c_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    builtBm25.computeIfAbsent(path, { _ =>
      buildBm25Index(
        Tables.documents(s, d).filter(col("doc_id") % 7 =!= 3), path)
      val nd = appendBm25Index(
        Tables.documents(s, d).filter(col("doc_id") % 7 === 3), path,
        checkDisjoint = true)
      // grace-marked retirement, then a vacuum pass after the (1 ms)
      // grace has elapsed — the deployment sequence, compressed in
      // time; the serve below is correct whether or not the vacuum
      // deleted (retired roots are invisible to version resolution)
      compactBm25Index(s, path, retireGraceMs = 1L)
      Thread.sleep(5)
      vacuumBm25Index(path, 0L)
      nd
    })
    queryBm25Index(s, path)
  }

  /** Session-memoized builds (write-once semantics in a query fn). */
  private val builtBm25 =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Invalidation hooks run by clearIndexState — downstream caches
    * keyed by index path/version (Streaming's gate dictionary cache)
    * register here so an in-place corpus rewrite drops them too.
    */
  private val invalidationHooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
  def onClearIndexState(hook: () => Unit): Unit = invalidationHooks.add(hook)

  /** Drop memoized index records (mirrors Similarity.clearTrainedState;
    * called by ScaleData writers that overwrite a corpus in place).
    */
  def clearIndexState(): Unit = {
    builtBm25.clear()
    invalidationHooks.forEach(h => h())
  }

  val bm25Index: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_bm25_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    builtBm25.computeIfAbsent(path,
      _ => buildBm25Index(Tables.documents(s, d), path))
    queryBm25Index(s, path)
  }

  private def bm25QueryValues: String =
    BM25_QUERIES.map { case (id, t) => s"($id, '$t')" }.mkString(", ")

  val bm25RetrievalSql: String =
    s"""WITH queries(query_id, qtext) AS (VALUES $bm25QueryValues),
       |qterms AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |                  unnest(string_split(qtext, ' ')) AS term FROM queries),
       |terms AS (SELECT DISTINCT term FROM qterms),
       |docs AS (SELECT doc_id,
       |  list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |dld AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(dl) AS BIGINT) AS t_tokens FROM dld),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM (SELECT doc_id, dl, unnest(toks) AS token FROM dld) t
       |  JOIN terms ON token = term
       |  GROUP BY doc_id, token),
       |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
       |scored AS (SELECT tf.doc_id, tf.token,
       |    CAST(floor((ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
       |      ((tf * ($BM25_K1 + 1.0)) / (tf + ($BM25_K1 * ((1.0 - $BM25_B) +
       |        (($BM25_B * dl) / (CAST(t_tokens AS DOUBLE) / n_docs))))))) * 1e6 + 0.5) AS BIGINT) AS w_micros
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

  // --- dedup_paragraph: C4-style duplicated-window removal ------------
  // Span-LEVEL corpus cleaning with removal semantics (C4's
  // three-sentence dedup re-expressed over flat word streams):
  // each document is cut into NON-overlapping 10-token windows
  // (trailing partial window kept), every window that re-occurs
  // corpus-wide keeps only its lexicographically-first occurrence
  // (min (doc_id, idx)), and the per-doc report counts windows and
  // tokens removed. All-integer, hash-gated. Scale: one shuffle keyed
  // by the 128-bit md5 of the window — a FIXED 32-char key, so shuffle
  // bytes are bounded per chunk instead of carrying the raw 10-token
  // window text through the groupBy AND the join (the dedup_substring
  // hashed-gram-key discipline; md5 rather than xxhash64 so the DuckDB
  // oracle reproduces the key bit-for-bit, and 128 bits so collisions
  // stay negligible at 100-TB chunk counts where a 64-bit key would
  // hit the birthday bound). The keeper is min(struct(doc_id, idx)) —
  // an aggregation with map-side partial combine, so a viral passage
  // duplicated 1e8 times costs its count, never a single-task window
  // sort (the oracle uses row_number over the same ordering, identical
  // semantics at any size). dedup_substring reports overlapping-
  // shingle ppm; this operator makes the keep/drop DECISION per span.
  private[graft] val PARA_W = 10

  val dedupParagraph: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val chunks = base
      .filter(col("n") > 0)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, CAST(ceil(n / $PARA_W.0) AS INT) - 1),
           |  i -> struct(CAST(i AS BIGINT) AS idx,
           |              md5(array_join(slice(toks, i * $PARA_W + 1, $PARA_W), ' ')) AS ckey,
           |              CAST(size(slice(toks, i * $PARA_W + 1, $PARA_W)) AS BIGINT) AS ntok))""".stripMargin))
        .as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.ckey").as("ckey"),
        col("c.ntok").as("ntok"))
    val keepers = chunks.groupBy(col("ckey"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("k"))
      .select(col("ckey"), col("k.doc_id").as("kd"), col("k.idx").as("ki"))
    val flagged = chunks.join(keepers, "ckey")
      .withColumn("kept", col("doc_id") === col("kd") && col("idx") === col("ki"))
    val perDoc = flagged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"),
      sum(col("ntok")).as("n_tokens"),
      sum(when(col("kept"), col("ntok")).otherwise(0L)).as("tokens_kept"))
    val docsAll = base.select(col("doc_id"))
    docsAll.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .withColumn("removed_ppm",
        when(col("n_tokens") === 0L, 0L).otherwise(
          floor((col("n_tokens") - col("tokens_kept")) * 1000000L / col("n_tokens")).cast("long")))
      .orderBy(col("doc_id"))
  }

  // --- dedup_paragraph_apply: the APPLY face of C4 window dedup -------
  // dedup_paragraph reports what would be removed; this operator EMITS
  // the cleaned corpus — each doc's surviving (first-occurrence)
  // windows re-joined in order, duplicated windows dropped. The keeper
  // decision still flows through the fixed-width md5 key join; the
  // window TEXT must travel once into the per-doc reconstruction
  // aggregation, which is inherent to rewriting a corpus (shuffle is
  // sized by the output text). Per-doc collect_list state is bounded
  // by the doc's own length (the chunk_sliding class, never
  // corpus-sized); array_sort on (idx, chunk) structs makes the
  // rebuild order deterministic under any partitioning.
  val dedupParagraphApply: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val chunks = base
      .filter(col("n") > 0)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, CAST(ceil(n / $PARA_W.0) AS INT) - 1),
           |  i -> struct(CAST(i AS BIGINT) AS idx,
           |              array_join(slice(toks, i * $PARA_W + 1, $PARA_W), ' ') AS chunk,
           |              CAST(size(slice(toks, i * $PARA_W + 1, $PARA_W)) AS BIGINT) AS ntok))""".stripMargin))
        .as("c"))
      .select(col("doc_id"), col("c.idx").as("idx"), col("c.chunk").as("chunk"),
        md5(col("c.chunk")).as("ckey"), col("c.ntok").as("ntok"))
    val keepers = chunks.select(col("doc_id"), col("idx"), col("ckey"))
      .groupBy(col("ckey"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("k"))
      .select(col("ckey"), col("k.doc_id").as("kd"), col("k.idx").as("ki"))
    val kept = chunks.join(keepers, "ckey")
      .filter(col("doc_id") === col("kd") && col("idx") === col("ki"))
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      array_join(transform(array_sort(collect_list(struct(col("idx"), col("chunk")))),
        x => x.getField("chunk")), " ").as("text_clean"),
      count(lit(1)).as("n_chunks_kept"),
      sum(col("ntok")).as("n_tokens_kept"))
    base.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_chunks_kept"), lit(0L)).as("n_chunks_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
      .orderBy(col("doc_id"))
  }

  val dedupParagraphApplySql: String =
    s"""WITH base AS (SELECT doc_id,
       |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |sized AS (SELECT doc_id, toks, len(toks) AS n FROM base),
       |chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
       |    array_to_string(toks[i * $PARA_W + 1 : i * $PARA_W + $PARA_W], ' ') AS chunk,
       |    CAST(len(toks[i * $PARA_W + 1 : i * $PARA_W + $PARA_W]) AS BIGINT) AS ntok
       |  FROM sized, UNNEST(range(0, CAST(ceil(n / $PARA_W.0) AS BIGINT))) AS u(i)
       |  WHERE n > 0),
       |flagged AS (SELECT doc_id, idx, chunk, ntok,
       |    row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS occ
       |  FROM chunks),
       |rebuilt AS (SELECT doc_id,
       |    string_agg(chunk, ' ' ORDER BY idx) AS text_clean,
       |    CAST(count(*) AS BIGINT) AS n_chunks_kept,
       |    CAST(sum(ntok) AS BIGINT) AS n_tokens_kept
       |  FROM flagged WHERE occ = 1 GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(text_clean, '') AS text_clean,
       |  COALESCE(n_chunks_kept, 0) AS n_chunks_kept,
       |  COALESCE(n_tokens_kept, 0) AS n_tokens_kept
       |FROM (SELECT doc_id FROM base) d LEFT JOIN rebuilt USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val dedupParagraphSql: String =
    s"""WITH base AS (SELECT doc_id,
       |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |sized AS (SELECT doc_id, toks, len(toks) AS n FROM base),
       |chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
       |    md5(array_to_string(toks[i * $PARA_W + 1 : i * $PARA_W + $PARA_W], ' ')) AS ckey,
       |    CAST(len(toks[i * $PARA_W + 1 : i * $PARA_W + $PARA_W]) AS BIGINT) AS ntok
       |  FROM sized, UNNEST(range(0, CAST(ceil(n / $PARA_W.0) AS BIGINT))) AS u(i)
       |  WHERE n > 0),
       |flagged AS (SELECT doc_id, idx, ntok,
       |    row_number() OVER (PARTITION BY ckey ORDER BY doc_id, idx) AS occ
       |  FROM chunks),
       |per_doc AS (SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_chunks,
       |    CAST(sum(CASE WHEN occ = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
       |    CAST(sum(ntok) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN occ = 1 THEN ntok ELSE 0 END) AS BIGINT) AS tokens_kept
       |  FROM flagged GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_chunks, 0) AS n_chunks,
       |  COALESCE(n_removed, 0) AS n_removed,
       |  COALESCE(n_tokens, 0) AS n_tokens,
       |  COALESCE(tokens_kept, 0) AS tokens_kept,
       |  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0
       |       ELSE CAST(floor((n_tokens - tokens_kept) * 1000000 / n_tokens) AS BIGINT)
       |  END AS removed_ppm
       |FROM (SELECT doc_id FROM base) d LEFT JOIN per_doc USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --- text_lm_bigram: add-one-smoothed bigram LM surprisal -----------
  // The bigram upgrade of text_lm_rarity's unigram proxy: train the LM
  // on the corpus itself (bigram counts c2(w1,w2), context totals
  // c1(w1) = Σ_w2 c2, vocab size V), then score every document's mean
  // conditional surprisal nll = ln((c1 + V) / (c2 + 1)) — the
  // perplexity-style quality filter with context. Train + serve in
  // one dataflow: the bigram table derives FROM the per-doc pair
  // frame's own groupBy (Catalyst reuses the exchange), c1 is a
  // second aggregate of c2 (vocab-sized input), V is one scalar.
  // TYPE-LEVEL scoring: nll_micros is a function of (c1, c2, V) alone
  // — all bigram-TYPE-level quantities — so it is computed ONCE per
  // bigram type on the Heaps-bounded count frame (the c2⋈c1 join is
  // vocab-scale: one row per bigram type against one row per context
  // word), and the corpus-scale pair stream crosses exactly ONE join,
  // keyed (w1,w2). The alternative — joining the pair stream to c2
  // and then AGAIN to c1 on w1 alone — re-shuffles every bigram
  // occurrence by its first word, whose top key ("the") carries
  // several percent of any natural corpus; scoring per type halves
  // the corpus-stream shuffle bytes and removes that skewed stage
  // outright (plan-asserted in PlanAuditSpec). Each pair's nll is
  // snapped to integer micros BEFORE the per-doc sum (order-free);
  // the mean is integer division. At 100 TB the one remaining
  // corpus-stream join is keyed (w1,w2) — Zipf-skewed keys are
  // exactly what AQE's skew split handles, and both count tables are
  // Heaps-bounded (vocab², far below corpus scale).
  val textLmBigram: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val prs = base.filter(col("n") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, n - 1), i -> struct(element_at(toks, i) AS w1, element_at(toks, CAST(i + 1 AS INT)) AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c2 = prs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = base.select(explode(col("toks")).as("t")).agg(
      countDistinct(col("t")).as("v"))
    val typed = c2
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll_micros",
        floor(log((col("c1") + col("v")).cast("double") / (col("c2") + lit(1L))) * 1e6 + 0.5).cast("long"))
      .select(col("w1"), col("w2"), col("nll_micros"))
    val scored = prs.join(typed, Seq("w1", "w2"))
    val perDoc = scored.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("nll_micros")).as("nll_micros"))
    base.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("nll_micros"), lit(0L)).as("nll_micros"))
      .withColumn("mean_nll_micros",
        when(col("n_pairs") === 0L, 0L)
          .otherwise(expr("nll_micros DIV n_pairs")))
      .orderBy(col("doc_id"))
  }

  val textLmBigramSql: String =
    """WITH base AS (SELECT doc_id,
      |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |prs AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM base, UNNEST(range(1, len(toks))) AS u(i)
      |  WHERE len(toks) >= 2),
      |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM prs GROUP BY w1, w2),
      |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
      |vocab AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
      |  FROM (SELECT unnest(toks) AS t FROM base)),
      |typed AS (SELECT w1, w2,
      |    CAST(floor(ln(CAST(c1 + v AS DOUBLE) / (c2 + 1)) * 1e6 + 0.5) AS BIGINT) AS nll_micros
      |  FROM c2 JOIN c1 USING (w1), vocab),
      |scored AS (SELECT doc_id, nll_micros FROM prs JOIN typed USING (w1, w2)),
      |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(nll_micros) AS BIGINT) AS nll_micros
      |  FROM scored GROUP BY doc_id)
      |SELECT b.doc_id,
      |  COALESCE(n_pairs, 0) AS n_pairs,
      |  COALESCE(nll_micros, 0) AS nll_micros,
      |  CASE WHEN COALESCE(n_pairs, 0) = 0 THEN 0
      |       ELSE COALESCE(nll_micros, 0) // n_pairs END AS mean_nll_micros
      |FROM (SELECT doc_id FROM base) b LEFT JOIN per_doc USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // --- quality_classifier: frozen linear model applied at scale -------
  // The decision stage after feature extraction (the fasttext/CCNet
  // quality-filter shape): a FROZEN logistic model over four per-doc
  // features — token count, mean token length, stopword ratio,
  // distinct-token ratio — scored as sigmoid(w·x), snapped to micros,
  // thresholded at 0.5. Weights are interpolated constants shared by
  // engine, oracle, and SqlPort mirror; every feature is a per-row
  // projection (ZERO shuffles — the whole operator is one scan +
  // codegen'd projection, embarrassingly parallel at any corpus size).
  // The model is a stand-in for any trained linear head; the Spark
  // surface (broadcastable weights, one-pass scoring, integer-stable
  // output) is the real deliverable.
  private[graft] val QC_STOPWORDS = Seq("the", "a", "an", "of", "and", "to", "in", "is")
  private[graft] val QC_W: (String, String, String, String, String) =
    ("-2.0", "0.004", "0.35", "1.6", "1.2") // w0, w_ntok, w_meanlen, w_stop, w_distinct

  /** Frame-level scoring core shared by the batch key and the
    * streaming gate (stateless projection — runs unchanged on a
    * stream). Input needs (doc_id, text); emits the feature micros,
    * score and keep flag.
    */
  def scoreQuality(docs: DataFrame): DataFrame = {
    val (w0, w1, w2, w3, w4) = QC_W
    val sw = QC_STOPWORDS.map(w => s"'$w'").mkString(", ")
    docs
      .select(col("doc_id"), toksOf(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("mean_len", when(col("n_tokens") === 0L, lit(0.0)).otherwise(
        expr("CAST(aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS DOUBLE)") / col("n_tokens")))
      .withColumn("stop_ratio", when(col("n_tokens") === 0L, lit(0.0)).otherwise(
        expr(s"CAST(size(filter(toks, x -> x IN ($sw))) AS DOUBLE)") / col("n_tokens")))
      .withColumn("distinct_ratio", when(col("n_tokens") === 0L, lit(0.0)).otherwise(
        expr("CAST(size(array_distinct(toks)) AS DOUBLE)") / col("n_tokens")))
      .withColumn("z", expr(
        s"(($w0 + ($w1 * n_tokens)) + ($w2 * mean_len)) + (($w3 * stop_ratio) + ($w4 * distinct_ratio))"))
      .withColumn("score_micros",
        floor((lit(1.0) / (lit(1.0) + exp(-col("z")))) * 1e6 + 0.5).cast("long"))
      .withColumn("keep", col("score_micros") >= 500000L)
      .select(col("doc_id"), col("n_tokens"),
        floor(col("mean_len") * 1e6 + 0.5).cast("long").as("mean_len_micros"),
        floor(col("stop_ratio") * 1e6 + 0.5).cast("long").as("stop_ratio_micros"),
        floor(col("distinct_ratio") * 1e6 + 0.5).cast("long").as("distinct_ratio_micros"),
        col("score_micros"), col("keep"))
  }

  val qualityClassifier: Q = (s, d) =>
    scoreQuality(Tables.documents(s, d)).orderBy(col("doc_id"))

  val qualityClassifierSql: String = {
    val (w0, w1, w2, w3, w4) = QC_W
    val sw = QC_STOPWORDS.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (SELECT doc_id,
       |    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |feat AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) END AS mean_len,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(len(list_filter(toks, x -> x IN ($sw))) AS DOUBLE) / len(toks) END AS stop_ratio,
       |    CASE WHEN len(toks) = 0 THEN 0.0
       |         ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END AS distinct_ratio
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
  }

  val queries: Map[String, Q] = Map(
    "bm25_retrieval" -> bm25Retrieval,
    "bm25_index" -> bm25Index,
    "bm25_index_incr" -> bm25IndexIncr,
    "bm25_index_compact" -> bm25IndexCompact,
    "rag_context_pack" -> ragContextPack,
    "dedup_paragraph" -> dedupParagraph,
    "dedup_paragraph_apply" -> dedupParagraphApply,
    "text_lm_bigram" -> textLmBigram,
    "quality_classifier" -> qualityClassifier)

  val oracles: Map[String, String] = Map(
    "bm25_retrieval" -> bm25RetrievalSql,
    // the index is lossless for matched terms, so the identical oracle
    // gates the whole build -> persist -> prune -> score path
    "bm25_index" -> bm25RetrievalSql,
    // ...and the same oracle gates the APPEND path: serve-after-append
    // must equal a fresh whole-corpus retrieval bit-for-bit
    "bm25_index_incr" -> bm25RetrievalSql,
    "bm25_index_compact" -> bm25RetrievalSql,
    "rag_context_pack" -> ragContextPackSql,
    "dedup_paragraph" -> dedupParagraphSql,
    "dedup_paragraph_apply" -> dedupParagraphApplySql,
    "text_lm_bigram" -> textLmBigramSql,
    "quality_classifier" -> qualityClassifierSql)
}
