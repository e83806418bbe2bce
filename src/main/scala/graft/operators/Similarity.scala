package graft.operators

import graft.Tables
import graft.functions.Expr
import graft.plans.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C similarity search over `embeddings`.
  *
  * ann_bruteforce is the exact baseline: broadcast the (small) query
  * set against the corpus — a map-only scan, no shuffle of the big
  * side; per-partition top-k then global top-k via the rank window
  * over (query_id), which shuffles only #queries × k rows.
  *
  * ann_lsh is the scale path: hyperplane buckets prune the corpus to
  * the query's bucket before exact re-ranking (recall < 1 by design).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private[graft] val TOPK = 10
  private[graft] val NQUERIES = 5

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  /** Rank the ≤ k retained rows per query (tiny input — the heavy
    * reduction already happened in TopKPerGroupExec).
    */
  private def ranked(topk: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    topk.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --- ann_bruteforce: exact cosine top-k per query ------------------
  // Scoring is a map-only broadcast pass; the custom TopKPerGroup
  // operator (graft.plans) reduces to k rows per query with bounded
  // heaps — no full sort, shuffle carries ≤ k·partitions rows.
  val annBruteforce: Q = (s, d) => {
    val corpus = Tables.embeddings(s, d)
    val scored = corpus.crossJoin(broadcast(queriesDf(s, d)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), TOPK))
  }

  // --- ann_lsh: hyperplane-bucketed approximate top-k ----------------
  // Multiprobe: each query also probes the buckets at hamming
  // distance 1 from its own (flip one hyperplane sign) — the standard
  // recall fix for vectors that fall near a hyperplane, at
  // (planes+1)x the probed cells but still |corpus|/2^planes work per
  // probe. Plane count grows with the corpus (Dedup.planesFor) so
  // expected bucket size stays bounded at any scale.
  /** Multiprobe flip masks: always hamming-1; add hamming-2 once the
    * plane count passes 10, where single-bit probes alone cover too
    * small a fraction of 2^p cells to hold recall. Probe count is
    * 1 + p (+ p(p-1)/2 when p > 10) — still ≪ 2^p cells probed.
    */
  private[graft] def probeMasks(nPlanes: Int): Seq[Long] = {
    val h1 = (0 until nPlanes).map(i => 1L << i)
    val h2 =
      if (nPlanes <= 10) Nil
      else for { i <- 0 until nPlanes; j <- i + 1 until nPlanes } yield (1L << i) | (1L << j)
    0L +: (h1 ++ h2)
  }

  val annLsh: Q = (s, d) => {
    val nPlanes = Dedup.planesFor(
      Dedup.corpusSize(Tables.embeddings(s, d), s"$d/embeddings"))
    val planes = Dedup.hyperplanes(nPlanes, Dedup.EMB_DIM)
    val corpus = Tables.embeddings(s, d)
      .withColumn("bucket", Dedup.bucketOf(col("embedding"), planes))
    val qbucket = Dedup.bucketOf(col("qvec"), planes)
    val probes = array(probeMasks(nPlanes).map(lit): _*)
    val qs = queriesDf(s, d)
      .withColumn("qbucket", explode(transform(probes, flip => qbucket.bitwiseXOR(flip))))
    val scored = corpus.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), TOPK))
  }

  // --- ann_ivf: inverted-file index, k-means-trained centroids -------
  // Coarse quantizer trained by sampled Lloyd's iterations (bounded
  // sample, centroids stay a ≤ nCent-row frame broadcast each round).
  // Corpus vectors are assigned to their nearest centroid (one
  // TopKPerGroup pass, k=1); queries probe the nProbe nearest cells
  // and re-rank exactly within the union of those cells. At scale the
  // assignment is a write-once index.
  private val KMEANS_ITERS = 5
  private val SAMPLE_PER_CENT = 32

  /** Cell count from corpus size: nCent = 2√n (bounded). Finer cells
    * lower the corpus fraction a given recall needs.
    */
  private[graft] def ivfCells(n: Long): Int =
    math.max(16, math.min(4096, 2 * math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Build-time probe calibration (the FAISS-autotune move): sample a
    * calibration query set, compute its EXACT top-k once, and measure —
    * for each true neighbor — the rank of its assigned cell in the
    * query's centroid ordering. The smallest nProbe covering
    * RECALL_TARGET of all truth rows is the calibrated setting. On a
    * clustered corpus neighbors share their query's nearest cell and
    * this lands at 1–10% of nCent (IndexSpec asserts ≤10% with
    * recall@10 ≥ 0.9); on an adversarially isotropic corpus — where
    * true neighbors sit ~72° away and scatter across cells, so low
    * probe fractions are information-theoretically insufficient — it
    * honestly climbs toward nCent rather than shipping silent recall
    * loss. nProbe stays an explicit knob on queryIvfIndex; calibration
    * only chooses the default. Cost: one extra corpus pass at build
    * time (the exact truth for ≤ CALIB_QUERIES broadcast queries);
    * the per-rank histogram collected to the driver is ≤ nCent rows
    * (scalar calibration data, not a data collect).
    */
  private val CALIB_QUERIES = 48
  private val RECALL_TARGET = 0.95

  private[graft] def calibrateNProbe(corpus: DataFrame, cents: DataFrame,
      assigned: DataFrame, n: Long, nCent: Int): Int = {
    val fraction = math.min(1.0, CALIB_QUERIES.toDouble * 1.5 / math.max(1L, n))
    val calib = corpus
      .sample(withReplacement = false, fraction, seed = 11L)
      .limit(CALIB_QUERIES)
      .select(col("vec_id").as("cq_id"), col("embedding").as("cqvec"))
      .localCheckpoint(true)
    val truth = TopK.topKPerGroup(
      corpus.crossJoin(broadcast(calib))
        .filter(col("vec_id") =!= col("cq_id"))
        .select(col("cq_id"), col("vec_id"),
          Expr.dotProduct(col("cqvec"), col("embedding")).as("cos")),
      Seq("cq_id"), Seq(("cos", true), ("vec_id", false)), TOPK)
    val cw = Window.partitionBy(col("cq_id")).orderBy(col("cdist").desc, col("cent_id"))
    val cellRank = calib.crossJoin(broadcast(cents))
      .select(col("cq_id"), col("cent_id"),
        Expr.dotProduct(col("cqvec"), col("cvec")).as("cdist"))
      .withColumn("cell_rank", row_number().over(cw))
      .select(col("cq_id"), col("cent_id"), col("cell_rank"))
    val hist = truth
      .join(assigned.select(col("vec_id"), col("cent_id")), "vec_id")
      .join(cellRank, Seq("cq_id", "cent_id"))
      .groupBy(col("cell_rank")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = hist.map(_._2).sum.toDouble
    if (total == 0) return nCent // degenerate corpus: probe everything
    var cum = 0L
    for ((rank, c) <- hist) {
      cum += c
      if (cum / total >= RECALL_TARGET) return math.max(2, rank)
    }
    nCent
  }

  /** Sampled k-means, all DataFrame-side: assign sample→nearest
    * centroid, recompute elementwise means, renormalize to unit length
    * (so dot-product argmax stays a cosine argmax). localCheckpoint
    * per round keeps the loop's plan constant-size.
    */
  private[graft] def trainCentroids(corpus: DataFrame, nCent: Int,
      corpusN: Long): DataFrame = {
    // Seeded Bernoulli sample: no sort, no driver-side merge — a
    // TakeOrdered draw would funnel nPartitions × sampleSize rows
    // through the driver at cluster scale. The 1.5 factor keeps the
    // expected draw above the target; the limit trims the overshoot.
    val target = nCent * SAMPLE_PER_CENT
    val fraction = math.min(1.0, target.toDouble * 1.5 / math.max(1L, corpusN))
    val sample = corpus
      .sample(withReplacement = false, fraction, seed = 7L)
      .limit(target)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    var cents = sample
      .orderBy(hash(col("vec_id") + 1), col("vec_id")).limit(nCent)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      .localCheckpoint(true)
    for (_ <- 0 until KMEANS_ITERS) {
      val assigned = assignCell(sample, "vec_id", "embedding", localCents(cents))
      val means = assigned
        .select(col("cent_id"), posexplode(col("embedding")))
        .groupBy(col("cent_id"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("mvec"))
      cents = means
        .withColumn("__norm", sqrt(aggregate(col("mvec"), lit(0.0), (a, x) => a + x * x)))
        .select(col("cent_id"),
          transform(col("mvec"), x => (x / col("__norm")).cast("float")).as("cvec"))
        .localCheckpoint(true)
    }
    cents
  }

  /** Driver-local image of a (cent_id, cvec ARRAY<FLOAT>) centroid
    * table, sorted by cent_id (the argmax tie rule). Centroid tables
    * are metadata-sized by construction and every assignment pass
    * already collected them into a BroadcastExchange — same bytes,
    * new home (see Expr.dotArgmax).
    */
  private[graft] def localCents(cents: DataFrame): Array[(Long, Array[Float])] =
    cents.select(col("cent_id"), col("cvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)

  /** Nearest-cell assignment of a vector frame against the
    * driver-local quantizer as ONE codegen'd argmax expression — the
    * replacement for crossJoin(broadcast(cents)) + bounded-TopK k=1
    * (one joined row per (vector, centroid) candidate through join
    * machinery and a heap, for a per-row reduction; guide §2.4/§1.2).
    * Same float-dot accumulation order and the same
    * (cdist DESC, cent_id ASC) tie rule — bit-identical cells. Keeps
    * (idCol, vecCol, cent_id); an empty quantizer assigns nothing,
    * exactly like the join it replaces.
    */
  private[graft] def assignCell(df: DataFrame, idCol: String, vecCol: String,
      local: Array[(Long, Array[Float])]): DataFrame = {
    val a = df.select(col(idCol), col(vecCol),
      Expr.dotArgmax(col(vecCol), local, EMB_DIM)
        .getField("cent_id").as("cent_id"))
    if (local.isEmpty) a.filter(lit(false)) else a
  }

  /** Exact-arithmetic twins of localCents/assignCell for the quantized
    * (cv ARRAY<BIGINT>) IVF heads — argmax of the long-dot kernel,
    * same tie rule as the TopK pass they replace.
    */
  private[graft] def localCentsExact(cents: DataFrame): Array[(Long, Array[Long])] =
    cents.select(col("cent_id"), col("cvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)

  private[graft] def assignCellExact(df: DataFrame, idCol: String, vecCol: String,
      local: Array[(Long, Array[Long])]): DataFrame = {
    val a = df.select(col(idCol), col(vecCol),
      Expr.longDotArgmax(col(vecCol), local, EMB_DIM)
        .getField("cent_id").as("cent_id"))
    if (local.isEmpty) a.filter(lit(false)) else a
  }

  /** The trained quantizer is a write-once artifact of the corpus (at
    * scale it would be persisted alongside the index); this memo
    * mirrors that instead of retraining on every query. Keyed by the
    * owning SparkSession's identity as well as the corpus — a frame
    * whose localCheckpoint blocks belong to a stopped SparkContext
    * must never be served to a new session. Data-staleness (regenerated
    * parquet at the same path) is the caller's to invalidate via
    * clearTrainedState(), matching write-once index semantics.
    */
  private val centCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, Int), (DataFrame, Int)]()

  val annIvf: Q = (s, d) => {
    val corpus = Tables.embeddings(s, d)
    val n = Dedup.corpusSize(corpus, s"$d/embeddings")
    val nCent = ivfCells(n)
    val (cents, nProbe) = centCache.computeIfAbsent(
      (System.identityHashCode(s), d, nCent), { _ =>
        val trained = trainCentroids(corpus, nCent, n)
        // calibration's assignment pass reuses the trained quantizer;
        // the (lazy) assignment dataflow below recomputes it per query,
        // matching write-once-index semantics where assignment is I/O
        val assigned = assignCell(corpus, "vec_id", "embedding",
          localCents(trained))
        (trained, calibrateNProbe(corpus, trained, assigned, n, nCent))
      })
    // corpus side: per-row argmax expression; query side keeps the
    // bounded TopK (top-nProbe over a queries-sized frame)
    val indexed = assignCell(corpus, "vec_id", "embedding", localCents(cents))
    val probes = TopK.topKPerGroup(
        queriesDf(s, d).crossJoin(broadcast(cents))
          .select(col("query_id"), col("qvec"),
            col("cent_id"), Expr.dotProduct(col("qvec"), col("cvec")).as("cdist")),
        Seq("query_id"), Seq(("cdist", true), ("cent_id", false)), nProbe)
      .select(col("query_id"), col("qvec"), col("cent_id"))
    val scored = indexed.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), TOPK))
  }

  // --- ann_ivf_index: the persisted write-once index -----------------
  // At 100 TB the IVF index is not rebuilt per query: centroids and the
  // assigned corpus are written once, the corpus PARTITIONED BY cent_id.
  // A probe then joins the (tiny, broadcast) probe-cell set against the
  // partitioned corpus — Spark's dynamic partition pruning turns that
  // into reading ONLY the probed cells' files, the distributed analog
  // of an inverted-list seek. IndexSpec asserts the pruning is in the
  // plan, not just hoped for.

  // VERSIONED CORPUS ROOT: the assigned corpus lives at corpus_vN and a
  // version is committed by its own parquet _SUCCESS (bm25-style).
  // Builds write corpus_v0; appends land files INSIDE the newest
  // committed version (per-vector assignment reads no corpus-level
  // state, so partially-landed append files are just a smaller corpus —
  // see the consistency note below); compaction writes corpus_v{N+1}
  // and retires vN, so readers either resolve the old root (and can
  // finish scanning it under a retirement grace period) or the new one
  // — never a half-swapped directory. This is what makes compaction an
  // ONLINE maintenance op instead of a serve-blocking swap.

  /** Newest committed corpus version at an index root. */
  private[graft] def committedCorpusVersion(s: SparkSession, path: String): Option[Int] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val vs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("corpus_v\\d+")
        && !IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("corpus_v").toInt)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(root, s"corpus_v$v/_SUCCESS")))
    if (vs.isEmpty) None else Some(vs.max)
  }

  private[graft] def liveCorpusPath(s: SparkSession, path: String): String = {
    val v = committedCorpusVersion(s, path).getOrElse(
      throw new IllegalStateException(s"no committed ivf corpus at $path"))
    s"$path/corpus_v$v"
  }

  /** Train + assign + persist + calibrate. Returns (nCent, nProbe):
    * nProbe is the build-time-calibrated default (see calibrateNProbe),
    * measured against the PERSISTED assignment so the number describes
    * exactly the index a probe will read.
    */
  def buildIvfIndex(corpus: DataFrame, path: String): (Int, Int) = {
    val s = corpus.sparkSession
    val n = corpus.count()
    val nCent = ivfCells(n)
    val cents = trainCentroids(corpus, nCent, n)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    // explicit schemas on the read-back: a zero-row corpus writes no
    // parquet files, and schema inference over an empty directory
    // throws — the index of an empty corpus must be a valid empty index
    val trained = s.read.schema(cents.schema).parquet(s"$path/centroids")
    val toWrite = assignCell(corpus, "vec_id", "embedding", localCents(trained))
    // a rebuild replaces the whole index: retire every prior corpus
    // version so a stale root cannot shadow the new assignment
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.listStatus(root)
      .filter(_.getPath.getName.matches("corpus(_v\\d+|_compacting)?"))
      .foreach(st => fs.delete(st.getPath, true))
    // One file per cell: without the repartition every task holds rows
    // of ~all cells and partitionBy explodes into tasks × cells small
    // files (measured ~28k files at 896 cells / 32 partitions — serve
    // latency became directory listing, not data). Hash-distributing
    // by cent_id first bounds the layout at one file per cell, the
    // inverted-list shape a 100 TB index needs for probe-only reads.
    toWrite.repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/corpus_v0")
    val assigned = s.read.schema(toWrite.schema).parquet(s"$path/corpus_v0")
    (nCent, calibrateNProbe(corpus, trained, assigned, n, nCent))
  }

  /** Top-k over a persisted index: probe cells per query, join against
    * the cent_id-partitioned corpus (dynamic partition pruning), exact
    * re-rank inside the probed cells.
    */
  def queryIvfIndex(s: SparkSession, path: String, queriesDf: DataFrame,
      nProbe: Int, k: Int): DataFrame = {
    // explicit schemas: an empty index directory has no files to infer
    // from, but probing an empty index is well-defined (zero rows)
    val centSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "cent_id BIGINT, cvec ARRAY<FLOAT>")
    val corpusSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, embedding ARRAY<FLOAT>, cent_id BIGINT")
    val cents = s.read.schema(centSchema).parquet(s"$path/centroids")
    val indexed = partitionedFrame(s, liveCorpusPath(s, path), corpusSchema)
    val probes = TopK.topKPerGroup(
        queriesDf.crossJoin(broadcast(cents))
          .select(col("query_id"), col("qvec"), col("cent_id"),
            Expr.dotProduct(col("qvec"), col("cvec")).as("cdist")),
        Seq("query_id"), Seq(("cdist", true), ("cent_id", false)), nProbe)
      .select(col("query_id"), col("qvec"), col("cent_id"))
    val scored = indexed.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), k))
  }

  // --- ann_ivf_index_incr: frozen-quantizer incremental append --------
  // The IVF sibling of bm25_index_incr: a vector batch is ingested into
  // the persisted index WITHOUT re-running k-means. The persisted
  // centroids are the FROZEN quantizer — the production posture, where
  // the quantizer is a training artifact and ingest must not drift it
  // (drifting centroids would silently invalidate every previously
  // assigned cell). Assignment is per-vector nearest-centroid,
  // independent of every other vector, so append-then-serve EQUALS a
  // fresh whole-corpus assignment under the same centroids — the
  // losslessness gate IndexSpec asserts exactly at 1x AND 10x.
  //
  // Consistency: unlike BM25, IVF serve reads NO corpus-level
  // statistics (scoring is pure per-pair cosine), so there is no
  // mixed-stats failure mode to protect against — a reader during an
  // append sees the old index plus whichever of the batch's cell files
  // have landed, which is a correct index over a subset of the evolving
  // corpus (the contract an ANN serve already has). Plain append-mode
  // files INSIDE the committed corpus version therefore suffice where
  // bm25's stats write needed a per-batch commit point; the corpus_vN
  // versioning exists for COMPACTION (which rewrites history and does
  // need old-or-new atomicity), not for appends.
  //
  // RE-TRAIN POLICY (when appending must stop): quantizer drift shows
  // up as cell skew — when the max cell's share of the corpus exceeds
  // ~8x the mean cell size (or recall@k on a held-out calibration set
  // drops below the build-time RECALL_TARGET), rebuild the quantizer
  // via buildIvfIndex; until that bound trips, ingest is pay-per-batch.

  /** Assign a NEW vector batch under the persisted (frozen) centroids
    * and append it into the existing cent_id partitioning — same
    * one-file-per-cell discipline as the build (repartition before
    * partitionBy; each append adds at most one file per touched cell,
    * so file counts grow with batches, not tasks×cells — compact when
    * batch count grows large).
    */
  def appendIvfIndex(newVecs: DataFrame, path: String): Unit = {
    val s = newVecs.sparkSession
    val centSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "cent_id BIGINT, cvec ARRAY<FLOAT>")
    val cents = s.read.schema(centSchema).parquet(s"$path/centroids")
    val assigned = assignCell(newVecs, "vec_id", "embedding", localCents(cents))
    // first append into a centroids-only root bootstraps corpus_v0
    // (append into an empty index IS the assignment pass — IndexSpec's
    // losslessness reference path builds its index exactly this way)
    val target = committedCorpusVersion(s, path)
      .map(v => s"$path/corpus_v$v").getOrElse(s"$path/corpus_v0")
    assigned.repartition(col("cent_id"))
      .write.mode("append").partitionBy("cent_id").parquet(target)
  }

  /** Compact a long-appended IVF index back to one file per cell.
    * Each appendIvfIndex adds up to one file per touched cell, so
    * after many ingest batches a cell's read pays per-batch file opens
    * — compaction coalesces every cell to a single file (the build's
    * layout) without touching assignments, so serve output is
    * IDENTICAL before and after (IndexSpec asserts the equality and
    * the per-cell file bound). ONLINE via the versioned corpus root:
    * the consolidated corpus lands at corpus_v{N+1} (its parquet
    * _SUCCESS is the commit), readers resolve the newest committed
    * version, and the subsumed corpus_vN is retired — deleted
    * immediately at `retireGraceMs == 0`, or marked for a later
    * vacuumIvfIndex pass so in-flight serves that resolved vN can
    * finish their scans. Same single-writer contract as bm25: one
    * append or compact at a time per index root.
    */
  def compactIvfIndex(s: SparkSession, path: String,
      retireGraceMs: Long = 0L): Unit = {
    val v = committedCorpusVersion(s, path).getOrElse(
      throw new IllegalStateException(s"no committed ivf corpus at $path"))
    // the committed files are the schema authority: infer from the
    // parquet footers (one footer read) rather than trusting a caller
    // to know which head (float `embedding` vs exact `cv`) wrote the
    // index — an explicit wrong schema would read the payload column
    // as NULL and commit a corpus with the vectors silently dropped
    val corpus = s.read.parquet(s"$path/corpus_v$v")
    val cols = corpus.columns.toSet
    require(cols.contains("vec_id") && cols.contains("cent_id"),
      s"compactIvfIndex: $path/corpus_v$v is not an ivf corpus " +
        s"(columns ${corpus.columns.mkString(", ")})")
    corpus
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/corpus_v${v + 1}")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    // retire EVERYTHING below the new commit (not just vN) so a crash
    // between a previous compact's commit and its retire converges on
    // the next run instead of leaking an orphan version
    fs.listStatus(root)
      .filter(st => st.getPath.getName.matches("corpus_v\\d+")
        && st.getPath.getName.stripPrefix("corpus_v").toInt <= v)
      .foreach(st => IndexMaintenance.retireOrDelete(fs, st.getPath, retireGraceMs))
  }

  /** Delete retired corpus versions whose grace period has elapsed;
    * returns the deleted directory names (see compactIvfIndex).
    */
  def vacuumIvfIndex(s: SparkSession, path: String, graceMs: Long): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    IndexMaintenance.vacuum(fs, root, graceMs)
  }

  /** ann_ivf_index_incr: build the index from the vec_id % 7 <> 3
    * slice (k-means trains on ingested data only), APPEND the held-out
    * batch under the frozen quantizer, serve the standard query set.
    * Rows-only registered (float cosine, like every IVF head); the
    * losslessness gate — serve-after-append == fresh whole-corpus
    * assignment on the same centroids — is asserted in IndexSpec, and
    * the probe-side pruning/recall assertions of ann_ivf_index apply
    * unchanged (same serve path).
    */
  val annIvfIndexIncr: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivfi_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    val geom = builtIndexes.computeIfAbsent(path, { _ =>
      val g = buildIvfIndex(
        Tables.embeddings(s, d).filter(col("vec_id") % 7 =!= 3), path)
      appendIvfIndex(
        Tables.embeddings(s, d).filter(col("vec_id") % 7 === 3), path)
      g
    })
    queryIvfIndex(s, path, queriesDf(s, d), geom._2, TOPK)
  }

  /** Session-memoized index builds (write-once semantics in a query fn). */
  private val builtIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int)]()

  /** Layered-index owners (PQ layers, streamed ingest memos) register
    * here so an in-process corpus rewrite invalidates THEIR write-once
    * records together with the base index's — a stale layer over a
    * rebuilt assignment would serve codes against the wrong cells.
    */
  private val invalidationHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  def onClearTrainedState(hook: () => Unit): Unit = invalidationHooks.add(hook)

  /** Drop the memoized quantizers/index records. The localCheckpoint
    * blocks backing dropped centroid frames become unreferenced and
    * Spark's ContextCleaner reclaims them; persisted index files on
    * disk are left for the owner to delete.
    */
  def clearTrainedState(): Unit = {
    centCache.clear(); builtIndexes.clear(); builtIvfExact.clear()
    chainFrames.clear(); dirFrames.clear(); pqCodebookMemo.clear()
    invalidationHooks.forEach(h => h())
  }

  /** Memoized raw chain frame per (path, committed version): the
    * per-root reads each pay a partition-DISCOVERY job (listing every
    * cell directory), and a serve re-created all of them per call —
    * metadata work, not data (guide §6: cache file listings). A new
    * committed version changes the key; in-place rewrites go through
    * clearTrainedState (the existing contract).
    */
  private val chainFrames =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), DataFrame]()

  /** Memoized cell-partitioned directory reads (corpus / PQ codes):
    * every fresh `spark.read.parquet` of a partitionBy(cent_id) dir
    * pays a partition-discovery listing job over all cell directories
    * (measured 78-to-116-task jobs per serve call). Keyed by the
    * resolved dir — versioned dirs change key on commit; write-once
    * layers (pq/, pqr/) invalidate through clearTrainedState with the
    * memo that built them. Metadata caching only (guide §6).
    */
  private val dirFrames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def partitionedFrame(s: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    dirFrames.compute(dir, { (_, cur) =>
      if (cur != null && (cur.sparkSession eq s)) cur
      else s.read.schema(schema).parquet(dir)
    })

  private[graft] def ingestChainFrame(s: SparkSession, path: String, v: Int): DataFrame =
    chainFrames.compute((path, v), { (_, cur) =>
      if (cur != null && (cur.sparkSession eq s)) cur
      else ingestReadRoots(s, path, v)
        .map(r => s.read.schema(ivfxCorpusSchema).parquet(r))
        .reduce(_ unionByName _)
    })

  val annIvfIndex: Q = (s, d) => {
    // full sanitized path (no hashCode collisions) + process id (two
    // JVMs over the same corpus never race overwrite-vs-read on one
    // directory); a production deployment would point this at a
    // durable index location instead
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivf_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    val geom = builtIndexes.computeIfAbsent(path,
      _ => buildIvfIndex(Tables.embeddings(s, d), path))
    queryIvfIndex(s, path, queriesDf(s, d), geom._2, TOPK)
  }

  // --- ann_quantized: integer-quantized exact dot-product top-k ------
  // The oracle-checkable similarity path: components quantized to
  // floor(x·1e6) int64 (floor on double is IEEE-exact, so both engines
  // quantize identically), scores are exact integer sums — no FP
  // accumulation-order drift, so the full ranking is hash-comparable
  // against DuckDB. This is also a real scale technique: int8/int16
  // quantization is how production ANN serves billion-vector corpora
  // (4× less memory bandwidth than float32, SIMD-friendly integer
  // dot products); ×1e6 int64 is the exactness-first variant.
  // Max |component| ≤ 1 → |term| ≤ 1e12 → |sum| ≤ 6.4e13 ≪ Long.Max.
  val annQuantized: Q = (s, d) => {
    def quant(c: Column): Column = graft.functions.Expr.quantVec(c)
    val qs = queriesDf(s, d).select(col("query_id"), quant(col("qvec")).as("qv"))
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id"), quant(col("embedding")).as("cv"))
    val scored = corpus.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.longDot(col("qv"), col("cv")).as("qdot"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("qdot", true), ("vec_id", false)), TOPK)
    val w = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  val annQuantizedSql: String =
    """WITH q AS (SELECT vec_id AS query_id,
      |             [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS qv
      |           FROM embeddings WHERE vec_id < 5),
      |     c AS (SELECT vec_id,
      |             [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS cv
      |           FROM embeddings),
      |     scored AS (
      |       SELECT q.query_id, c.vec_id,
      |              CAST(list_sum([qv[i]*cv[i] FOR i IN range(1, len(qv)+1)]) AS BIGINT) AS qdot
      |       FROM q JOIN c ON c.vec_id <> q.query_id),
      |     ranked AS (SELECT query_id, vec_id, qdot,
      |              CAST(row_number() OVER (PARTITION BY query_id
      |                ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
      |        FROM scored)
      |SELECT query_id, vec_id, qdot, rnk AS rank FROM ranked
      |WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin

  // --- ann_lsh_exact: md5-plane multiprobe twin under the hash gate --
  /** The SAME bucket→multiprobe→score→top-k plan as ann_lsh, with
    * reproducible geometry: 8 md5-derived ±1 planes (Dedup.md5Planes,
    * salt "a"), int64-quantized vectors, hamming-1 probe set, scores
    * from the codegen'd long-dot kernel. The RNG-plane + float-dot
    * variant stays rows-only by nature; this twin puts the LSH ANN
    * plan family — bucketed candidates, broadcast multiprobe query
    * set, TopKPerGroup reduction — under the DuckDB hash gate.
    */
  private val LSH_EXACT_PLANES = 8

  val annLshExact: Q = (s, d) => {
    def quant(c: Column): Column = graft.functions.Expr.quantVec(c)
    val planes = Dedup.md5Planes("a", LSH_EXACT_PLANES)
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id"), quant(col("embedding")).as("cv"))
      .withColumn("bucket", Dedup.md5Bucket(col("cv"), planes))
    val probes = array((0L +: (0 until LSH_EXACT_PLANES).map(i => 1L << i)).map(lit): _*)
    val qs = queriesDf(s, d).select(col("query_id"), quant(col("qvec")).as("qv"))
      .withColumn("qb", Dedup.md5Bucket(col("qv"), planes))
      .withColumn("qbucket", explode(transform(probes, f => col("qb").bitwiseXOR(f))))
    val scored = corpus.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), Expr.longDot(col("qv"), col("cv")).as("qdot"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("qdot", true), ("vec_id", false)), TOPK)
    val w = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  val annLshExactSql: String = {
    val probeList = (0L +: (0 until LSH_EXACT_PLANES).map(i => 1L << i)).mkString(", ")
    s"""WITH e AS (SELECT vec_id,
      |             [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS cv
      |           FROM embeddings),
      |dims AS (SELECT unnest(range(${Dedup.EMB_DIM})) AS j),
      |signs AS (SELECT p, dims.j,
      |    CASE WHEN CAST(concat('0x', substr(md5('a_' || p || '_' || dims.j), 1, 15)) AS BIGINT) & 1 = 1
      |         THEN 1 ELSE -1 END AS s
      |  FROM (SELECT unnest(range($LSH_EXACT_PLANES)) AS p) pp CROSS JOIN dims),
      |bd AS (SELECT e.vec_id, signs.p, SUM(e.cv[signs.j + 1] * signs.s) AS dot
      |       FROM e CROSS JOIN signs GROUP BY e.vec_id, signs.p),
      |bk AS (SELECT vec_id, SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket
      |       FROM bd GROUP BY vec_id),
      |q AS (SELECT e.vec_id AS query_id, e.cv AS qv, bk.bucket AS qb
      |      FROM e JOIN bk ON e.vec_id = bk.vec_id WHERE e.vec_id < 5),
      |qp AS (SELECT query_id, qv, xor(qb, f) AS qbucket
      |       FROM q CROSS JOIN (SELECT unnest([$probeList]) AS f) pr),
      |cand AS (SELECT qp.query_id, bk.vec_id, qp.qv
      |         FROM qp JOIN bk ON bk.bucket = qp.qbucket
      |         WHERE bk.vec_id <> qp.query_id),
      |scored AS (SELECT c.query_id, c.vec_id,
      |             CAST(list_sum([c.qv[i] * e.cv[i] FOR i IN range(1, len(e.cv) + 1)]) AS BIGINT) AS qdot
      |           FROM cand c JOIN e ON e.vec_id = c.vec_id),
      |rk AS (SELECT query_id, vec_id, qdot,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |           ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
      |       FROM scored)
      |SELECT query_id, vec_id, qdot, rnk AS rank FROM rk
      |WHERE rnk <= $TOPK ORDER BY query_id, rank""".stripMargin
  }

  // --- eval_retrieval: IR-quality evaluation of the ANN index ---------
  // The index-QA operator a 100-TB retrieval deployment runs after
  // every build/append: grade the approximate head (ann_lsh_exact's
  // md5-plane multiprobe — int64 scores, engine-reproducible) against
  // exact truth (ann_quantized's int64 brute force) with the two
  // standard IR metrics, per query: recall@10 (ppm) and MRR (the
  // reciprocal rank of the first relevant candidate, micros). Both
  // inputs are TopK-bounded per query, so the eval is metadata-sized
  // at any corpus size; everything is integer arithmetic, so the whole
  // metric computation sits under the DuckDB hash gate (the oracle
  // composes the ann_quantized and ann_lsh_exact conformance texts as
  // nested CTE blocks — the eval can never drift from the heads it
  // grades).
  /** Shared recall@k / MRR metric block over TopK-bounded truth and
    * candidate frames — metadata-sized at any corpus scale, all-integer.
    */
  private[graft] def retrievalMetrics(truth: DataFrame, cand: DataFrame): DataFrame = {
    val hits = cand.join(truth, Seq("query_id", "vec_id"), "left_semi")
    val nTruth = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
    val hitAgg = hits.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_hit"), min(col("cand_rank")).as("first_rel"))
    nTruth.join(hitAgg, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("first_rel"))
      .withColumn("recall_ppm", expr("n_hit * 1000000 DIV n_truth"))
      .withColumn("rr_micros",
        when(col("first_rel").isNull, lit(0L))
          .otherwise(expr("1000000 DIV first_rel")))
      .select(col("query_id"), col("n_truth"), col("n_hit"),
        col("recall_ppm"), col("rr_micros"))
      .orderBy(col("query_id"))
  }

  val evalRetrieval: Q = (s, d) => {
    val truth = annQuantized(s, d).select(col("query_id"), col("vec_id"))
    val cand = annLshExact(s, d)
      .select(col("query_id"), col("vec_id"), col("rank").as("cand_rank"))
    retrievalMetrics(truth, cand)
  }

  // --- eval_retrieval_ivf: IR-quality eval of the PERSISTED IVF head --
  // eval_retrieval grades the LSH head; this key grades the index shape
  // a deployment actually SERVES — a persisted, cent_id-partitioned IVF
  // index maintained under the frozen-quantizer append (the
  // ann_ivf_index_incr posture: build on the %7<>3 slice, append the
  // held-out slice under the frozen centroids, serve, grade). It is the
  // gated measurement behind the documented re-train policy ("rebuild
  // when held-out recall drops below target"), which previously had no
  // oracle-checked operator computing it. To put the whole
  // build → append → serve → eval path under the DuckDB hash gate, the
  // graded head is the EXACT-arithmetic IVF variant: the coarse
  // quantizer is a deterministic md5-sampled subset of the build
  // slice's own vectors (sampling corpus points as the coarse quantizer
  // is the standard IVF bootstrap), with the sampling modulus
  // m = floor(√n/2) so nCent ≈ 2√n — the float head's deployment
  // geometry; vectors are int64-quantized (quantVec) and assignment,
  // probing, and scoring all run on the codegen'd long-dot kernel.
  // Every step is integer-exact and engine-reproducible, so the oracle
  // recomputes the identical index and the identical serve — the eval
  // cannot drift from the head it grades. Expect honest recall numbers
  // on the near-isotropic driver corpus, exactly like eval_retrieval:
  // this is a measurement, not a vanity metric.
  private[graft] val IVFX_NPROBE = 8

  /** Sampling modulus: one centroid per m build vectors,
    * m = floor(√n / 2), giving nCent ≈ n/m ≈ 2√n. sqrt/floor on
    * integer-valued doubles are IEEE-exact, so both engines derive the
    * same m from the same count.
    */
  private[graft] def ivfxModulus(nBuild: Long): Long =
    math.max(1L, math.floor(math.sqrt(nBuild.toDouble) / 2.0).toLong)

  private[graft] def md5Mod(c: Column, m: Long): Column =
    pmod(conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long"), lit(m))

  /** Hard cap on the points any Lloyd/codebook TRAINING pass may scan
    * per round (the FAISS posture: quantizers train on a bounded
    * sample, only the one-shot index ASSIGNMENT touches the full
    * corpus). At 10^10 vectors an uncapped pass scores n×K pairs per
    * round — the one superlinear training cost in the family; capped,
    * per-round cost is ≤ TRAIN_CAP×K at any corpus size. Below the
    * cap the modulus is 1 and the sample IS the corpus, so small-scale
    * results are unchanged.
    */
  private[graft] val TRAIN_CAP = 65536L

  /** Training-sample modulus: ceil(n / TRAIN_CAP) in exact integer
    * arithmetic, so the kept ≈ n/mod points never exceed the cap.
    */
  private[graft] def trainMod(n: Long): Long =
    math.max(1L, (n + TRAIN_CAP - 1L) / TRAIN_CAP)

  /** Membership test for the training sample — md5 over a SALTED id
    * ("t:" prefix) so the sample draw is independent of the md5Mod
    * seed/donor draws on the bare id (sharing the hash would correlate
    * the two moduli and skew the seed count whenever they share
    * factors).
    */
  private[graft] def md5TrainMod(c: Column, m: Long): Column =
    pmod(conv(substring(md5(concat(lit("t:"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(m))

  private[graft] val ivfxCentSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "cent_id BIGINT, cvec ARRAY<BIGINT>")
  private[graft] val ivfxCorpusSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "vec_id BIGINT, cv ARRAY<BIGINT>, cent_id BIGINT")

  /** Build the exact-IVF index: frozen quantizer = the md5-sampled
    * build vectors, corpus partitioned by assigned cell — the same
    * write-once one-file-per-cell layout as buildIvfIndex.
    */
  private[graft] def buildIvfExactIndex(build: DataFrame, path: String): Unit = {
    val s = build.sparkSession
    val q = build.select(col("vec_id"), Expr.quantVec(col("embedding")).as("cv"))
    val m = ivfxModulus(q.count())
    q.filter(md5Mod(col("vec_id"), m) === 0)
      .select(col("vec_id").as("cent_id"), col("cv").as("cvec"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    // same layout discipline as buildIvfIndex: a rebuild replaces the
    // whole index, so retire every prior versioned corpus root before
    // the append below bootstraps corpus_v0 (appends are append-mode
    // and must not stack on a stale assignment)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.listStatus(root)
      .filter(_.getPath.getName.matches("corpus(_v\\d+|_compacting)?"))
      .foreach(st => fs.delete(st.getPath, true))
    appendIvfExactIndex(build, path)
  }

  /** Assign a batch under the persisted frozen quantizer and append it
    * into the cell partitioning (exact-arithmetic twin of
    * appendIvfIndex).
    */
  private[graft] def appendIvfExactIndex(batch: DataFrame, path: String): Unit = {
    val s = batch.sparkSession
    val cents = s.read.schema(ivfxCentSchema).parquet(s"$path/centroids")
    val q = batch.select(col("vec_id"), Expr.quantVec(col("embedding")).as("cv"))
    val assigned = assignCellExact(q, "vec_id", "cv", localCentsExact(cents))
    // versioned corpus root, uniform with the float head: first append
    // bootstraps corpus_v0 (its parquet _SUCCESS is the commit), later
    // appends land inside the newest committed version, and
    // compactIvfIndex/vacuumIvfIndex apply unchanged
    val target = committedCorpusVersion(s, path)
      .map(v => s"$path/corpus_v$v").getOrElse(s"$path/corpus_v0")
    assigned.repartition(col("cent_id"))
      .write.mode("append").partitionBy("cent_id").parquet(target)
  }

  /** Serve the standard query set against the persisted exact-IVF
    * index: probe-cell selection and in-cell scoring on the long-dot
    * kernel, dynamic partition pruning on cent_id (same plan family as
    * queryIvfIndex).
    */
  private[graft] def queryIvfExactIndex(s: SparkSession, path: String,
      qs: DataFrame): DataFrame = {
    val cents = s.read.schema(ivfxCentSchema).parquet(s"$path/centroids")
    val indexed = partitionedFrame(s, liveCorpusPath(s, path), ivfxCorpusSchema)
    val probes = TopK.topKPerGroup(
        qs.crossJoin(broadcast(cents))
          .select(col("query_id"), col("qv"), col("cent_id"),
            Expr.longDot(col("qv"), col("cvec")).as("cdot")),
        Seq("query_id"), Seq(("cdot", true), ("cent_id", false)), IVFX_NPROBE)
      .select(col("query_id"), col("qv"), col("cent_id"))
    val scored = indexed.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.longDot(col("qv"), col("cv")).as("qdot"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("qdot", true), ("vec_id", false)), TOPK)
    val w = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Session-memoized exact-IVF builds (write-once per path+process). */
  private val builtIvfExact =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  // --- ann_pq_exact: product quantization with exact integer ADC -----
  // The COMPRESSED serve face of the ANN family (FAISS's PQ role): a
  // 64-dim vector becomes PQ_M=8 one-byte-ish codes — each 8-dim
  // subvector snaps to its nearest codeword in a per-subspace codebook
  // — and queries score candidates by Asymmetric Distance Computation:
  // the query stays exact, each candidate contributes the PRECOMPUTED
  // dot of the query subvector with its codeword, summed over
  // subspaces. What makes it gateable (the ann_quantized discipline):
  // components quantize once to int64, codebooks are the md5-sampled
  // corpus subvectors (code id = donor vec_id; sampling corpus points
  // is the standard bootstrap — kmeans_train is the trained upgrade),
  // encoding argmin |cw|²−2·sv·cw ties to the lower code id, and every
  // score is an exact int64 sum — so DuckDB reproduces codebooks,
  // codes, and the full ADC ranking bit-for-bit.
  //
  // Scale shape: codebooks ≈ √n × 8 rows (metadata, broadcast);
  // encoding is a broadcast join + bounded TopK (map-side, one pass,
  // write-once in production); the LUT is queries × √n × 8 rows
  // (broadcast); serve is ONE map-side-combinable aggregation keyed
  // (query_id, vec_id) over the codes — the corpus is never joined
  // against itself and candidates travel as 8 small ints, the 32x
  // memory story that makes billion-scale ANN fit RAM.
  private[graft] val PQ_M = 8
  private[graft] val PQ_SUBD = 8
  private[graft] val PQ_KMAX = 256

  /** Fixed corpus embedding width (TESTDATA contract; the PQ slicing
    * PQ_M × PQ_SUBD and the planted constant vectors already assume
    * it). Lets aggregations address components statically.
    */
  private[graft] val EMB_DIM: Int = PQ_M * PQ_SUBD

  /** Donor-sampling modulus targeting K = min(256, floor(sqrt(n)))
    * codewords per subspace: K grows with the corpus until the
    * production-PQ codebook bound (256, one byte per code), after
    * which encode cost is O(n * M * 256) — never O(n * M * sqrt(n)).
    * Below the bound this is exactly m = floor(sqrt(n)) (the gated
    * scales), so the cap changes no gated output.
    */
  private[graft] def pqModulus(n: Long): Long = {
    val k = math.min(PQ_KMAX.toLong, math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong))
    math.max(1L, n / k)
  }

  /** Rows of a (s, code_id, cw) codebook frame regrouped as the
    * driver-local structure [[Expr.quantAssign]] rides: per subspace,
    * code ids sorted ascending (the argmin tie rule). Codebooks are
    * metadata-sized BY CONSTRUCTION (≤ PQ_KMAX codewords per subspace)
    * — the pre-rewrite plans collected the same rows into a
    * BroadcastExchange, so no new driver traffic class is introduced.
    */
  private[graft] def localCodebook(rows: Array[org.apache.spark.sql.Row],
      nSub: Int): Array[Array[(Long, Array[Long])]] = {
    val bySub = Array.fill(nSub)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])])
    rows.foreach { r =>
      val s = r.get(0) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
        case other => other.toString.toInt
      }
      if (s >= 0 && s < nSub)
        bySub(s) += ((r.getLong(1), r.getSeq[Long](2).toArray))
    }
    bySub.map(_.sortBy(_._1).toArray)
  }

  /** Per-subspace codebooks + per-vector codes for a quantized corpus
    * frame (vec_id, cv). Returned as (codebook, codes).
    *
    * Encode was a broadcast join on s + bounded-TopK argmin — one
    * joined row per (subvector, codeword) candidate (n×M×K rows of
    * join machinery and heap updates for a pure per-row reduction).
    * The codebook is metadata-sized (≤ PQ_KMAX×PQ_M rows — the plan
    * already collected it for the BroadcastExchange), so it now rides
    * a codegen'd argmin expression over the subvector pass: no join,
    * no TopK, no exchange on the encode path (guide §2.4/§1.2). Same
    * long arithmetic, same (cost, code_id) tie rule — bit-identical
    * codes (hash-gated by the 9 PQ family keys).
    */
  /** Memoized sampled-bootstrap codebook rows per (session, corpus
    * key, modulus) — the codebook is a write-once artifact of the
    * corpus exactly like the trained IVF quantizer (centCache), so
    * serve calls don't re-pay the sampling scan. Invalidated by
    * clearTrainedState (the bench clears per query, so every bench
    * query's warmup re-computes it from parquet).
    */
  private val pqCodebookMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Long), Array[org.apache.spark.sql.Row]]()

  private[graft] def pqEncode(e: DataFrame, m: Long,
      memoKey: Option[String] = None): (DataFrame, DataFrame) = {
    val sub = e
      .select(col("vec_id"), col("cv"),
        explode(sequence(lit(0), lit(PQ_M - 1))).as("s"))
      .select(col("vec_id"), col("s"),
        expr(s"slice(cv, s * $PQ_SUBD + 1, $PQ_SUBD)").as("sv"))
    val cbF = sub.filter(md5Mod(col("vec_id"), m) === 0)
      .select(col("s"), col("vec_id").as("code_id"), col("sv").as("cw"))
    val rows = memoKey match {
      case Some(k) => pqCodebookMemo.computeIfAbsent(
        (System.identityHashCode(e.sparkSession), k, m), _ => cbF.collect())
      case None => cbF.collect()
    }
    val local = localCodebook(rows, PQ_M)
    val cb = cbF.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), cbF.schema)
    // empty-codebook edge decided DRIVER-side (rows are in hand): an
    // isNotNull filter under the project would evaluate the argmin
    // kernel twice per row (filter + project — the guide §4.4
    // duplication), and a non-empty sample populates every subspace
    // by construction, so the expression never returns null here
    val assigned = sub.select(col("vec_id"), col("s"),
      Expr.quantAssign(col("s"), col("sv"), local, PQ_SUBD)
        .getField("code_id").as("code_id"))
    val codes = if (rows.isEmpty) assigned.filter(lit(false)) else assigned
    (cb, codes)
  }

  val annPqExact: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), Expr.quantVec(col("embedding")).as("cv"))
    val m = pqModulus(Dedup.corpusSize(Tables.embeddings(s, d), s"$d/embeddings"))
    val (cb, codes) = pqEncode(e, m, Some(s"$d/embeddings"))
    val qs = e.filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("query_id"), col("cv"),
        explode(sequence(lit(0), lit(PQ_M - 1))).as("s"))
      .select(col("query_id"), col("s"),
        expr(s"slice(cv, s * $PQ_SUBD + 1, $PQ_SUBD)").as("qv"))
    val lut = qs.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code_id"),
        Expr.longDot(col("qv"), col("cw")).as("qdot"))
    val scored = codes.join(broadcast(lut), Seq("s", "code_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qdot")).as("score"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("score", true), ("vec_id", false)), TOPK)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  val annPqExactSql: String =
    s"""WITH e AS (SELECT vec_id,
       |    [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS cv
       |  FROM embeddings),
       |mm AS (SELECT greatest(1, count(*) // least($PQ_KMAX, greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)))) AS m FROM e),
       |sub AS (SELECT vec_id, s, cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS sv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s)),
       |cb AS (SELECT s.s, s.vec_id AS code_id, s.sv AS cw
       |  FROM sub s, mm
       |  WHERE CAST(concat('0x', substr(md5(CAST(s.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % m = 0),
       |enc0 AS (SELECT sub.vec_id, sub.s, cb.code_id,
       |    CAST(list_sum([cb.cw[j]*cb.cw[j] - 2*sub.sv[j]*cb.cw[j]
       |      FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS cost
       |  FROM sub JOIN cb ON cb.s = sub.s),
       |codes AS (SELECT vec_id, s, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
       |      ORDER BY cost, code_id) AS rn FROM enc0) t WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, s, cv[s*$PQ_SUBD+1 : s*$PQ_SUBD+$PQ_SUBD] AS qv
       |  FROM e CROSS JOIN (SELECT unnest(range(0, $PQ_M)) AS s) WHERE vec_id < $NQUERIES),
       |lut AS (SELECT q.query_id, cb.s, cb.code_id,
       |    CAST(list_sum([q.qv[j]*cb.cw[j] FOR j IN range(1, $PQ_SUBD + 1)]) AS BIGINT) AS qdot
       |  FROM qs q JOIN cb ON cb.s = q.s),
       |sc AS (SELECT l.query_id, c.vec_id, CAST(sum(l.qdot) AS BIGINT) AS score
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.code_id = c.code_id
       |  WHERE c.vec_id <> l.query_id
       |  GROUP BY l.query_id, c.vec_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT query_id, vec_id, score,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc) t WHERE rank <= $TOPK ORDER BY query_id, rank""".stripMargin

  // --- eval_retrieval_pq: grade the compressed head ------------------
  // Same recall@10/MRR composition as eval_retrieval (LSH head) and
  // eval_retrieval_ivf (served index): PQ candidates vs the exact
  // int64 truth. This is the measurement that tells a deployment what
  // the 32x compression COSTS in retrieval quality — the number that
  // decides between PQ-only serve and PQ-then-exact-rerank. Expect
  // honestly low recall on the near-isotropic driver corpus (every
  // approximate head scores low there by construction); the
  // cluster-structure quality PQ must keep is asserted in PqSpec.
  val evalRetrievalPq: Q = (s, d) => {
    val truth = annQuantized(s, d).select(col("query_id"), col("vec_id"))
    val cand = annPqExact(s, d)
      .select(col("query_id"), col("vec_id"), col("rank").as("cand_rank"))
    retrievalMetrics(truth, cand)
  }

  val evalRetrievalPqSql: String =
    s"""WITH truth AS (SELECT query_id, vec_id FROM (
       |${annQuantizedSql}) tq),
       |cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
       |${annPqExactSql}) tc),
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

  /** Build-once-per-process exact-IVF index for a data dir (the
    * ann_ivf_index_incr posture: build on the %7<>3 slice, append the
    * held-out slice under the frozen quantizer); returns the index
    * path. Shared by eval_retrieval_ivf and ivf_skew_report so both
    * measure the SAME persisted index.
    */
  private[graft] def ensureIvfxIndex(s: SparkSession, d: String): String = {
    val path = System.getProperty("java.io.tmpdir") + "/graft_ivfx_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    builtIvfExact.computeIfAbsent(path, { _ =>
      val emb = Tables.embeddings(s, d)
      buildIvfExactIndex(emb.filter(col("vec_id") % 7 =!= 3), path)
      appendIvfExactIndex(emb.filter(col("vec_id") % 7 === 3), path)
      java.lang.Boolean.TRUE
    })
    path
  }

  // --- streamed exactly-once ingest protocol (exact-IVF face) ---------
  // The IVF mirror of the BM25 index's hardened streaming protocol
  // (TrainOps5 delta_vN/stats_vN): each trigger's assignment lands as
  // an immutable cent_id-partitioned vdelta_K, committed by a vstats_K
  // parquet row whose _SUCCESS is the SINGLE atomic point carrying the
  // batch count AND the cumulative ingest-epoch ledger. A writer that
  // dies between vdelta and vstats leaves an orphan delta invisible to
  // readers (versions resolve on vstats) that the epoch's retry
  // overwrites; a writer that dies after vstats leaves a fully
  // ledgered version whose retry is a no-op. No committed-but-
  // unledgered interleaving exists, same as the BM25 side.

  private[graft] val vstatsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "n_vecs BIGINT, epochs ARRAY<BIGINT>")

  /** Newest committed streamed-ingest version (vstats_K/_SUCCESS is
    * the commit; its vdelta_K is complete by write order).
    */
  private[graft] def committedIngestVersion(s: SparkSession, path: String): Option[Int] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val vs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("vstats_\\d+"))
      .map(_.getPath.getName.stripPrefix("vstats_").toInt)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(root, s"vstats_$v/_SUCCESS")))
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Every epoch the streamed chain has absorbed — read from the
    * newest committed vstats row (the ledger is cumulative and atomic
    * with the version, so one row is the whole history).
    */
  private[graft] def committedIngestEpochs(s: SparkSession, path: String): Set[Long] =
    committedIngestVersion(s, path) match {
      case None => Set.empty
      case Some(v) =>
        val row = s.read.schema(vstatsSchema).parquet(s"$path/vstats_$v")
          .select(col("epochs")).collect()(0)
        if (row.isNullAt(0)) Set.empty else row.getSeq[Long](0).toSet
    }

  /** Bootstrap the streamed index's frozen quantizer from the FIRST
    * trigger (the standard md5-sampled corpus-point quantizer; later
    * triggers assign under it unchanged — the ann_ivf_index_incr
    * frozen-append discipline).
    */
  private[graft] def buildIvfStreamQuantizer(batch: DataFrame, path: String): Unit = {
    val q = batch.select(col("vec_id"), Expr.quantVec(col("embedding")).as("cv"))
    val m = ivfxModulus(q.count())
    q.filter(md5Mod(col("vec_id"), m) === 0)
      .select(col("vec_id").as("cent_id"), col("cv").as("cvec"))
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Commit one trigger: assign the batch under the frozen quantizer
    * into an immutable vdelta_K (one file per cell, the inverted-list
    * layout), then commit vstats_K with the cumulative epoch ledger.
    */
  private[graft] def ivfIngestCommit(batch: DataFrame, path: String, k: Int,
      epochs: Seq[Long]): Unit = {
    val s = batch.sparkSession
    val cents = s.read.schema(ivfxCentSchema).parquet(s"$path/centroids")
    val q = batch.select(col("vec_id"), Expr.quantVec(col("embedding")).as("cv"))
    val assigned = assignCellExact(q, "vec_id", "cv", localCentsExact(cents))
    assigned.repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/vdelta_$k")
    val n = s.read.schema(ivfxCorpusSchema).parquet(s"$path/vdelta_$k").count()
    import s.implicits._
    Seq((n, epochs.distinct.sorted)).toDF("n_vecs", "epochs")
      .write.mode("overwrite").parquet(s"$path/vstats_$k")
  }

  /** Clear a streamed-ingest root for a from-scratch rebuild — refuses
    * directories holding anything the protocol does not own (the
    * clearIndexRoot discipline).
    */
  private[graft] def clearIvfIngestRoot(s: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val entries = fs.listStatus(root)
    val foreign = entries.map(_.getPath.getName)
      .filterNot(n => n.matches("(vdelta|vstats|vcompact)_\\d+") || n == "centroids")
    require(foreign.isEmpty,
      s"ivf ingest: refusing to clear $path — it contains non-index " +
        s"entries ${foreign.take(5).mkString(", ")}")
    entries.foreach(st => fs.delete(st.getPath, true))
  }

  /** Newest committed compaction at or below ingest version v
    * (vcompact_K's own parquet _SUCCESS is its commit): readers
    * substitute it for vdelta_0..K — the bm25 compact_vK discipline.
    */
  private[graft] def committedIngestCompact(s: SparkSession, path: String,
      v: Int): Option[Int] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(root)) return None
    val ks = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("vcompact_\\d+")
        && !IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("vcompact_").toInt)
      .filter(k => k <= v &&
        fs.exists(new org.apache.hadoop.fs.Path(root, s"vcompact_$k/_SUCCESS")))
    if (ks.isEmpty) None else Some(ks.max)
  }

  /** The read roots for the committed chain at version v: the newest
    * committed compaction plus the deltas after it.
    */
  private[graft] def ingestReadRoots(s: SparkSession, path: String, v: Int): Seq[String] =
    committedIngestCompact(s, path, v) match {
      case Some(k) => s"$path/vcompact_$k" +: (k + 1 to v).map(i => s"$path/vdelta_$i")
      case None    => (0 to v).map(i => s"$path/vdelta_$i")
    }

  /** Fold the committed chain into one vcompact_V (re-bucketed back to
    * one file per cell — a long chain's per-cell file count is the
    * serve latency, same as the bm25 side), commit it by its own
    * parquet _SUCCESS, then retire the folded sources under the grace
    * contract. vstats dirs are untouched: the newest one carries the
    * cumulative epoch ledger, so exactly-once survives compaction.
    */
  private[graft] def compactIvfIngest(s: SparkSession, path: String,
      graceMs: Long = 0L): Unit = {
    // sweep first: a previous compactor that died between committing
    // its vcompact and retiring the folded sources left them unmarked
    // (invisible to readers — version resolution picks the newest
    // committed vcompact — but a storage leak). Re-retire them before
    // deciding whether there is anything new to fold, since the fold
    // below early-returns exactly when a prior compact already landed.
    retireSupersededIngest(s, path, graceMs)
    val v = committedIngestVersion(s, path).getOrElse(return)
    val roots = ingestReadRoots(s, path, v)
    if (roots.size <= 1) return // nothing to fold
    roots.map(r => s.read.schema(ivfxCorpusSchema).parquet(r))
      .reduce(_ unionByName _)
      .repartition(col("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$path/vcompact_$v")
    retireSupersededIngest(s, path, graceMs)
  }

  /** Retire every chain segment the newest committed compaction
    * supersedes — STATE-derived and idempotent, not tied to any
    * in-flight fold's roots list: once vcompact_K commits, readers
    * never resolve vdelta_0..K or any older vcompact_j, so marking
    * them is always safe, and re-running after a compactor died in
    * the commit→retire window closes the storage leak that window
    * would otherwise make permanent. Orphan vcompact_j (j < K,
    * including uncommitted ones from a dead fold) are swept too.
    */
  private[graft] def retireSupersededIngest(s: SparkSession, path: String,
      graceMs: Long): Unit = {
    val v = committedIngestVersion(s, path).getOrElse(return)
    val k = committedIngestCompact(s, path, v).getOrElse(return)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sessionState.newHadoopConf())
    val superseded =
      (0 to k).map(i => s"vdelta_$i") ++
      fs.listStatus(root).map(_.getPath.getName)
        .filter(n => n.matches("vcompact_\\d+") &&
          n.stripPrefix("vcompact_").toInt < k)
    superseded.map(n => new org.apache.hadoop.fs.Path(root, n))
      .filter(p => fs.exists(p) && !IndexMaintenance.isRetired(fs, p))
      .foreach(p => IndexMaintenance.retireOrDelete(fs, p, graceMs))
  }

  /** Delete retired chain segments whose grace has fully elapsed.
    * Also re-retires anything a dead compactor left unmarked (see
    * retireSupersededIngest), so either maintenance face heals the
    * commit→retire crash window.
    */
  private[graft] def vacuumIvfIngest(s: SparkSession, path: String,
      graceMs: Long): Seq[String] = {
    retireSupersededIngest(s, path, graceMs)
    val root = new org.apache.hadoop.fs.Path(path)
    IndexMaintenance.vacuum(
      root.getFileSystem(s.sessionState.newHadoopConf()), root, graceMs)
  }

  /** Serve the standard query set against the streamed chain: probe
    * cells, collect the probed set to LITERALS (queries × nProbe,
    * metadata-sized), and give EVERY committed vdelta scan a plan-time
    * cent_id PartitionFilter — the unprobed bulk of each delta is
    * never opened, however many triggers the chain absorbed.
    */
  private[graft] def queryIvfStreamedIndex(s: SparkSession, path: String,
      qs: DataFrame): DataFrame = {
    // an empty chain (every trigger so far was empty, so nothing ever
    // committed — the bootstrap-guard state) legitimately serves zero
    // matches; only a committed chain can be probed
    val vOpt = committedIngestVersion(s, path)
    if (vOpt.isEmpty)
      return qs.select(col("query_id"), lit(0L).as("vec_id"),
        lit(0L).as("qdot"), lit(0L).as("rank")).limit(0)
    val v = vOpt.get
    val cents = s.read.schema(ivfxCentSchema).parquet(s"$path/centroids")
    val probes = TopK.topKPerGroup(
        qs.crossJoin(broadcast(cents))
          .select(col("query_id"), col("qv"), col("cent_id"),
            Expr.longDot(col("qv"), col("cvec")).as("cdot")),
        Seq("query_id"), Seq(("cdot", true), ("cent_id", false)), IVFX_NPROBE)
      .select(col("query_id"), col("qv"), col("cent_id"))
    val probedCells = probes.select(col("cent_id")).distinct()
      .collect().map(_.getLong(0))
    // literal cent_id filter ON TOP of the memoized union: Catalyst
    // pushes it through the Union into every root's scan, so each
    // committed segment keeps its plan-time PartitionFilter
    val indexed = ingestChainFrame(s, path, v)
      .filter(col("cent_id").isin(probedCells: _*))
    val scored = indexed.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.longDot(col("qv"), col("cv")).as("qdot"))
    val top = TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("qdot", true), ("vec_id", false)), TOPK)
    val w = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  val evalRetrievalIvf: Q = (s, d) => {
    val path = ensureIvfxIndex(s, d)
    val qs = Tables.embeddings(s, d).filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("query_id"), Expr.quantVec(col("embedding")).as("qv"))
    val cand = queryIvfExactIndex(s, path, qs)
      .select(col("query_id"), col("vec_id"), col("rank").as("cand_rank"))
    val truth = annQuantized(s, d).select(col("query_id"), col("vec_id"))
    retrievalMetrics(truth, cand)
  }

  /** The exact-IVF index recomputed in SQL — quantize, sample the
    * frozen quantizer from the build slice, assign the FULL corpus
    * (the state of the persisted index after build + held-out append).
    * Shared prefix of every oracle that grades or measures that index
    * (eval_retrieval_ivf, ivf_skew_report), so they can never drift
    * from the same index definition.
    */
  private[graft] val ivfxAssignCtes: String =
    """e AS (SELECT vec_id,
      |    [CAST(floor(least(greatest(x, -256), 256)*1e6) AS BIGINT) FOR x IN embedding] AS cv
      |  FROM embeddings),
      |b AS (SELECT vec_id, cv FROM e WHERE vec_id % 7 <> 3),
      |mm AS (SELECT greatest(1, CAST(floor(sqrt(count(*)) / 2) AS BIGINT)) AS m FROM b),
      |cents AS (SELECT vec_id AS cent_id, cv AS cvec FROM b, mm
      |  WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % m = 0),
      |ad AS (SELECT e.vec_id, c.cent_id,
      |    CAST(list_sum([e.cv[i] * c.cvec[i] FOR i IN range(1, len(e.cv) + 1)]) AS BIGINT) AS cdot
      |  FROM e CROSS JOIN cents c),
      |bestc AS (
      |  -- streaming argmax (lexicographic [-cdot, cent_id] min), NOT a
      |  -- row_number window: the window form sorts |corpus| x K rows
      |  -- each dragging the 64-element vector and spills tens of GB in
      |  -- DuckDB at the 100x corpus; the grouped min streams with one
      |  -- row of state per vector, and cv re-joins by key afterwards
      |  SELECT vec_id, CAST(min([-cdot, cent_id])[2] AS BIGINT) AS cent_id
      |  FROM ad GROUP BY vec_id),
      |assigned AS (SELECT e.vec_id, e.cv, b.cent_id
      |  FROM e JOIN bestc b USING (vec_id))""".stripMargin

  val evalRetrievalIvfSql: String =
    s"""WITH $ivfxAssignCtes,
       |q AS (SELECT vec_id AS query_id, cv AS qv FROM e WHERE vec_id < $NQUERIES),
       |pd AS (SELECT q.query_id, q.qv, c.cent_id,
       |    CAST(list_sum([q.qv[i] * c.cvec[i] FOR i IN range(1, len(q.qv) + 1)]) AS BIGINT) AS cdot
       |  FROM q CROSS JOIN cents c),
       |probes AS (SELECT query_id, qv, cent_id FROM (
       |    SELECT query_id, qv, cent_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cdot DESC, cent_id) AS rn
       |    FROM pd) t WHERE rn <= $IVFX_NPROBE),
       |sc AS (SELECT p.query_id, a.vec_id,
       |    CAST(list_sum([p.qv[i] * a.cv[i] FOR i IN range(1, len(a.cv) + 1)]) AS BIGINT) AS qdot
       |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
       |  WHERE a.vec_id <> p.query_id),
       |cand AS (SELECT query_id, vec_id, rnk AS cand_rank FROM (
       |    SELECT query_id, vec_id,
       |      CAST(row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, vec_id) AS BIGINT) AS rnk
       |    FROM sc) t WHERE rnk <= $TOPK),
       |truth AS (SELECT query_id, vec_id FROM (
       |${annQuantizedSql}) tq),
       |nt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth FROM truth GROUP BY query_id),
       |ha AS (SELECT c.query_id, CAST(count(*) AS BIGINT) AS n_hit, min(c.cand_rank) AS first_rel
       |  FROM cand c JOIN truth t ON c.query_id = t.query_id AND c.vec_id = t.vec_id
       |  GROUP BY c.query_id)
       |SELECT nt.query_id, n_truth,
       |  CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
       |  CAST(COALESCE(n_hit, 0) * 1000000 // n_truth AS BIGINT) AS recall_ppm,
       |  CAST(CASE WHEN first_rel IS NULL THEN 0
       |       ELSE 1000000 // first_rel END AS BIGINT) AS rr_micros
       |FROM nt LEFT JOIN ha USING (query_id) ORDER BY nt.query_id""".stripMargin

  val evalRetrievalSql: String =
    s"""WITH truth AS (SELECT query_id, vec_id FROM (
       |${annQuantizedSql}) tq),
       |cand AS (SELECT query_id, vec_id, rank AS cand_rank FROM (
       |${annLshExactSql}) tc),
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

  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "ann_lsh_exact" -> annLshExact,
    "ann_ivf" -> annIvf,
    "ann_ivf_index" -> annIvfIndex,
    "ann_ivf_index_incr" -> annIvfIndexIncr,
    "ann_pq_exact" -> annPqExact,
    "ann_quantized" -> annQuantized,
    "eval_retrieval" -> evalRetrieval,
    "eval_retrieval_pq" -> evalRetrievalPq,
    "eval_retrieval_ivf" -> evalRetrievalIvf)

  /** Float-cosine variants are rows-only: DuckDB's float accumulation
    * order differs at the last ulp; exactness there is covered by
    * SimilaritySpec. ann_quantized is the oracle-checked path — its
    * integer scores are drift-free by construction.
    */
  val oracles: Map[String, String] = Map(
    "ann_pq_exact" -> annPqExactSql,
    "ann_quantized" -> annQuantizedSql,
    "ann_lsh_exact" -> annLshExactSql,
    "eval_retrieval" -> evalRetrievalSql,
    "eval_retrieval_pq" -> evalRetrievalPqSql,
    "eval_retrieval_ivf" -> evalRetrievalIvfSql)
}
