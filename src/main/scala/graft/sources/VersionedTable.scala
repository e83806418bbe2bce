package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2D table_vN snapshot versioning: the bm25/IVF commit protocol
  * (TrainOps5.scala's delta_vN/stats_vN discipline) generalized to
  * the CORPUS TABLES themselves — the poor-man's-lakehouse layer a
  * 100 TB pipeline needs when it cannot assume Delta/Iceberg:
  *
  *   - a snapshot commit is one parquet directory `table_vN` whose
  *     `_SUCCESS` (written last by the parquet commit protocol) is the
  *     atomic commit point — a half-written snapshot is invisible;
  *   - readers resolve the newest committed, non-retired version, or
  *     TIME-TRAVEL to any still-live earlier version by number —
  *     reads are fully-old-or-fully-new, never mixed;
  *   - every version is a FULL snapshot (unlike the bm25 delta chain),
  *     so there is no compaction step; `retainTable` bounds history by
  *     retiring versions below the keep-last window under the shared
  *     grace-period machinery (IndexMaintenance: `_RETIRED` marker +
  *     vacuum after the grace ages out), so a long-running reader that
  *     resolved an old version finishes its scan before deletion;
  *   - single-writer contract per table root, like every protocol
  *     sibling.
  *
  * The gated face (`src_table_versioned`) commits the documents table
  * as v0, folds a deterministically-derived CDC batch through the
  * etl_merge_upsert MERGE shape (ONE key shuffle, last-writer-wins,
  * trailing deletes drop the key), commits the merged state as v1,
  * and serves the v0→v1 diff READ THROUGH THE TIME-TRAVEL READER —
  * so the gate covers commit, resolution, time travel, and the merge
  * in one dataflow. The diff reduces each side to (doc_id, md5, len)
  * before its full-outer join (the corpus_diff fixed-width-shuffle
  * discipline).
  */
object VersionedTable {
  type Q = (SparkSession, String) => DataFrame

  private def fsOf(s: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sessionState.newHadoopConf()), p)
  }

  /** All committed, non-retired snapshot versions at the root,
    * ascending.
    */
  def liveTableVersions(s: SparkSession, path: String): Seq[Int] = {
    val (fs, root) = fsOf(s, path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("table_v\\d+")
        && !graft.operators.IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("table_v").toInt)
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(root, s"table_v$v/_SUCCESS")))
      .toSeq.sorted
  }

  /** Newest committed, non-retired snapshot version at the root. */
  def committedTableVersion(s: SparkSession, path: String): Option[Int] =
    liveTableVersions(s, path).lastOption

  /** Commit `df` as the next snapshot version; returns the committed
    * version number. The parquet `_SUCCESS` is the commit point.
    */
  def commitTable(df: DataFrame, path: String): Int = {
    val v = committedTableVersion(df.sparkSession, path).map(_ + 1).getOrElse(0)
    df.write.mode("overwrite").parquet(s"$path/table_v$v")
    v
  }

  /** Read a committed snapshot: the newest by default, or TIME-TRAVEL
    * to a specific still-live version. Refuses loudly on a missing or
    * retired version instead of returning a partial table.
    */
  def readTable(s: SparkSession, path: String,
      version: Option[Int] = None): DataFrame = {
    val (fs, root) = fsOf(s, path)
    val v = version.getOrElse(committedTableVersion(s, path).getOrElse(
      throw new IllegalStateException(s"no committed table at $path")))
    val dir = new org.apache.hadoop.fs.Path(root, s"table_v$v")
    require(fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))
        && !graft.operators.IndexMaintenance.isRetired(fs, dir),
      s"table_v$v at $path is not a live committed snapshot")
    s.read.parquet(s"$path/table_v$v")
  }

  /** Retire every committed version below the keep-last window (grace
    * marker; a later [[vacuumTable]] deletes aged-out roots).
    */
  def retainTable(s: SparkSession, path: String, keepLast: Int,
      graceMs: Long = 0L): Unit = {
    require(keepLast >= 1, "must keep at least the newest snapshot")
    val (fs, root) = fsOf(s, path)
    committedTableVersion(s, path).foreach { newest =>
      fs.listStatus(root)
        .filter(st => st.isDirectory && st.getPath.getName.matches("table_v\\d+"))
        .filter(_.getPath.getName.stripPrefix("table_v").toInt <= newest - keepLast)
        .foreach(st => graft.operators.IndexMaintenance
          .retireOrDelete(fs, st.getPath, graceMs))
    }
  }

  /** Delete retired snapshots whose grace period has elapsed. */
  def vacuumTable(s: SparkSession, path: String, graceMs: Long): Seq[String] = {
    val (fs, root) = fsOf(s, path)
    graft.operators.IndexMaintenance.vacuum(fs, root, graceMs)
  }

  /** OPTIMIZE: rewrite the newest committed snapshot as
    * table_v{N+1}, compacted to `targetFiles` Z-ORDERED files —
    * Morton-interleave the two 16-bit dimension keys
    * (src_zorder_layout's layout math) and range-partition on the
    * z-value, so each output file holds one contiguous, disjoint
    * z-range and min/max file stats prune for BOTH dimensions. The
    * rewrite is a full-snapshot commit under the same atomic
    * `_SUCCESS` protocol: a reader under an in-flight optimize keeps
    * resolving the previous version, time travel to it stays live
    * until retention retires it, and a crash mid-rewrite leaves no
    * visible version. Scale: one range shuffle of the snapshot (the
    * sampling pass repartitionByRange needs is how a 1000-executor
    * OPTIMIZE balances file sizes without a global sort point).
    * Returns the committed version.
    */
  def optimizeTable(s: SparkSession, path: String, zx: Column, zy: Column,
      targetFiles: Int): Int = {
    require(targetFiles >= 1, "targetFiles must be positive")
    val opt = readTable(s, path)
      .withColumn("__z", graft.operators.ScaleOps.mortonZ(zx, zy))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    commitTable(opt, path)
  }

  /** Session-memoized builds (write-once per path+process; dropped on
    * clearIndexState like every persisted-artifact memo).
    */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  graft.operators.TrainOps5.onClearIndexState(() => built.clear())

  /** The derived CDC batch: updates suffix doc_id % 10 = 0, deletes
    * drop doc_id % 10 = 7, inserts mint doc_id + 1000000 for
    * doc_id % 25 = 0 — all four merge dispositions occur and the
    * oracle re-derives the batch exactly.
    */
  private def changes(v0: DataFrame): DataFrame =
    v0.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" [v2]")).as("text"),
        lit("U").as("op"))
      .unionByName(v0.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), col("text"), lit("D").as("op")))
      .unionByName(v0.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("ins "), col("doc_id").cast("string")).as("text"),
          lit("U").as("op")))

  /** Clear any prior protocol dir at `path` (refusing on foreign
    * entries), commit the documents table as v0, fold the derived CDC
    * batch through the MERGE shape, and commit the merged state as v1
    * — the build both gated faces share. `v1Partitions` fragments the
    * v1 commit into that many hash-scattered files (the small-file
    * "before" state the OPTIMIZE face compacts).
    */
  private def buildV01(s: SparkSession, d: String, path: String,
      v1Partitions: Option[Int] = None): Unit = {
    val (fs, root) = fsOf(s, path)
    if (fs.exists(root)) {
      val foreign = fs.listStatus(root).map(_.getPath.getName)
        .filterNot(_.matches("table_v\\d+"))
      require(foreign.isEmpty,
        s"versioned-table build: refusing to clear $path — non-protocol " +
          s"entries ${foreign.take(5).mkString(", ")}")
      fs.delete(root, true)
    }
    val v0 = Tables.documents(s, d)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    assert(commitTable(v0, path) == 0)
    // the MERGE shape etl_merge_upsert gates: base rows at seq 0,
    // the change batch at seq 1, ONE shuffle by key, last writer
    // wins, trailing deletes drop the key
    val base = readTable(s, path).select(col("doc_id"), col("text"),
      lit("B").as("op"), lit(0L).as("seq"))
    val ev = base.unionByName(
      changes(readTable(s, path)).withColumn("seq", lit(1L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("seq").desc)
    val merged = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("doc_id"), col("text"))
    val v1 = v1Partitions.fold(merged)(n => merged.repartition(n, col("doc_id")))
    assert(commitTable(v1, path) == 1)
  }

  val srcTableVersioned: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_tblv_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    built.computeIfAbsent(path, { _ =>
      buildV01(s, d, path)
      java.lang.Boolean.TRUE
    })
    // serve: the v0→v1 diff read through the TIME-TRAVEL reader —
    // fixed-width (doc_id, md5, len) rows above the full-outer join
    val old = readTable(s, path, Some(0))
      .select(col("doc_id"), md5(col("text")).as("old_hash"),
        length(col("text")).cast("long").as("old_len"))
    val neu = readTable(s, path, None)
      .select(col("doc_id"), md5(col("text")).as("new_hash"),
        length(col("text")).cast("long").as("new_len"))
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

  val srcTableVersionedSql: String =
    """WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      |chg AS (
      |  SELECT doc_id, text || ' [v2]' AS text, 'U' AS op FROM d0 WHERE doc_id % 10 = 0
      |  UNION ALL SELECT doc_id, text, 'D' FROM d0 WHERE doc_id % 10 = 7
      |  UNION ALL SELECT doc_id + 1000000, 'ins ' || CAST(doc_id AS VARCHAR), 'U'
      |    FROM d0 WHERE doc_id % 25 = 0),
      |ev AS (SELECT doc_id, text, 'B' AS op, 0 AS seq FROM d0
      |  UNION ALL SELECT doc_id, text, op, 1 FROM chg),
      |v1 AS (SELECT doc_id, text FROM (
      |    SELECT doc_id, text, op,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
      |    FROM ev) t WHERE rn = 1 AND op <> 'D'),
      |old AS (SELECT doc_id, md5(text) AS old_hash,
      |    CAST(len(text) AS BIGINT) AS old_len FROM d0),
      |neu AS (SELECT doc_id, md5(text) AS new_hash,
      |    CAST(len(text) AS BIGINT) AS new_len FROM v1)
      |SELECT COALESCE(old.doc_id, neu.doc_id) AS doc_id,
      |  CASE WHEN old_hash IS NULL THEN 'added'
      |       WHEN new_hash IS NULL THEN 'removed'
      |       WHEN old_hash <> new_hash THEN 'changed'
      |       ELSE 'unchanged' END AS status,
      |  COALESCE(old_len, -1) AS old_len,
      |  COALESCE(new_len, -1) AS new_len
      |FROM old FULL OUTER JOIN neu ON old.doc_id = neu.doc_id
      |ORDER BY doc_id""".stripMargin

  // --- src_table_optimize: the OPTIMIZE face of the table protocol --
  // Small-file compaction + z-order rewrite as a versioned commit —
  // what Delta/Iceberg call OPTIMIZE ... ZORDER BY, on the table_vN
  // protocol: v1 is committed FRAGMENTED (64 hash-scattered files),
  // optimizeTable rewrites it as v2 = 4 files range-partitioned on
  // the Morton z-value of (doc_id, text length), and retention
  // retires v0. The gate serves the deterministic face: the z-tile
  // locality report over the optimized snapshot READ BACK THROUGH
  // the resolver (both single-dimension slices range-local on one
  // physical order — the src_zorder_layout measurement applied to
  // the rewritten table) plus the live-version ledger; the PHYSICAL
  // properties (file count compacted, per-file z-ranges disjoint,
  // reader-under-optimize isolation) are spec-asserted in
  // SourcesSpec — file layout is engine-side state no SQL oracle
  // can see.
  private val ZTILE = 131072L // 2^17, src_zorder_layout's coarse-tile width

  private def optZx = (col("doc_id") % 65536L).cast("long")
  private def optZy = (length(col("text")) % 65536).cast("long")

  val srcTableOptimize: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_tblo_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    built.computeIfAbsent(path, { _ =>
      buildV01(s, d, path, v1Partitions = Some(64))
      assert(optimizeTable(s, path, optZx, optZy, targetFiles = 4) == 2)
      // retention: retire v0 with a long grace (still on disk for any
      // in-flight reader; invisible to resolution)
      retainTable(s, path, keepLast = 2, graceMs = 3600000L)
      java.lang.Boolean.TRUE
    })
    val live = liveTableVersions(s, path)
    val z = readTable(s, path, None)
      .select(col("doc_id"), col("text"),
        graft.operators.ScaleOps.mortonZ(optZx, optZy).as("zval"))
      .withColumn("tile", expr(s"zval div $ZTILE"))
    val cDoc = col("doc_id") < 256
    val cLen = length(col("text")).between(200, 600)
    z.agg(
        count(lit(1)).as("n_all"), countDistinct(col("tile")).as("t_all"),
        count(when(cDoc, 1)).as("n_doc"),
        countDistinct(when(cDoc, col("tile"))).as("t_doc"),
        count(when(cLen, 1)).as("n_len"),
        countDistinct(when(cLen, col("tile"))).as("t_len"))
      .select(explode(array(
        struct(lit("all_rows").as("metric"), col("n_all").as("n_rows"),
          col("t_all").as("detail")),
        struct(lit("doc_lt_256").as("metric"), col("n_doc").as("n_rows"),
          col("t_doc").as("detail")),
        struct(lit("len_200_600").as("metric"), col("n_len").as("n_rows"),
          col("t_len").as("detail")),
        struct(lit("live_versions").as("metric"),
          lit(live.length.toLong).as("n_rows"),
          lit(live.max.toLong).as("detail")))).as("r"))
      .select(col("r.metric").as("metric"), col("r.n_rows").as("n_rows"),
        col("r.detail").as("detail"))
      .orderBy(col("metric"))
  }

  /** DuckDB oracle: re-derives v1 (the optimized snapshot's DATA —
    * OPTIMIZE never changes rows), replays the z-tile locality math,
    * and states the protocol ledger (v0 retired, v1+v2 live, newest
    * 2) as constants the engine must have arrived at.
    */
  val srcTableOptimizeSql: String = {
    val zExpr = (0 until 16).map(j =>
      s"(((zx >> $j) & 1) << ${2 * j}) + (((zy >> $j) & 1) << ${2 * j + 1})")
      .mkString(" + ")
    s"""WITH d0 AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      |chg AS (
      |  SELECT doc_id, text || ' [v2]' AS text, 'U' AS op FROM d0 WHERE doc_id % 10 = 0
      |  UNION ALL SELECT doc_id, text, 'D' FROM d0 WHERE doc_id % 10 = 7
      |  UNION ALL SELECT doc_id + 1000000, 'ins ' || CAST(doc_id AS VARCHAR), 'U'
      |    FROM d0 WHERE doc_id % 25 = 0),
      |ev AS (SELECT doc_id, text, 'B' AS op, 0 AS seq FROM d0
      |  UNION ALL SELECT doc_id, text, op, 1 FROM chg),
      |v1 AS (SELECT doc_id, text FROM (
      |    SELECT doc_id, text, op,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
      |    FROM ev) t WHERE rn = 1 AND op <> 'D'),
      |z AS (SELECT doc_id, text, ($zExpr) // $ZTILE AS tile
      |  FROM (SELECT doc_id, text, doc_id % 65536 AS zx,
      |          len(text) % 65536 AS zy FROM v1) t),
      |agg AS (SELECT COUNT(*) AS n_all,
      |    CAST(COUNT(DISTINCT tile) AS BIGINT) AS t_all,
      |    COUNT(*) FILTER (doc_id < 256) AS n_doc,
      |    CAST(COUNT(DISTINCT tile) FILTER (doc_id < 256) AS BIGINT) AS t_doc,
      |    COUNT(*) FILTER (len(text) BETWEEN 200 AND 600) AS n_len,
      |    CAST(COUNT(DISTINCT tile)
      |      FILTER (len(text) BETWEEN 200 AND 600) AS BIGINT) AS t_len
      |  FROM z)
      |SELECT * FROM (
      |  SELECT 'all_rows' AS metric, n_all AS n_rows, t_all AS detail FROM agg
      |  UNION ALL SELECT 'doc_lt_256', n_doc, t_doc FROM agg
      |  UNION ALL SELECT 'len_200_600', n_len, t_len FROM agg
      |  UNION ALL SELECT 'live_versions', CAST(2 AS BIGINT), CAST(2 AS BIGINT)) u
      |ORDER BY metric""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "src_table_versioned" -> srcTableVersioned,
    "src_table_optimize" -> srcTableOptimize)

  val oracles: Map[String, String] = Map(
    "src_table_versioned" -> srcTableVersionedSql,
    "src_table_optimize" -> srcTableOptimizeSql)
}
