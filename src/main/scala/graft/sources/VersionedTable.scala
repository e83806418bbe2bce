package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Newest committed, non-retired snapshot version at the root. */
  def committedTableVersion(s: SparkSession, path: String): Option[Int] = {
    val (fs, root) = fsOf(s, path)
    if (!fs.exists(root)) return None
    val vs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.matches("table_v\\d+")
        && !graft.operators.IndexMaintenance.isRetired(fs, st.getPath))
      .map(_.getPath.getName.stripPrefix("table_v").toInt)
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(root, s"table_v$v/_SUCCESS")))
    if (vs.isEmpty) None else Some(vs.max)
  }

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

  val srcTableVersioned: Q = (s, d) => {
    val path = System.getProperty("java.io.tmpdir") + "/graft_tblv_" +
      d.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    built.computeIfAbsent(path, { _ =>
      val (fs, root) = fsOf(s, path)
      if (fs.exists(root)) {
        val foreign = fs.listStatus(root).map(_.getPath.getName)
          .filterNot(_.matches("table_v\\d+"))
        require(foreign.isEmpty,
          s"src_table_versioned: refusing to clear $path — non-protocol " +
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
      assert(commitTable(merged, path) == 1)
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

  val queries: Map[String, Q] = Map(
    "src_table_versioned" -> srcTableVersioned)

  val oracles: Map[String, String] = Map(
    "src_table_versioned" -> srcTableVersionedSql)
}
