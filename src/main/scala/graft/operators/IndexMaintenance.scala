package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Grace-period retirement for persisted-index roots.
  *
  * Compaction (BM25's delta chain, IVF's corpus versions) replaces a
  * set of committed directories with a consolidated one. Deleting the
  * subsumed roots synchronously is correct for NEW readers — they
  * resolve only the newest committed version — but a long-running
  * reader that resolved its roots BEFORE the compact landed may still
  * be scanning them, and a delete under its feet fails the scan
  * mid-flight. The deployment-grade answer is deferred deletion:
  * compaction RETIRES a subsumed root by dropping a `_RETIRED` marker
  * file into it (atomic create; readers never resolve retired roots
  * because version resolution always picks the newest live commit,
  * and files starting with `_` are invisible to parquet scans), and a
  * separate VACUUM pass deletes retired roots whose marker has aged
  * past a grace period sized to the deployment's longest query
  * (marker modification time is the retirement timestamp — the
  * FileSystem stamps it on create, no clock state is persisted).
  *
  * All operations go through the Hadoop FileSystem API, so retirement
  * works identically on file:/hdfs:/s3a: index roots.
  */
private[graft] object IndexMaintenance {

  val RetiredMarker = "_RETIRED"

  /** Mark `dir` retired (idempotent). The marker's mtime is the
    * retirement instant vacuum measures the grace period from.
    */
  def retire(fs: FileSystem, dir: Path): Unit = {
    val marker = new Path(dir, RetiredMarker)
    if (fs.exists(dir) && !fs.exists(marker)) fs.create(marker, true).close()
  }

  /** Retire or delete `dir`: graceMs == 0 keeps the synchronous-delete
    * behavior (single-reader / test posture); graceMs > 0 defers the
    * delete to a vacuum pass after the grace period.
    */
  def retireOrDelete(fs: FileSystem, dir: Path, graceMs: Long): Unit =
    if (graceMs > 0L) retire(fs, dir) else fs.delete(dir, true)

  def isRetired(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, RetiredMarker))

  /** Delete every retired child of `root` whose marker is older than
    * `graceMs`; returns the deleted directory names. Safe to run
    * concurrently with readers and appends: only roots already
    * invisible to version resolution carry markers, and the age check
    * means any reader that could still hold them has finished.
    */
  def vacuum(fs: FileSystem, root: Path, graceMs: Long): Seq[String] = {
    if (!fs.exists(root)) return Seq.empty
    val now = System.currentTimeMillis()
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter { st =>
        val marker = new Path(st.getPath, RetiredMarker)
        fs.exists(marker) &&
          (now - fs.getFileStatus(marker).getModificationTime) >= graceMs
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
  }
}
