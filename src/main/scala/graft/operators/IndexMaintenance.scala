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
    * retirement instant, and its CONTENT is the grace period (ms) the
    * compactor promised in-flight readers — vacuum enforces it even if
    * the vacuum caller passes a smaller grace, so the promise cannot
    * be voided by a mis-configured maintenance job.
    */
  def retire(fs: FileSystem, dir: Path, graceMs: Long): Unit = {
    val marker = new Path(dir, RetiredMarker)
    if (fs.exists(dir) && !fs.exists(marker)) {
      val out = fs.create(marker, true)
      out.write(graceMs.toString.getBytes("UTF-8"))
      out.close()
    }
  }

  /** Retire or delete `dir`: graceMs == 0 keeps the synchronous-delete
    * behavior (single-reader / test posture); graceMs > 0 defers the
    * delete to a vacuum pass after the grace period.
    */
  def retireOrDelete(fs: FileSystem, dir: Path, graceMs: Long): Unit =
    if (graceMs > 0L) retire(fs, dir, graceMs) else fs.delete(dir, true)

  def isRetired(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, RetiredMarker))

  /** The grace recorded at retirement time (0 for an empty or
    * unreadable marker).
    */
  private def markerGrace(fs: FileSystem, marker: Path): Long =
    try {
      val in = fs.open(marker)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      s.trim.toLong
    } catch { case _: Exception => 0L }

  /** Delete every retired child of `root` whose marker has aged past
    * BOTH the caller's grace and the grace recorded at retirement;
    * returns the deleted directory names. Safe to run concurrently
    * with readers and appends: only roots already invisible to version
    * resolution carry markers, and the age check means any reader that
    * could still hold them has finished.
    */
  def vacuum(fs: FileSystem, root: Path, graceMs: Long): Seq[String] = {
    if (!fs.exists(root)) return Seq.empty
    val now = System.currentTimeMillis()
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .filter { st =>
        val marker = new Path(st.getPath, RetiredMarker)
        fs.exists(marker) && {
          val eff = math.max(graceMs, markerGrace(fs, marker))
          (now - fs.getFileStatus(marker).getModificationTime) >= eff
        }
      }
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
  }
}
