package graft

import org.apache.spark.sql.DataFrame

/** Session-wide registry for caches created inside operators.
  *
  * Operators cache intermediates they read more than once (signatures,
  * range-partitioned inputs); CacheManager keys on the canonicalized
  * plan so repeated invocations reuse one entry and storage does not
  * grow. This registry is the release half of that contract: a session
  * calls `Caches.release()` when an operator phase is over and gets its
  * executor storage back. Safe to call repeatedly; registration is
  * thread-safe.
  */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and track it for release. */
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    live.add(c)
    c
  }

  /** Unpersist every registered cache. */
  def release(blocking: Boolean = false): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking); d = live.poll() }
  }
}
