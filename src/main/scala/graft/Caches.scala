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

  /** Cache `df` and track it for release. Skips the re-cache (and the
    * CacheManager "Asked to cache already cached data" WARN it logs)
    * when the canonicalized plan is already in the cache — repeated
    * invocations of an operator inside one phase hit this constantly
    * (bench warmup + timed runs, spec + gate in one JVM).
    */
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) df
    else {
      val c = df.cache()
      live.add(c)
      c
    }

  /** Register an ALREADY-persisted frame for release. For loop
    * operators that persist their own intermediates (round-over-round
    * unpersist) but hand the final frame to a lazy consumer: the
    * consumer evaluates after the operator returns, so the operator
    * cannot unpersist it inline — the phase release reclaims it here.
    */
  def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every registered cache. */
  def release(blocking: Boolean = false): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(blocking); d = live.poll() }
  }

  /** Registered-but-unreleased cache count (memory-accounting probe). */
  def liveCount: Int = live.size()
}
