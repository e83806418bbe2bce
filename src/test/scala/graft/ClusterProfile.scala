package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Scratch profiling main (test scope, not shipped): phase breakdown of
  * dedup_cluster at a given sf dir.
  */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warmup whole query once
    time("warmup full dedup_cluster")(Dedup.dedupCluster(spark, sfDir).count())
    graft.Caches.release(blocking = true)
    time("pairs (dedup_minhash)")(Dedup.dedupMinhash(spark, sfDir).count())
    graft.Caches.release(blocking = true)
    val pairs = time("pairs materialized")(
      Dedup.dedupMinhash(spark, sfDir).localCheckpoint(true))
    time("clusterPairs loop on materialized pairs")(
      Dedup.clusterPairs(pairs).count())
    time("full dedup_cluster warm")(Dedup.dedupCluster(spark, sfDir).count())
    spark.stop()
  }
}
