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
    // Multi-JVM validation: SPARK_GRAFT_MASTER=local-cluster[4,8,6144]
    // runs the battery against real separate executor JVMs (worker
    // launch needs SPARK_HOME; ship the library with SPARK_GRAFT_JAR=
    // target/scala-2.13/<package>.jar — driver classpath alone is NOT
    // visible to local-cluster executors, unlike local[n]).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b0 = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Broadcast decisions come from AQE's RUNTIME sizes only. The
      // static planner estimates from compressed parquet bytes and can
      // broadcast a multi-million-row fact table (observed: q10's
      // full orders side at sf1, 0.9s -> 25s); AQE's post-shuffle
      // numbers don't have that failure mode.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      // Let AQE re-optimize (coalesce) the partitioning of CACHED
      // plans: iterative operators persist loop frames (BPE vocab,
      // CC labels, dedup signatures), and with the default `false`
      // every cached frame materializes at the full pre-AQE shuffle
      // width — every loop round then scans shuffle-width tiny tasks
      // however small the frame. Sizing comes from AQE's byte targets,
      // so the setting is scale-adaptive, not a local-core-count tune.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_JAR")
      .fold(b0)(jar => b0.config("spark.jars", jar))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional subset filter: SPARK_GRAFT_QUERIES=q1_agg,dedup_minhash
    val names = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(qs) => qs.split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    // Locale-fixed formatting: f"%.3f" uses the default JVM locale and
    // emits "0,123" (invalid JSON) on comma-decimal locales.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Machine-load sentinel: a contended sandbox has produced 2×
    // whole-battery artifacts from ambient load alone (BENCH_r07 vs
    // its bench-alone re-measure). Two fixed-work probes timed at
    // battery start AND end make a contaminated run self-evident in
    // the artifact instead of needing post-hoc adjudication: a
    // single-thread xorshift spin (pure CPU scheduling pressure) and
    // a fixed all-core Spark job (executor-pool pressure), plus the
    // OS 1-min load average.
    def spinMs(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < 200000000L) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e6
      if (x == 42L) Console.err.println("sentinel")  // defeat dead-code elim
      dt
    }
    def sparkMs(): Double = {
      val t0 = System.nanoTime()
      // bit_xor, not sum: summing 2e8 hashes overflows long under ANSI
      spark.range(0L, 200000000L, 1, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e6
    }
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    // untimed probe warmups: the first Spark job pays codegen/JIT
    // (observed 3.0s vs 0.3s steady) — without these the start/end
    // comparison measures warmup, not load
    spinMs(); sparkMs()
    val spinStart = spinMs(); val sparkStart = sparkMs(); val loadStart = loadAvg()
    // Evaluation action. Default count() is the harness every published
    // baseline used — but under count() Catalyst correctly prunes
    // unreferenced columns and no-op windows/sorts, so a
    // cardinality-preserving query (pure projection, SCD2-style window
    // enrichment) measures as a scan. SPARK_GRAFT_EVAL=hash forces every
    // output column to materialize (bit_xor of xxhash64 over the whole
    // row — order-insensitive, overflow-free), for scale series where
    // the materialization cost IS the question. The two modes are not
    // comparable to each other; BASELINE.md labels which one a table
    // used.
    val evalHash = sys.env.get("SPARK_GRAFT_EVAL").contains("hash")
    def evaluate(df: org.apache.spark.sql.DataFrame): Unit =
      if (evalHash) df.selectExpr("bit_xor(xxhash64(*))").collect() else df.count()
    // Opt-in per-query heap accounting (SPARK_GRAFT_MEMLOG=1): a
    // sampler thread records the max used heap every 25 ms while a
    // query runs (true concurrent peak — pool-peak sums overstate),
    // and the post-GC used heap after the per-query cleanup below is
    // the LIVE SET the battery carries forward: if it climbs
    // monotonically across queries, something (cache registry,
    // memoized quantizers, broadcast refs) is accumulating; if it
    // stays flat, an OOM at this heap size was transient pressure, not
    // a leak. One JSONL row per query -> BENCH_MEM.json.
    val memLog = sys.env.get("SPARK_GRAFT_MEMLOG").contains("1")
    val memRows = new scala.collection.mutable.ArrayBuffer[String]()
    def usedMb: Double = {
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / 1048576.0
    }
    @volatile var peakMb = 0.0
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) { val u = usedMb; if (u > peakMb) peakMb = u }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    if (memLog) sampler.start()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      if (memLog) { peakMb = 0.0; sampling = true }
      val r = try {
        evaluate(fn(spark, sfDir)) // warmup (re-populates this query's caches)
        // Best of two timed runs: a single sample is vulnerable to one-off
        // GC pauses / machine contention (observed 0.6s -> 13s spikes on
        // otherwise-identical runs); the min is the steady-state number a
        // resident cluster serves.
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          evaluate(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        name -> samples.min
      } catch { case _: Throwable => name -> -1.0 }
      // Per-query isolation: release this query's operator caches and
      // memoized index state BEFORE the next query runs. Running the
      // 96-query battery in one JVM with caches held to the end let
      // late queries inherit their neighbors' storage + GC pressure —
      // BENCH_r03 showed 14 unchanged queries >2x baseline that all
      // re-measured at/under baseline in isolation. The System.gc()
      // drives ContextCleaner's reference queue so unreferenced
      // localCheckpoint blocks are actually reclaimed, not just
      // unreachable.
      graft.Caches.release(blocking = true)
      graft.operators.Similarity.clearTrainedState()
      // BM25 index builds are memoized per path+process; clear them too
      // so a repeated battery re-pays the build, not serve-only cost.
      graft.operators.TrainOps5.clearIndexState()
      System.gc()
      if (memLog) {
        sampling = false
        // second GC + settle: the first often only enqueues reference
        // processing; the live set is what survives both
        System.gc(); Thread.sleep(100)
        memRows += s"""{"query":"$name","peak_mb":${f3(peakMb)},""" +
          s""""post_gc_mb":${f3(usedMb)},"live_caches":${graft.Caches.liveCount},""" +
          s""""max_heap_mb":${f3(Runtime.getRuntime.maxMemory() / 1048576.0)}}"""
      }
      r
    }
    val spinEnd = spinMs(); val sparkEnd = sparkMs(); val loadEnd = loadAvg()
    val sentinel =
      s"""{"spin_ms_start":${f3(spinStart)},"spin_ms_end":${f3(spinEnd)},""" +
        s""""spark_ms_start":${f3(sparkStart)},"spark_ms_end":${f3(sparkEnd)},""" +
        s""""load_avg_start":${f3(loadStart)},"load_avg_end":${f3(loadEnd)}}"""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val full =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"sentinel":$sentinel,"sf":"$sfDir"}"""
    // The driver captures only the last ~2000 chars of stdout; the full
    // 80-query map (~2.5 KB) printed last gets truncated mid-line and
    // fails to parse (observed in BENCH_r01/r02). Persist the full map
    // to a file, print it early for humans, and end with a compact
    // headline line guaranteed to fit inside the tail window.
    // SPARK_GRAFT_DETAIL_OUT: write the full map elsewhere (scale /
    // local-cluster batteries must not clobber the committed artifact).
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_DETAIL_OUT", "BENCH_DETAIL.json")),
      full.getBytes("UTF-8"))
    if (memLog) java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_MEM.json"),
      (memRows.mkString("\n") + "\n").getBytes("UTF-8"))
    println(full)
    val headline = Seq(
      "q1_agg", "q3_shipping", "q5_local_supplier", "q6_filter_agg",
      "q7_volume", "q10_returns", "q14_promo", "q18_large", "q22_balance",
      "q_window_rank", "q_asof_join", "q_range_join",
      "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_cluster",
      "ann_bruteforce", "ann_lsh", "ann_ivf",
      "etl_double_verify", "etl_field_verify", "etl_review_queue",
      "text_langid", "pipe_clean_corpus", "pipe_extract_e2e",
      "infer_extract", "stream_sessionize")
    val resMap = results.toMap
    val hs = headline.flatMap(k => resMap.get(k).map(v => "\"" + k + "\":" + f3(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"queries":$hs,"sentinel":$sentinel,"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
