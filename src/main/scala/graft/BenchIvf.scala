package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** IVF build-vs-serve split benchmark (one JSON line, Bench-style).
  *
  * ann_ivf's registered query deliberately re-derives the corpus→cell
  * assignment per execution (write-once-index semantics say that
  * assignment is I/O, so the in-query recompute stands in for a read)
  * — which means its benched wall time mixes three costs with very
  * different amortization at scale:
  *
  *   build-train  — sampled k-means + probe calibration: once per
  *                  corpus, amortized over every query the index serves
  *   build-assign — assigning all n vectors to cells + partitioned
  *                  write: once per corpus (the index files)
  *   serve        — probe nProbe cells per query against the
  *                  PERSISTED index (dynamic partition pruning reads
  *                  only those cells): the only per-query cost
  *
  * This main times the three separately on SPARK_GRAFT_SF_DIR via the
  * persisted-index path (buildIvfIndex / queryIvfIndex — exactly what
  * ann_ivf_index runs), so BASELINE.md can publish build and serve at
  * each scale point instead of a single conflated number. Serve is
  * best-of-three after an untimed warmup (steady state of a resident
  * cluster); build is a single timed run (it happens once).
  */
object BenchIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val corpus = Tables.embeddings(spark, sfDir)
    val n = corpus.count()
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_bench").toString
    try {
      // --- build, with the train and assign+write phases timed apart ---
      // (mirrors buildIvfIndex's stages; the combined buildIvfIndex call
      // below is what ann_ivf_index actually runs and is timed whole)
      var geom: (Int, Int) = null
      val buildSec = timed { geom = operators.Similarity.buildIvfIndex(corpus, path) }
      // train-only re-run for the split (fresh k-means over the same
      // corpus; calibration + write excluded) — gives the decomposition
      // without instrumenting the production code path. NOTE: this is a
      // warm-JVM SECOND training pass, so train_sec approximates the
      // train share of build_sec rather than partitioning it exactly
      // (BASELINE.md footnotes the methodology where the numbers are
      // published).
      val trainSec = timed {
        operators.Similarity.trainCentroids(
          corpus, operators.Similarity.ivfCells(n), n).count()
      }

      // --- serve against the persisted index, at the calibrated nProbe ---
      val nCent = geom._1
      val nProbe = geom._2
      def queriesDf = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      def serveOnce(): Unit =
        operators.Similarity.queryIvfIndex(spark, path, queriesDf, nProbe, 10).count()
      serveOnce() // untimed warmup
      val serveSec = (1 to 3).map(_ => timed(serveOnce())).min

      println(s"""{"metric":"ivf_split","sf":"$sfDir","n":$n,"nCent":$nCent,""" +
        s""""build_sec":${f3(buildSec)},"train_sec":${f3(trainSec)},""" +
        s""""serve_sec":${f3(serveSec)},"nProbe":$nProbe}""")

      // --- incremental append split (ann_ivf_index_incr) -------------
      // build on the vec_id % 7 <> 3 slice (train + assign + persist),
      // APPEND the held-out batch under the frozen quantizer, serve the
      // standard query set against the appended index. append_sec is
      // the pay-per-batch ingest cost the operator exists for — at
      // scale it replaces re-running build_sec per ingest.
      val ipath = java.nio.file.Files.createTempDirectory("graft_ivfi_bench").toString
      try {
        val corpusA = corpus.filter(col("vec_id") % 7 =!= 3)
        val batch = corpus.filter(col("vec_id") % 7 === 3)
        val nBatch = batch.count()
        var geomI: (Int, Int) = null
        val buildASec = timed { geomI = operators.Similarity.buildIvfIndex(corpusA, ipath) }
        val appendSec = timed { operators.Similarity.appendIvfIndex(batch, ipath) }
        def serveIncr(): Unit =
          operators.Similarity.queryIvfIndex(spark, ipath, queriesDf, geomI._2, 10).count()
        serveIncr() // untimed warmup
        val serveIncrSec = (1 to 3).map(_ => timed(serveIncr())).min
        println(s"""{"metric":"ivf_incr_split","sf":"$sfDir","n":$n,"n_batch":$nBatch,""" +
          s""""build_sec":${f3(buildASec)},"append_sec":${f3(appendSec)},""" +
          s""""serve_sec":${f3(serveIncrSec)},"nProbe":${geomI._2}}""")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ipath))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
      spark.stop()
    }
  }
}
