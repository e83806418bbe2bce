package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TrainOps3}

/** Skew-stress timing main (test scope, not shipped): runs the capped
  * quadratic-surface paths — simhash star, jaccard block sub-split,
  * knn block cap — on the 40× stress corpus (/tmp/stress, see
  * ScaleData) PLUS a planted 2 000-doc boilerplate block that forces
  * every cap to engage, and prints per-path wall times next to the
  * same paths at sf0.1. The printed scalers are the measured second
  * point behind BASELINE.md's 100× extrapolation: data grows 4.4×
  * with pathological skew, each capped path must stay ~linear.
  *
  *   Test/runMain graft.StressBench [stressDir] [sfDir]
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val stressDir = if (args.length > 0) args(0) else "/tmp/stress"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NOTE: driver memory cannot be set here (JVM already running);
      // size it via the sbt fork / SBT_OPTS if the corpus grows
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // 2 000 boilerplate docs: one shared rare-sorted min-shingle AND
    // (for the 40 identical-text groups of 50) one simhash value per
    // group — the exact skew shape that kills uncapped pair expansion
    val planted = (0 until 2000).map { i =>
      (1000000L + i, s"aaa aaa aaa boilerplate header shared by the whole corpus body ${i % 40}")
    }.toDF("doc_id", "text")
    val stressDocs = Tables.documents(spark, stressDir)
      .select(col("doc_id"), col("text")).unionByName(planted)

    def run(tag: String, docs: DataFrame, dir: String): Unit = {
      time(s"$tag dedup_simhash (star)") {
        Dedup.simhashPairs(docs.select(col("doc_id"),
          graft.functions.Expr.simhash64(split(col("text"), " ")).as("sim"))).count()
      }
      graft.Caches.release(blocking = true)
      time(s"$tag dedup_minhash (sig-collapse)") {
        Dedup.minhashPairsOf(docs).count()
      }
      graft.Caches.release(blocking = true)
      time(s"$tag dedup_minhash_exact (md5 twin)") {
        Dedup.minhashPairsFromSigs(docs.select(col("doc_id"),
          graft.functions.Expr.md5MinhashSig(
            graft.functions.Expr.trigramShingles(col("text")), 64).as("sig"))).count()
      }
      graft.Caches.release(blocking = true)
      time(s"$tag dedup_jaccard_block") {
        Dedup.jaccardBlockPairs(docs).count()
      }
      graft.Caches.release(blocking = true)
      time(s"$tag knn_graph")(TrainOps3.knnGraph(spark, dir).count())
      graft.Caches.release(blocking = true)
      // embedding star: corpus vectors + 4 000 planted bit-identical
      // copies — same bucket in every band and same sub-split, the
      // shape only the rep→member collapse keeps linear
      val v0 = Tables.embeddings(spark, dir)
        .filter(col("vec_id") === 0L).select(col("embedding"))
      val dupVecs = spark.range(4000)
        .select((col("id") + 10000000L).as("vec_id"))
        .crossJoin(broadcast(v0))
      val vecs = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding")).unionByName(dupVecs)
      time(s"$tag dedup_embedding (star)") {
        Dedup.bandedEmbeddingPairs(vecs, vecs.count()).count()
      }
      graft.Caches.release(blocking = true)
    }

    // warm JVM/codegen on the small side first, then measure both
    run("warmup-sf0.1", Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), sfDir)
    run("sf0.1", Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), sfDir)
    run("stress40x+boiler", stressDocs, stressDir)
    spark.stop()
  }
}
