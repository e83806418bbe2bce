package graft.operators

import graft.Tables
import graft.functions.Expr
import graft.plans.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2C similarity search over `embeddings`.
  *
  * ann_bruteforce is the exact baseline: broadcast the (small) query
  * set against the corpus — a map-only scan, no shuffle of the big
  * side; per-partition top-k then global top-k via the rank window
  * over (query_id), which shuffles only #queries × k rows.
  *
  * ann_lsh is the scale path: hyperplane buckets prune the corpus to
  * the query's bucket before exact re-ranking (recall < 1 by design).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val TOPK = 10
  private val NQUERIES = 5

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < NQUERIES)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  /** Rank the ≤ k retained rows per query (tiny input — the heavy
    * reduction already happened in TopKPerGroupExec).
    */
  private def ranked(topk: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    topk.withColumn("rank", row_number().over(w).cast("long"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --- ann_bruteforce: exact cosine top-k per query ------------------
  // Scoring is a map-only broadcast pass; the custom TopKPerGroup
  // operator (graft.plans) reduces to k rows per query with bounded
  // heaps — no full sort, shuffle carries ≤ k·partitions rows.
  val annBruteforce: Q = (s, d) => {
    val corpus = Tables.embeddings(s, d)
    val scored = corpus.crossJoin(broadcast(queriesDf(s, d)))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), TOPK))
  }

  // --- ann_lsh: hyperplane-bucketed approximate top-k ----------------
  // Multiprobe: each query also probes the 8 buckets at hamming
  // distance 1 from its own (flip one hyperplane sign) — the standard
  // recall fix for vectors that fall near a hyperplane, at 9x the
  // probed cells but still |corpus|/2^planes work per probe.
  private val PLANES = 8

  val annLsh: Q = (s, d) => {
    val planes = Dedup.hyperplanes(PLANES, 64)
    val corpus = Tables.embeddings(s, d)
      .withColumn("bucket", Dedup.bucketOf(col("embedding"), planes))
    val qbucket = Dedup.bucketOf(col("qvec"), planes)
    val probes = array((lit(0L) +: (0 until PLANES).map(i => lit(1L << i))): _*)
    val qs = queriesDf(s, d)
      .withColumn("qbucket", explode(transform(probes, flip => qbucket.bitwiseXOR(flip))))
    val scored = corpus.join(broadcast(qs),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), TOPK))
  }

  // --- ann_ivf: inverted-file index with deterministic centroids -----
  // Coarse quantizer = the first NCENT corpus vectors (deterministic
  // seeds — a k-means refinement would train them, the search path is
  // identical). Corpus vectors are assigned to their nearest centroid
  // (one TopKPerGroup pass, k=1); queries probe the NPROBE nearest
  // cells and re-rank exactly within the union of those cells. At
  // scale the assignment is a write-once index; per-query work drops
  // from |corpus| to |corpus|·NPROBE/NCENT.
  private val NCENT = 16
  private val NPROBE = 2

  val annIvf: Q = (s, d) => {
    val corpus = Tables.embeddings(s, d)
    val cents = corpus.filter(col("vec_id") < NCENT)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    def assign(df: DataFrame, idCol: String, vecCol: String, probes: Int): DataFrame =
      TopK.topKPerGroup(
        df.crossJoin(broadcast(cents))
          .select(col(idCol), col(vecCol),
            col("cent_id"), Expr.dotProduct(col(vecCol), col("cvec")).as("cdist")),
        Seq(idCol), Seq(("cdist", true), ("cent_id", false)), probes)
    val indexed = assign(corpus, "vec_id", "embedding", 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val probes = assign(queriesDf(s, d), "query_id", "qvec", NPROBE)
      .select(col("query_id"), col("qvec"), col("cent_id"))
    val scored = indexed.join(broadcast(probes), Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Expr.dotProduct(col("qvec"), col("embedding")).as("cosine"))
    ranked(TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("cosine", true), ("vec_id", false)), TOPK))
  }

  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> annBruteforce,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf)

  /** Rows-only: DuckDB list_cosine_similarity interpolates differently
    * at the last ulp; exactness is covered by SimilaritySpec instead.
    */
  val oracles: Map[String, String] = Map.empty
}
