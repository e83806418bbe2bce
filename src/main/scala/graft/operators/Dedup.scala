package graft.operators

import graft.Tables
import graft.functions.Expr
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2C deduplication over `documents` / `embeddings`.
  *
  * Scale design (100 TB posture): every near-dup variant turns the
  * O(n²) pair space into per-bucket self-joins — minhash LSH bands,
  * simhash chunks, or hyperplane buckets — so the shuffle key is the
  * bucket id and pair generation never leaves a bucket. Buckets are
  * hash-distributed; AQE handles residual skew. The O(n²) work only
  * happens within buckets whose expected size is n / #buckets.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  /** Reference-style normalization before exact dedup: lowercase,
    * collapse whitespace (extractor_v03.py:288).
    */
  private def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  private def toks(c: Column): Column = split(c, " ")

  /** Distinct 3-gram token shingles. */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    array_distinct(
      when(size(t) < 3, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ", slice(t, i + 1, lit(3))))))
  }

  // --- dedup_exact: hash-groupBy on normalized text ------------------
  val dedupExact: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(normText(col("text"))).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
      |  min(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  // --- minhash signatures (shared by the two minhash stages) ---------
  private val K = 64        // signature length
  private val BANDS = 16    // 16 bands × 4 rows
  private val ROWS = K / BANDS

  private def signatures(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sig", Expr.minhashSignature(col("sh"), K))

  /** LSH banding: (band_idx, hash of the band's signature slice). */
  private def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(BANDS - 1)),
          b => hash(slice(col("sig"), b * ROWS + 1, lit(ROWS))))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")

  // --- dedup_minhash: LSH candidate pairs + signature similarity -----
  val dedupMinhash: Q = (s, d) => {
    val sigs = signatures(s, d).cache()
    val b = banded(sigs)
    val pairs = b.as("x").join(b.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id"), col("sig").as("sig_a")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sigs.select(col("doc_id"), col("sig").as("sig_b")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / K).as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- dedup_ngram_jaccard: exact verify of LSH candidates -----------
  val dedupNgramJaccard: Q = (s, d) => {
    val sh = Tables.documents(s, d).select(col("doc_id"), shingles(col("text")).as("sh"))
    dedupMinhash(s, d)
      .join(sh.select(col("doc_id"), col("sh").as("sh_a")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sh.select(col("doc_id"), col("sh").as("sh_b")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- dedup_simhash: 64-bit simhash, chunk-bucketed hamming ---------
  private val CHUNKS = 4 // hamming ≤ 3 × 16 guaranteed caught; wider via threshold

  val dedupSimhash: Q = (s, d) => {
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), Expr.simhash64(toks(col("text"))).as("sim"))
      .cache()
    val chunked = sigs.select(col("doc_id"), col("sim"),
        posexplode(array((0 until CHUNKS).map(ch =>
          shiftrightunsigned(col("sim"), ch * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        Expr.hamming64(col("x.sim"), col("y.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 16)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- dedup_embedding: hyperplane-bucketed cosine near-dups ---------
  /** Deterministic pseudo-random hyperplanes (fixed seed). */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Bucket id = sign bits of the vector against each hyperplane. */
  private[operators] def bucketOf(vec: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(Expr.dotProduct(vec, typedlit(p)) > 0.0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  val dedupEmbedding: Q = (s, d) => {
    val planes = hyperplanes(8, 64)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        bucketOf(col("embedding"), planes).as("bucket"))
    e.as("x").join(e.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        Expr.dotProduct(col("x.embedding"), col("y.embedding")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(50)
  }

  val queries: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_minhash" -> dedupMinhash,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_simhash" -> dedupSimhash,
    "dedup_embedding" -> dedupEmbedding)

  /** Near-dup variants depend on our hash kernels → rows-only checks. */
  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql)
}
