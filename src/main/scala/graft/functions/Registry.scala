package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the custom expressions for `spark.sql(...)` users:
  * `SELECT simhash64(tokens), cosine_similarity(a, b) ...`.
  * Idempotent — `createOrReplaceTempFunction` per session.
  */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => Expr.CosineSimilarity(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => Expr.DotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("long_dot_product",
      es => Expr.LongDotProduct(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => Expr.SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming64",
      es => Expr.HammingDistance64(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash",
      es => Expr.RollingHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("md5_poly_fingerprint",
      es => Expr.Md5PolyFingerprint(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("md5_simhash60",
      es => Expr.Md5Simhash60(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("sig_agree_count",
      es => Expr.SigAgreeCount(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => Expr.MinHashSignature(es.head, Expr.minhashK(es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("md5_minhash_sig",
      es => Expr.Md5MinhashSig(es.head, Expr.minhashK(es(1))), "scala_udf")
  }
}
