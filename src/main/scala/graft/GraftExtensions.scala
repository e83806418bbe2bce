package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Expr
import graft.plans.TopKStrategy

/** Standard deployment hook: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions().apply _)`)
  * wires the engine into ANY session at construction time — the
  * TopKPerGroup planner strategy plus every custom expression under
  * its SQL name — with no imperative registration calls. The
  * imperative paths (`functions.Registry`, `plans.TopK`) stay for
  * sessions built without the conf; both are idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) = {
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (es: Seq[Expression]) => builder(es))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectFunction(fn("cosine_similarity",
      es => Expr.CosineSimilarity(es.head, es(1))))
    ext.injectFunction(fn("dot_product",
      es => Expr.DotProduct(es.head, es(1))))
    ext.injectFunction(fn("long_dot_product",
      es => Expr.LongDotProduct(es.head, es(1))))
    ext.injectFunction(fn("simhash64", es => Expr.SimHash64(es.head)))
    ext.injectFunction(fn("hamming64",
      es => Expr.HammingDistance64(es.head, es(1))))
    ext.injectFunction(fn("rolling_hash", es => Expr.RollingHash(es.head)))
    ext.injectFunction(fn("md5_poly_fingerprint",
      es => Expr.Md5PolyFingerprint(es.head)))
    ext.injectFunction(fn("md5_simhash60", es => Expr.Md5Simhash60(es.head)))
    ext.injectFunction(fn("trigram_shingles", es => Expr.TrigramShingles(es.head)))
    ext.injectFunction(fn("sig_agree_count",
      es => Expr.SigAgreeCount(es.head, es(1))))
    ext.injectFunction(fn("minhash_signature",
      es => Expr.MinHashSignature(es.head, Expr.minhashK(es(1)))))
    ext.injectFunction(fn("md5_minhash_sig",
      es => Expr.Md5MinhashSig(es.head, Expr.minhashK(es(1)))))
  }
}
