package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot per-row kernels that
  * `org.apache.spark.sql.functions._` can't express in one pass —
  * minhash signatures, simhash, cosine similarity, rolling-hash
  * fingerprints. Single-pass eval over `ArrayData` (no per-element
  * boxing, no HOF lambda interpretation); deterministic, so dedup
  * results are reproducible across runs and cluster sizes.
  */
object Expr {

  /** Cosine similarity of two float vectors (0.0 when either is zero).
    * Re-expresses the scale path of embedding near-dup / ANN scoring:
    * one fused dot+norm loop per row.
    */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a.getFloat(i); val y = b.getFloat(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Plain dot product of two float vectors (cosine for pre-normalized
    * embeddings — skips the norm work).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += a.getFloat(i) * b.getFloat(i); i += 1 }
      dot
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** MinHash signature of a string array: k 64-bit min-hashes via the
    * Kirsch–Mitzenmacher construction h_i = h1 + i·h2 over two xxhash64
    * seeds — one hash pass per element regardless of k. Signature of
    * the empty set is Long.MaxValue everywhere.
    */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0 && k <= 512, s"minhash k out of range: $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h1 = XxHash64Function.hash(s, StringType, 42L)
          val h2 = XxHash64Function.hash(s, StringType, 1099511628211L) | 1L
          var j = 0
          var h = h1
          while (j < k) {
            if (h < mins(j)) mins(j) = h
            h += h2
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a string array: per-token xxhash64 votes on each
    * bit; the sign of the vote sum sets the output bit.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
      out
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hamming distance between two 64-bit hashes (simhash dedup). */
  case class HammingDistance64(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "hamming64"

    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Order-sensitive rolling-hash fingerprint of a token sequence
    * (Karp–Rabin polynomial over per-token xxhash64) — the reference's
    * document-identity fingerprint, one long per document.
    */
  case class RollingHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "rolling_hash"

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      var acc = 1469598103934665603L // FNV offset basis
      var i = 0
      while (i < arr.numElements()) {
        val h = if (arr.isNullAt(i)) 0L
          else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        acc = acc * 1099511628211L + h
        i += 1
      }
      acc
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // --- Column-API wrappers -------------------------------------------
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def cosineSimilarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def dotProduct(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def minhashSignature(tokens: Column, k: Int): Column = c(MinHashSignature(e(tokens), k))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def hamming64(a: Column, b: Column): Column = c(HammingDistance64(e(a), e(b)))
  def rollingHash(tokens: Column): Column = c(RollingHash(e(tokens)))
}
