package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot per-row kernels that
  * `org.apache.spark.sql.functions._` can't express in one pass —
  * minhash signatures, simhash, cosine similarity, rolling-hash
  * fingerprints. Each generates a single static-kernel call inside
  * whole-stage codegen (see [[Kernels]]); interpreted eval shares the
  * same kernels, so both paths are bit-identical and deterministic
  * across runs and cluster sizes.
  */
object Expr {

  private val K = "graft.functions.Kernels"

  /** Cosine similarity of two float vectors (0.0 when either is zero). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = DoubleType
    override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def prettyName: String = "cosine_similarity"
    override def nullSafeEval(l: Any, r: Any): Any =
      Kernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.cosine($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Plain dot product of two float vectors (cosine for pre-normalized
    * embeddings — skips the norm work).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = DoubleType
    override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def prettyName: String = "dot_product"
    override def nullSafeEval(l: Any, r: Any): Any =
      Kernels.dotProduct(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.dotProduct($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Exact int64 dot product over pre-quantized long vectors — the
    * scoring kernel for the hash-gated similarity ops (whole-stage
    * codegen; the zip_with/aggregate formulation evaluates its
    * lambdas interpreted, per pair).
    */
  case class LongDotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def prettyName: String = "long_dot_product"
    override def nullSafeEval(l: Any, r: Any): Any =
      Kernels.longDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.longDot($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** MinHash signature of a string array: k 64-bit min-hashes via the
    * Kirsch–Mitzenmacher construction h_i = h1 + i·h2 over two xxhash64
    * seeds — one hash pass per element regardless of k. Signature of
    * the empty set is Long.MaxValue everywhere.
    */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(k > 0 && k <= 512, s"minhash k out of range: $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes = Seq(ArrayType(StringType))
    override def prettyName: String = "minhash_signature"
    override def nullSafeEval(v: Any): Any =
      Kernels.minhash(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.minhash($a, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 64-bit SimHash of a string array: per-token xxhash64 votes on each
    * bit; the sign of the vote sum sets the output bit.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(StringType))
    override def prettyName: String = "simhash64"
    override def nullSafeEval(v: Any): Any =
      Kernels.simhash(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.simhash($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Distinct 3-token shingles of a space-tokenized string — the
    * single-pass codegen'd form of the split→transform→concat_ws→
    * array_distinct pipeline (see Kernels.trigramShingles for the
    * equivalence contract; the declarative form re-splits the text per
    * shingle and never enters whole-stage codegen).
    */
  case class TrigramShingles(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def inputTypes = Seq(StringType)
    override def prettyName: String = "trigram_shingles"
    override def nullSafeEval(v: Any): Any =
      Kernels.trigramShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.trigramShingles($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Count of agreeing positions between two long-array minhash
    * signatures (the est-jaccard numerator), whole-stage codegen'd.
    */
  case class SigAgreeCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = IntegerType
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def prettyName: String = "sig_agree_count"
    override def nullSafeEval(l: Any, r: Any): Any =
      Kernels.sigAgree(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.sigAgree($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Hamming distance between two 64-bit hashes (simhash dedup). */
  case class HammingDistance64(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = IntegerType
    override def inputTypes = Seq(LongType, LongType)
    override def prettyName: String = "hamming64"
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Order-sensitive rolling-hash fingerprint of a token sequence
    * (Karp–Rabin polynomial over per-token xxhash64) — the reference's
    * document-identity fingerprint, one long per document.
    */
  case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(StringType))
    override def prettyName: String = "rolling_hash"
    override def nullSafeEval(v: Any): Any =
      Kernels.rollingHash(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.rollingHash($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 60-bit md5-vote simhash over distinct tokens — the oracle-
    * reproducible twin of SimHash64 (see Kernels.md5Simhash60).
    */
  case class Md5Simhash60(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(StringType))
    override def prettyName: String = "md5_simhash60"
    override def nullSafeEval(v: Any): Any =
      Kernels.md5Simhash60(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.md5Simhash60($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** K-slot md5 minhash signature — the oracle-reproducible twin of
    * MinHashSignature (see Kernels.md5MinhashSig for the DuckDB
    * arithmetic contract).
    */
  case class Md5MinhashSig(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(k > 0 && k <= 512, s"md5 minhash k out of range: $k")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes = Seq(ArrayType(StringType))
    override def prettyName: String = "md5_minhash_sig"
    override def nullSafeEval(v: Any): Any =
      Kernels.md5MinhashSig(v.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.md5MinhashSig($a, $k)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** md5-Horner fingerprint in mod-(2^31-1) arithmetic — the oracle-
    * reproducible twin of RollingHash (see Kernels.md5PolyFingerprint).
    */
  case class Md5PolyFingerprint(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(StringType))
    override def prettyName: String = "md5_poly_fingerprint"
    override def nullSafeEval(v: Any): Any =
      Kernels.md5PolyFingerprint(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.md5PolyFingerprint($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hyperplane-LSH bucket id: sign bits of the vector against a fixed
    * plane matrix, fused into one pass (vs nPlanes dot-product
    * expressions re-reading the array).
    */
  case class HyperplaneBucket(child: Expression, planes: Array[Float], dim: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(planes.length % dim == 0 && planes.length / dim <= 63,
      s"planes length ${planes.length} not a ≤63 multiple of dim $dim")
    override def dataType: DataType = LongType
    override def inputTypes = Seq(ArrayType(FloatType))
    override def prettyName: String = "hyperplane_bucket"
    override def nullSafeEval(v: Any): Any =
      Kernels.hyperplaneBucket(v.asInstanceOf[ArrayData], planes, dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "float[]")
      defineCodeGen(ctx, ev, a => s"$K.hyperplaneBucket($a, $ref, $dim)")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Argmin codeword assignment against a driver-local codebook — the
    * per-row codegen'd form of `sub.join(broadcast(cb)) → TopK k=1`
    * (see Kernels.quantAssign for the bit-equivalence contract). The
    * codebook rides the expression as plain arrays (indexed by
    * subspace, code ids sorted ascending, codewords flattened k×subd,
    * self-dots precomputed) and reaches generated code via
    * addReferenceObj — no join, no shuffle, no heap. Output struct
    * (code_id, cost); null for an empty subspace.
    */
  case class QuantAssign(left: Expression, right: Expression,
      ids: Array[Array[Long]], cws: Array[Array[Long]],
      c2s: Array[Array[Long]], subd: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def nullable: Boolean = true
    override def dataType: DataType = StructType(Seq(
      StructField("code_id", LongType, nullable = false),
      StructField("cost", LongType, nullable = false)))
    override def inputTypes = Seq(IntegerType, ArrayType(LongType))
    override def prettyName: String = "quant_assign"
    override def nullSafeEval(s: Any, sv: Any): Any =
      Kernels.quantAssign(s.asInstanceOf[Int], sv.asInstanceOf[ArrayData],
        ids, cws, c2s, subd)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("ids", ids, "long[][]")
      val cwsRef = ctx.addReferenceObj("cws", cws, "long[][]")
      val c2sRef = ctx.addReferenceObj("c2s", c2s, "long[][]")
      nullSafeCodeGen(ctx, ev, (s, sv) => s"""
        ${ev.value} = $K.quantAssign($s, $sv, $idsRef, $cwsRef, $c2sRef, $subd);
        ${ev.isNull} = (${ev.value} == null);
      """)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    // Structural equality over the embedded codebook: the case-class
    // default compares arrays by REFERENCE, so two invocations of the
    // same operator would never canonicalize equal — CacheManager
    // plan-matching (graft.Caches.cached) and codegen subexpression
    // elimination both depend on this.
    override def equals(o: Any): Boolean = o match {
      case q: QuantAssign => q.left == left && q.right == right &&
        q.subd == subd &&
        java.util.Arrays.deepEquals(ids.asInstanceOf[Array[AnyRef]],
          q.ids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(cws.asInstanceOf[Array[AnyRef]],
          q.cws.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode: Int = java.util.Objects.hash(left, right,
      Integer.valueOf(subd),
      Integer.valueOf(java.util.Arrays.deepHashCode(ids.asInstanceOf[Array[AnyRef]])))
  }

  /** Argmax float-dot assignment against a driver-local centroid table
    * — the cosine twin of [[QuantAssign]] for IVF cell assignment (see
    * Kernels.dotArgmax). Output struct (cent_id, cdist); null when the
    * table is empty.
    */
  case class DotArgmax(child: Expression, ids: Array[Long],
      cvs: Array[Float], dim: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def nullable: Boolean = true
    override def dataType: DataType = StructType(Seq(
      StructField("cent_id", LongType, nullable = false),
      StructField("cdist", DoubleType, nullable = false)))
    override def inputTypes = Seq(ArrayType(FloatType))
    override def prettyName: String = "dot_argmax"
    override def nullSafeEval(v: Any): Any =
      Kernels.dotArgmax(v.asInstanceOf[ArrayData], ids, cvs, dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
      val cvsRef = ctx.addReferenceObj("cvs", cvs, "float[]")
      nullSafeCodeGen(ctx, ev, v => s"""
        ${ev.value} = $K.dotArgmax($v, $idsRef, $cvsRef, $dim);
        ${ev.isNull} = (${ev.value} == null);
      """)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    // structural equality — see QuantAssign
    override def equals(o: Any): Boolean = o match {
      case q: DotArgmax => q.child == child && q.dim == dim &&
        java.util.Arrays.equals(ids, q.ids) &&
        java.util.Arrays.equals(cvs, q.cvs)
      case _ => false
    }
    override def hashCode: Int = java.util.Objects.hash(child,
      Integer.valueOf(dim), Integer.valueOf(java.util.Arrays.hashCode(ids)))
  }

  /** Argmax long-dot assignment against a driver-local quantized
    * centroid table — the exact-arithmetic twin of [[DotArgmax]] (see
    * Kernels.longDotArgmax). Output struct (cent_id, cdot); null when
    * the table is empty.
    */
  case class LongDotArgmax(child: Expression, ids: Array[Long],
      cvs: Array[Long], dim: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def nullable: Boolean = true
    override def dataType: DataType = StructType(Seq(
      StructField("cent_id", LongType, nullable = false),
      StructField("cdot", LongType, nullable = false)))
    override def inputTypes = Seq(ArrayType(LongType))
    override def prettyName: String = "long_dot_argmax"
    override def nullSafeEval(v: Any): Any =
      Kernels.longDotArgmax(v.asInstanceOf[ArrayData], ids, cvs, dim)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
      val cvsRef = ctx.addReferenceObj("cvs", cvs, "long[]")
      nullSafeCodeGen(ctx, ev, v => s"""
        ${ev.value} = $K.longDotArgmax($v, $idsRef, $cvsRef, $dim);
        ${ev.isNull} = (${ev.value} == null);
      """)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    // structural equality — see QuantAssign
    override def equals(o: Any): Boolean = o match {
      case q: LongDotArgmax => q.child == child && q.dim == dim &&
        java.util.Arrays.equals(ids, q.ids) &&
        java.util.Arrays.equals(cvs, q.cvs)
      case _ => false
    }
    override def hashCode: Int = java.util.Objects.hash(child,
      Integer.valueOf(dim), Integer.valueOf(java.util.Arrays.hashCode(ids)))
  }

  /** Blocked md5-nibble payload fingerprint (see Kernels.phashSig). */
  case class PhashSig(child: Expression, blocks: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes = Seq(BinaryType)
    override def prettyName: String = "phash_sig"
    override def nullSafeEval(v: Any): Any =
      Kernels.phashSig(v.asInstanceOf[Array[Byte]], blocks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.phashSig($a, $blocks)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Differing-nibble-block count (see Kernels.nibbleDiff). */
  case class NibbleDiff(left: Expression, right: Expression, blocks: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = IntegerType
    override def inputTypes = Seq(LongType, LongType)
    override def prettyName: String = "nibble_diff"
    override def nullSafeEval(l: Any, r: Any): Any =
      Kernels.nibbleDiff(l.asInstanceOf[Long], r.asInstanceOf[Long], blocks)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$K.nibbleDiff($a, $b, $blocks)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Resolve the k argument of SQL `minhash_signature(tokens, k)`:
    * any foldable integral expression (INT or BIGINT literal, or a
    * constant-foldable tree). Non-foldable or non-integral k is an
    * analysis error naming the function, not a ClassCastException at
    * registration time.
    */
  private[graft] def minhashK(kExpr: Expression): Int = {
    def fail() = throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" ->
        "minhash_signature(tokens, k): k must be a foldable integral constant"))
    kExpr match {
      case Literal(v: java.lang.Number, _) => v.intValue
      case other if other.foldable => other.eval(null) match {
        case n: java.lang.Number => n.intValue
        case _ => fail()
      }
      case _ => fail()
    }
  }

  // --- Column-API wrappers -------------------------------------------
  private def c(e: Expression): Column = GraftBridge.column(e)
  private def e(col: Column): Expression = GraftBridge.expression(col)

  def cosineSimilarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def dotProduct(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def longDot(a: Column, b: Column): Column = c(LongDotProduct(e(a), e(b)))
  def minhashSignature(tokens: Column, k: Int): Column = c(MinHashSignature(e(tokens), k))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def trigramShingles(text: Column): Column = c(TrigramShingles(e(text)))
  def hamming64(a: Column, b: Column): Column = c(HammingDistance64(e(a), e(b)))
  def sigAgree(a: Column, b: Column): Column = c(SigAgreeCount(e(a), e(b)))
  def rollingHash(tokens: Column): Column = c(RollingHash(e(tokens)))
  def md5PolyFingerprint(tokens: Column): Column = c(Md5PolyFingerprint(e(tokens)))
  def charEntropy(chars: Column): Column = c(CharEntropy(e(chars)))
  def md5Simhash60(tokens: Column): Column = c(Md5Simhash60(e(tokens)))
  def md5MinhashSig(tokens: Column, k: Int): Column = c(Md5MinhashSig(e(tokens), k))
  def phashSig(content: Column, blocks: Int): Column = c(PhashSig(e(content), blocks))
  def nibbleDiff(a: Column, b: Column, blocks: Int): Column = c(NibbleDiff(e(a), e(b), blocks))
  def hyperplaneBucket(vec: Column, planes: Array[Array[Float]]): Column = {
    val dim = planes.head.length
    c(HyperplaneBucket(e(vec), planes.flatten, dim))
  }

  /** [[QuantAssign]] over a driver-local codebook given as
    * (subspace → sorted (code_id, codeword)) — precomputes the flat
    * arrays and self-dots once. `s` may be any integral column.
    */
  def quantAssign(s: Column, sv: Column,
      codebook: Array[Array[(Long, Array[Long])]], subd: Int): Column = {
    val ids = codebook.map(_.map(_._1))
    val cws = codebook.map { cs =>
      val flat = new Array[Long](cs.length * subd)
      var k = 0
      while (k < cs.length) {
        System.arraycopy(cs(k)._2, 0, flat, k * subd, math.min(subd, cs(k)._2.length))
        k += 1
      }
      flat
    }
    val c2s = codebook.map(_.map(cw => {
      var acc = 0L; var j = 0
      while (j < cw._2.length) { acc += cw._2(j) * cw._2(j); j += 1 }
      acc
    }))
    c(QuantAssign(e(s.cast(IntegerType)), e(sv), ids, cws, c2s, subd))
  }

  /** [[DotArgmax]] over a driver-local centroid table given as sorted
    * (cent_id, centroid-float-vector).
    */
  def dotArgmax(vec: Column, cents: Array[(Long, Array[Float])], dim: Int): Column = {
    val ids = cents.map(_._1)
    val flat = new Array[Float](cents.length * dim)
    var k = 0
    while (k < cents.length) {
      System.arraycopy(cents(k)._2, 0, flat, k * dim, math.min(dim, cents(k)._2.length))
      k += 1
    }
    c(DotArgmax(e(vec), ids, flat, dim))
  }

  /** [[LongDotArgmax]] over a driver-local quantized centroid table
    * given as sorted (cent_id, centroid-long-vector).
    */
  def longDotArgmax(vec: Column, cents: Array[(Long, Array[Long])], dim: Int): Column = {
    val ids = cents.map(_._1)
    val flat = new Array[Long](cents.length * dim)
    var k = 0
    while (k < cents.length) {
      System.arraycopy(cents(k)._2, 0, flat, k * dim, math.min(dim, cents(k)._2.length))
      k += 1
    }
    c(LongDotArgmax(e(vec), ids, flat, dim))
  }

  /** Clamped ×1e6 int64 embedding quantizer, shared by every
    * quantized-vector operator. Components clamp to ±256 BEFORE
    * scaling so the quantized domain is |q| ≤ 2.56e8 — every
    * downstream int64 combination stays exact (q² ≤ 6.6e16; a 64-dim
    * dot ≤ 4.2e18 < Long.Max) and both engines stay TOTAL functions:
    * without the clamp a pathological component (1e30f from a
    * corrupted upstream batch) saturates Spark's double→long cast to
    * Long.MaxValue while DuckDB's BIGINT cast raises — the twin
    * contract would diverge exactly when the data goes bad, and ANSI
    * long arithmetic downstream (q*q, qv*n) raises ARITHMETIC_OVERFLOW
    * mid-job (caught by AdversarialTextSpec). Real embedding
    * components are O(1); the clamp only ever engages on garbage.
    * Oracle mirror: CAST(floor(least(greatest(x, -256), 256) * 1e6)
    * AS BIGINT).
    */
  def quant6(x: Column): Column = {
    import org.apache.spark.sql.functions.{floor, greatest, least, lit}
    floor(least(greatest(x.cast(DoubleType), lit(-256.0)), lit(256.0)) * 1e6).cast(LongType)
  }

  /** [[quant6]] over a whole float-vector column — a single-pass
    * codegen'd kernel call per row (the transform(v, quant6) form
    * evaluates the lambda interpreted per element; on a 64-dim
    * embedding that is 64 interpreted expression-tree walks per row
    * in every quantized operator's hot path).
    */
  def quantVec(col: Column): Column = c(QuantVec(e(col)))

  /** See [[Expr.quant6]] / [[Kernels.quantVec]] for the clamp
    * contract; NaN components clamp to +256 (SQL least/greatest
    * ordering), matching both engines' SQL mirror.
    */
  /** One-pass sorted-run character entropy (see Kernels.charEntropy). */
  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "char_entropy"
    override def nullSafeEval(v: Any): Any =
      Kernels.charEntropy(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.charEntropy($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class QuantVec(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "quant_vec"
    override def nullSafeEval(v: Any): Any =
      Kernels.quantVec(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"$K.quantVec($a)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}
