package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row kernels invoked from generated code (a top-level
  * object gets Java static forwarders, so `Kernels.dotProduct(...)`
  * is directly callable from Janino-compiled code). Keeping the loops
  * here lets the expressions participate in whole-stage codegen
  * instead of falling back to interpreted eval.
  */
object Kernels {

  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i) * b.getFloat(i); i += 1 }
    dot
  }

  /** Exact int64 dot product of two pre-quantized long vectors (the
    * ann_quantized / knn_graph scoring loop — drift-free and
    * codegen'd, vs interpreted zip_with/aggregate lambdas).
    */
  def longDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var i = 0
    while (i < n) { dot += a.getLong(i) * b.getLong(i); i += 1 }
    dot
  }

  /** Positions where two long-array signatures agree — the minhash
    * est-jaccard numerator (codegen'd; zip_with/filter/size evaluates
    * its lambdas interpreted, per candidate pair).
    */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def minhash(arr: ArrayData, k: Int): ArrayData = {
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

  def simhash(arr: ArrayData): Long = {
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

  /** Sign-bit bucket of `vec` against `planes` (row-major
    * nPlanes × dim floats) — one pass over the vector per plane set,
    * replacing nPlanes separate dot-product expressions.
    */
  def hyperplaneBucket(vec: ArrayData, planes: Array[Float], dim: Int): Long = {
    val nPlanes = planes.length / dim
    val n = math.min(vec.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      val off = p * dim
      var i = 0
      while (i < n) { dot += vec.getFloat(i) * planes(off + i); i += 1 }
      if (dot > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Distinct 3-token shingles of a space-tokenized string, one pass.
    * Exactly equivalent to the declarative formulation
    * `array_distinct(transform(sequence(0, n-3), i -> concat_ws(' ',
    * slice(split(s, ' '), i+1, 3))))` (with the <3-token fallback to
    * the whole string), which Spark evaluates interpreted AND re-splits
    * the text once per shingle because higher-order-function lambdas
    * re-evaluate captured subtrees per element. Tokenization matches
    * `split(s, " ", -1)`: empty tokens from repeated spaces are kept;
    * distinct preserves first occurrence (order irrelevant to the set
    * math downstream, but kept deterministic).
    */
  def trigramShingles(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < 3) {
      seen.add(toks.mkString(" "))
    } else {
      var i = 0
      val sb = new java.lang.StringBuilder(64)
      while (i + 2 < toks.length) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Order-sensitive polynomial fingerprint over per-token md5 values
    * in mod-(2^31-1) arithmetic — the hash-gateable twin of
    * rollingHash (xxhash64-based). Each token's first 60 md5 bits
    * (15 hex chars) reduce mod P, then Horner-fold with base R; every
    * intermediate stays < 2^62, so DuckDB reproduces the exact value
    * in BIGINT list_reduce arithmetic.
    */
  def md5PolyFingerprint(arr: ArrayData): Long = {
    val P = 2147483647L
    val R = 1000003L
    val md = md5Digest.get()
    var acc = 0L
    var i = 0
    while (i < arr.numElements()) {
      md.reset()
      val dig =
        if (arr.isNullAt(i)) md.digest(Array.emptyByteArray)
        else md.digest(arr.getUTF8String(i).getBytes)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
      v >>>= 4 // first 15 hex chars = top 60 bits of the digest
      acc = (acc * R + (v % P)) % P
      i += 1
    }
    acc
  }

  /** 60-bit md5-vote simhash over DISTINCT tokens — the oracle-
    * reproducible twin of [[simhash]]: bit j of the signature is the
    * majority vote of bit j across each distinct token's first 60 md5
    * bits (15 hex chars, positive BIGINT in both engines). One per-row
    * pass replaces an explode + 60-aggregate shuffle: at corpus scale
    * the signature is computed where the text already is.
    */
  def md5Simhash60(arr: ArrayData): Long = {
    val md = md5Digest.get()
    val seen = new java.util.HashSet[UTF8String]()
    val votes = new Array[Int](60)
    var i = 0
    while (i < arr.numElements()) {
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      if (seen.add(s)) {
        md.reset()
        val dig = md.digest(s.getBytes)
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
        v >>>= 4 // first 15 hex chars = top 60 bits
        j = 0
        while (j < 60) {
          if (((v >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** 2^61 - 1, the Mersenne prime the md5-minhash slot hashes live in:
    * mod-P reduction is two shift-adds, and every intermediate of
    * (a·h + b) mod P fits a 127-bit signed product — so DuckDB
    * reproduces the exact value in HUGEINT arithmetic.
    */
  private val MH_P = 2305843009213693951L

  private def mod61(x: Long): Long = {
    val r = (x & MH_P) + (x >>> 61)
    if (r >= MH_P) r - MH_P else r
  }

  /** (a·h) mod (2^61-1), exact, via the unsigned 128-bit product.
    * Callers keep a < 2^38 and h < 2^60, so the signed/unsigned
    * distinction never bites (product < 2^98).
    */
  private def mulmod61(a: Long, h: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    // x = hi·2^64 + lo and 2^64 ≡ 8 (mod P)
    mod61(mod61(hi) * 8 + mod61(lo))
  }

  /** K-slot md5 minhash signature — the oracle-reproducible twin of
    * [[minhash]]. Each element hashes ONCE to its top 60 md5 bits
    * (15 hex chars — DuckDB: CAST(concat('0x', substr(md5(g),1,15))
    * AS BIGINT)); slot i takes the min over elements of the universal
    * hash ((i+1)·2654435761 · h + i·40503 + 2166136261) mod (2^61-1),
    * which DuckDB evaluates exactly in HUGEINT. One md5 per element
    * regardless of k, like the Kirsch–Mitzenmacher xxhash64 kernel.
    * Signature of the empty set is Long.MaxValue everywhere.
    */
  def md5MinhashSig(arr: ArrayData, k: Int): ArrayData = {
    val md = md5Digest.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      // skip nulls: DuckDB's md5(NULL) is NULL and MIN ignores it, and
      // the xxhash64 sibling kernel skips them too — hashing '' here
      // would silently break the bit-for-bit twin contract on any
      // caller that feeds null elements
      if (arr.isNullAt(i)) { i += 1 }
      else {
      val s = arr.getUTF8String(i)
      md.reset()
      val dig = md.digest(s.getBytes)
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (dig(j) & 0xffL); j += 1 }
      v >>>= 4 // first 15 hex chars = top 60 bits
      j = 0
      while (j < k) {
        val a = (j + 1).toLong * 2654435761L
        val b = j.toLong * 40503L + 2166136261L
        val x = mod61(mulmod61(a, v) + b)
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Clamped ×1e6 int64 quantization of a float vector, one pass.
    * Components clamp to ±256 before scaling (|q| ≤ 2.56e8) so every
    * downstream int64 combination stays exact and the oracle's BIGINT
    * cast is total — see Expr.quant6 for the full contract. The
    * equivalent transform(v, x -> cast(floor(least(greatest(...)))))
    * evaluates its lambda interpreted per ELEMENT; this kernel is one
    * codegen'd call per row.
    */
  def quantVec(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var x = arr.getFloat(i).toDouble
      // NaN: SQL least/greatest order NaN greater than every double in
      // BOTH engines, so least(greatest(NaN, -256), 256) = 256 — match
      // that, not Java's NaN-propagating Math.min/max
      if (java.lang.Double.isNaN(x) || x > 256.0) x = 256.0
      else if (x < -256.0) x = -256.0
      out(i) = math.floor(x * 1e6).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shannon entropy (bits) of a char array's value distribution in ONE
    * sorted-run pass: sort the per-char UTF8Strings (binary order —
    * array_sort's ordering), then flush a -p·log2(p) term at each run
    * boundary, ascending. The operation sequence matches the Column
    * formulation it replaces bit-for-bit — p = runLen.toDouble / n,
    * log2 as StrictMath.log(p)/StrictMath.log(2) (exactly Spark's
    * Log2), terms added left-to-right from 0.0 in sorted-distinct
    * order — while the cost drops from O(distinct·n) interpreted
    * lambda walks per row to one codegen'd O(n log n) call.
    */
  def charEntropy(chars: ArrayData): Double = {
    val n = chars.numElements()
    if (n == 0) return 0.0
    val arr = new Array[AnyRef](n)
    var i = 0
    while (i < n) { arr(i) = chars.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(arr)
    val nd = n.toDouble
    var acc = 0.0
    var run = 1L
    i = 1
    while (i <= n) {
      if (i == n || !arr(i).equals(arr(i - 1))) {
        val p = run.toDouble / nd
        acc += -p * (StrictMath.log(p) / StrictMath.log(2.0))
        run = 1L
      } else run += 1L
      i += 1
    }
    acc
  }

  /** Argmin codeword assignment of one long (sub)vector against a
    * driver-local codebook — the codegen'd replacement for the
    * broadcast-join + bounded-TopK assignment pass (one joined row per
    * (vector, codeword) candidate through join machinery and a heap,
    * for what is a pure per-row reduction). Semantics are bit-identical
    * to TopK over cost = |cw|² − 2·sv·cw ordered (cost ASC, code_id
    * ASC): same long arithmetic in the same element order as
    * [[longDot]], `ids(s)` sorted ascending so the strict `<` keeps the
    * lowest code_id on ties. `c2s` carries the per-codeword self-dot
    * (computed once driver-side — the round-15 broadcast-side hoist,
    * kept). Returns (code_id, cost); null when the subspace is out of
    * range or has no codewords (the join produced no row there).
    */
  def quantAssign(s: Int, sv: ArrayData, ids: Array[Array[Long]],
      cws: Array[Array[Long]], c2s: Array[Array[Long]],
      subd: Int): org.apache.spark.sql.catalyst.InternalRow = {
    if (s < 0 || s >= ids.length || ids(s).length == 0) return null
    val id = ids(s); val cw = cws(s); val c2 = c2s(s)
    val d = math.min(subd, sv.numElements())
    var best = Long.MaxValue; var bestId = 0L; var first = true
    var k = 0
    while (k < id.length) {
      val off = k * subd
      var dot = 0L
      var j = 0
      while (j < d) { dot += sv.getLong(j) * cw(off + j); j += 1 }
      val cost = c2(k) - 2L * dot
      if (first || cost < best) { best = cost; bestId = id(k); first = false }
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, best))
  }

  /** Argmax float-dot assignment of one embedding against a
    * driver-local centroid table — the cosine twin of [[quantAssign]]
    * for the IVF cell-assignment passes. Bit-identical to TopK over
    * cdist = dot(vec, cvec) ordered (cdist DESC, cent_id ASC): the dot
    * accumulates in the same element order as [[dotProduct]], ids
    * sorted ascending, and the comparison uses Double.compare so NaN
    * and -0.0 order exactly like Spark's double ordering. Returns
    * (cent_id, cdist); null when the centroid table is empty.
    */
  def dotArgmax(vec: ArrayData, ids: Array[Long], cvs: Array[Float],
      dim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    if (ids.length == 0) return null
    val d = math.min(dim, vec.numElements())
    var best = 0.0; var bestId = 0L; var first = true
    var k = 0
    while (k < ids.length) {
      val off = k * dim
      var dot = 0.0
      var j = 0
      while (j < d) { dot += vec.getFloat(j) * cvs(off + j); j += 1 }
      if (first || java.lang.Double.compare(dot, best) > 0) {
        best = dot; bestId = ids(k); first = false
      }
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, best))
  }

  /** Argmax long-dot assignment — the exact-arithmetic twin of
    * [[dotArgmax]] for the quantized (cv ARRAY<BIGINT>) IVF heads.
    * Bit-identical to TopK over cdot = longDot(cv, cvec) ordered
    * (cdot DESC, cent_id ASC). Returns (cent_id, cdot); null when the
    * centroid table is empty.
    */
  def longDotArgmax(vec: ArrayData, ids: Array[Long], cvs: Array[Long],
      dim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    if (ids.length == 0) return null
    val d = math.min(dim, vec.numElements())
    var best = 0L; var bestId = 0L; var first = true
    var k = 0
    while (k < ids.length) {
      val off = k * dim
      var dot = 0L
      var j = 0
      while (j < d) { dot += vec.getLong(j) * cvs(off + j); j += 1 }
      if (first || dot > best) { best = dot; bestId = ids(k); first = false }
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, best))
  }

  /** Blocked byte-domain fingerprint (mm_phash_dedup): the payload
    * splits into `blocks` equal byte ranges, each contributes the
    * HIGH NIBBLE of its md5's first byte (= the first hex char, the
    * oracle's substr(md5(block),1,1)), packed little-nibble-first.
    * Bit-identical to the declarative 15 × md5(substr(...)) expression
    * chain it replaces: same ceil-division block length, same
    * substr clamping (greatest(blen,1); past-end slice = empty bytes,
    * md5 of empty), same shift/sum packing — one kernel call instead
    * of 15 substring copies + 15 md5 expressions per row.
    */
  def phashSig(content: Array[Byte], blocks: Int): Long = {
    val md = md5Digest.get()
    val n = content.length
    val blen = (n + blocks - 1) / blocks
    var sig = 0L
    var i = 0
    while (i < blocks) {
      val start = i * blen
      val len = math.max(blen, 1)
      val from = math.min(start, n)
      val until = math.max(from, math.min(start + len, n))
      md.reset()
      val dig = md.digest(java.util.Arrays.copyOfRange(content, from, until))
      sig += ((dig(0) >> 4) & 0xf).toLong << (4 * i)
      i += 1
    }
    sig
  }

  /** Count of differing nibble blocks between two packed signatures —
    * the codegen'd form of the 15-term when-sum (same count).
    */
  def nibbleDiff(a: Long, b: Long, blocks: Int): Int = {
    var x = a ^ b
    var c = 0
    var i = 0
    while (i < blocks) { if ((x & 0xfL) != 0L) c += 1; x >>>= 4; i += 1 }
    c
  }

  def rollingHash(arr: ArrayData): Long = {
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
}
