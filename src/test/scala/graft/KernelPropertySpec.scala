package graft

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

/** Property-based tests over the pure per-row kernels in
  * [[graft.functions.Kernels]] — the codegen'd hot loops every dedup /
  * ANN / fingerprint operator ultimately rides on. These run WITHOUT a
  * SparkSession (the kernels take raw ArrayData/UTF8String), so
  * hundreds of generated cases cost milliseconds, and they pin the
  * ALGEBRAIC laws the distributed plans silently assume:
  *
  *  - minhash signatures are slot-wise mins ⇒ union/order/duplicate
  *    laws (exactly why map-side partial aggregation of signatures is
  *    sound at 100 TB);
  *  - simhash is a token-multiset vote ⇒ order invariance, and the
  *    md5 twin's distinct-token contract;
  *  - fingerprints obey their Horner recurrences ⇒ incremental /
  *    chunked computation agrees with whole-document computation;
  *  - bucket and similarity kernels respect the range and symmetry
  *    bounds the band-join capacity math depends on.
  *
  * Plain ScalaCheck (Prop + Test.check) rather than the scalatestplus
  * bridge, which isn't in the offline artifact cache.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, min: Int = 200): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(min)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).flatMap { base =>
      // mix in unicode + punctuation so UTF8String multi-byte paths run
      Gen.oneOf(base, base + "é", "räv" + base, base + "!", "字" + base)
    }
  private val tokens: Gen[List[String]] = Gen.listOf(token)
  private val someTokens: Gen[List[String]] = Gen.nonEmptyListOf(token)

  private def arr(ts: Seq[String]): ArrayData =
    new GenericArrayData(ts.map(t => if (t == null) null else UTF8String.fromString(t)).toArray[Any])

  private def longs(a: ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)

  private def strs(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  private def xx(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  private def md5Top60(s: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var v = 0L
    for (j <- 0 until 8) v = (v << 8) | (dig(j) & 0xffL)
    v >>> 4
  }

  private val P61 = 2305843009213693951L // 2^61 - 1

  // ---- minhash (xxhash64 Kirsch–Mitzenmacher kernel) ----------------

  test("minhash: signature of a union is the slot-wise min (partial-agg soundness)") {
    check(Prop.forAll(tokens, tokens) { (a: List[String], b: List[String]) =>
      val sa = longs(Kernels.minhash(arr(a), 16))
      val sb = longs(Kernels.minhash(arr(b), 16))
      val su = longs(Kernels.minhash(arr(a ++ b), 16))
      su == sa.zip(sb).map { case (x, y) => math.min(x, y) }
    })
  }

  test("minhash: order and duplicate invariance (set semantics)") {
    check(Prop.forAll(someTokens, Gen.long) { (a: List[String], seed: Long) =>
      val ref = longs(Kernels.minhash(arr(a), 16))
      val shuffled = new scala.util.Random(seed).shuffle(a)
      longs(Kernels.minhash(arr(shuffled), 16)) == ref &&
        longs(Kernels.minhash(arr(a ++ a), 16)) == ref
    })
  }

  test("minhash: null elements are skipped, empty input is all Long.MaxValue") {
    check(Prop.forAll(tokens) { a: List[String] =>
      val withNulls = a.flatMap(t => List(t, null))
      longs(Kernels.minhash(arr(withNulls), 16)) ==
        longs(Kernels.minhash(arr(a), 16))
    })
    assert(longs(Kernels.minhash(arr(Nil), 16)).forall(_ == Long.MaxValue))
  }

  test("sigAgree: reflexive = k, symmetric, bounded by min length") {
    check(Prop.forAll(someTokens, someTokens) { (a: List[String], b: List[String]) =>
      val sa = Kernels.minhash(arr(a), 32)
      val sb = Kernels.minhash(arr(b), 32)
      val ab = Kernels.sigAgree(sa, sb)
      Kernels.sigAgree(sa, sa) == 32 &&
        ab == Kernels.sigAgree(sb, sa) && ab >= 0 && ab <= 32
    })
  }

  // ---- md5 minhash twin ---------------------------------------------

  test("md5MinhashSig: same union/order/duplicate laws as the xxhash64 kernel") {
    check(Prop.forAll(tokens, tokens) { (a: List[String], b: List[String]) =>
      val sa = longs(Kernels.md5MinhashSig(arr(a), 8))
      val sb = longs(Kernels.md5MinhashSig(arr(b), 8))
      val su = longs(Kernels.md5MinhashSig(arr(a ++ b), 8))
      su == sa.zip(sb).map { case (x, y) => math.min(x, y) } &&
        longs(Kernels.md5MinhashSig(arr(a ++ a), 8)) == sa
    })
  }

  test("md5MinhashSig: slot values in [0, 2^61-1), exact vs BigInt universal-hash formula") {
    check(Prop.forAll(someTokens) { a: List[String] =>
      val sig = longs(Kernels.md5MinhashSig(arr(a), 8))
      // recompute slot mins from the documented formula in BigInt (the
      // oracle-side HUGEINT arithmetic) — the kernel's shift-add mod-61
      // tricks must agree exactly
      val expect = (0 until 8).map { j =>
        a.map { t =>
          val h = BigInt(md5Top60(t))
          val x = ((BigInt((j + 1).toLong * 2654435761L) * h) +
            BigInt(j.toLong * 40503L + 2166136261L)) mod BigInt(P61)
          x.toLong
        }.min
      }
      sig.forall(v => v >= 0L && v < P61) && sig == expect
    }, min = 100)
  }

  // ---- simhash ------------------------------------------------------

  test("simhash: order-invariant; singleton signature IS the token hash") {
    check(Prop.forAll(someTokens, Gen.long) { (a: List[String], seed: Long) =>
      val ref = Kernels.simhash(arr(a))
      val shuffled = new scala.util.Random(seed).shuffle(a)
      Kernels.simhash(arr(shuffled)) == ref
    })
    // one token: every bit's vote is ±1 with the sign of that hash bit
    check(Prop.forAll(token) { t: String =>
      Kernels.simhash(arr(List(t))) == xx(t)
    })
  }

  test("md5Simhash60: duplicate-invariant (distinct-token contract), 60-bit range, singleton = top-60 md5 bits") {
    check(Prop.forAll(someTokens, Gen.long) { (a: List[String], seed: Long) =>
      val ref = Kernels.md5Simhash60(arr(a))
      val shuffledDup = new scala.util.Random(seed).shuffle(a ++ a)
      (ref >>> 60) == 0L && Kernels.md5Simhash60(arr(shuffledDup)) == ref
    })
    check(Prop.forAll(token) { t: String =>
      Kernels.md5Simhash60(arr(List(t))) == md5Top60(t)
    })
  }

  // ---- fingerprints: Horner recurrences -----------------------------

  test("rollingHash: Horner law — appending a token folds its hash into the accumulator") {
    check(Prop.forAll(tokens, token) { (a: List[String], t: String) =>
      Kernels.rollingHash(arr(a :+ t)) ==
        Kernels.rollingHash(arr(a)) * 1099511628211L + xx(t)
    })
  }

  test("md5PolyFingerprint: Horner law in mod-(2^31-1) arithmetic, range [0, P)") {
    val P = 2147483647L
    check(Prop.forAll(tokens, token) { (a: List[String], t: String) =>
      val whole = Kernels.md5PolyFingerprint(arr(a :+ t))
      val prefix = Kernels.md5PolyFingerprint(arr(a))
      whole == (prefix * 1000003L + (md5Top60(t) % P)) % P &&
        whole >= 0L && whole < P
    })
  }

  // ---- shingling ----------------------------------------------------

  test("trigramShingles: exactly the distinct consecutive token triples (≥3 tokens), whole string below") {
    val spaceFree = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.listOf(spaceFree)) { toks: List[String] =>
      val joined = toks.mkString(" ")
      val got = strs(Kernels.trigramShingles(UTF8String.fromString(joined)))
      // mkString(Nil) is "" which split(" ",-1) re-tokenizes as one
      // empty token — mirror split semantics exactly
      val splitToks = joined.split(" ", -1).toList
      if (splitToks.length < 3) got == List(splitToks.mkString(" "))
      else got == splitToks.sliding(3).map(_.mkString(" ")).toList.distinct
    })
  }

  // ---- geometric kernels --------------------------------------------

  private val vec: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-5f, 5f))

  private def farr(v: Array[Float]): ArrayData = ArrayData.toArrayData(v)

  test("dotProduct / cosine: symmetry, cosine bounds, self-cosine = 1 for nonzero vectors") {
    check(Prop.forAll(vec, vec) { (a: Array[Float], b: Array[Float]) =>
      val fa = farr(a); val fb = farr(b)
      val c = Kernels.cosine(fa, fb)
      Kernels.dotProduct(fa, fb) == Kernels.dotProduct(fb, fa) &&
        c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 &&
        (!a.exists(_ != 0f) || math.abs(Kernels.cosine(fa, fa) - 1.0) < 1e-9)
    })
  }

  test("longDot: symmetric; self-dot is the exact sum of squares") {
    val lvec = Gen.containerOfN[Array, Long](8, Gen.chooseNum(-1000000L, 1000000L))
    check(Prop.forAll(lvec, lvec) { (a: Array[Long], b: Array[Long]) =>
      val fa = ArrayData.toArrayData(a); val fb = ArrayData.toArrayData(b)
      Kernels.longDot(fa, fb) == Kernels.longDot(fb, fa) &&
        Kernels.longDot(fa, fa) == a.map(x => x * x).sum
    })
  }

  test("quantVec: floor(x*1e6) in range, clamps to ±2.56e8, NaN/±Inf follow SQL least/greatest") {
    val anyFloat = Gen.oneOf(
      Gen.chooseNum(-300f, 300f),
      Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
        -0.0f, 0.0f, 1e30f, -1e30f, 255.9999f, -256.0001f))
    check(Prop.forAll(Gen.containerOfN[Array, Float](8, anyFloat)) { v: Array[Float] =>
      val got = longs(Kernels.quantVec(ArrayData.toArrayData(v)))
      val expect = v.map { f =>
        val x = f.toDouble
        // SQL least(greatest(x,-256),256): NaN orders greatest → +256
        val cl = if (x.isNaN || x > 256.0) 256.0 else math.max(x, -256.0)
        math.floor(cl * 1e6).toLong
      }.toSeq
      got == expect && got.forall(q => q >= -256000000L && q <= 256000000L)
    })
  }

  test("hyperplaneBucket: scale-invariant for positive scalars, range < 2^nPlanes") {
    val planes: Array[Float] = {
      val rnd = new scala.util.Random(7)
      Array.fill(10 * 8)(rnd.nextFloat() * 2f - 1f)
    }
    check(Prop.forAll(vec, Gen.chooseNum(0.1f, 100f)) { (v: Array[Float], c: Float) =>
      val b0 = Kernels.hyperplaneBucket(farr(v), planes, 8)
      val scaled = v.map(x => x * c)
      // scaling can only flip a sign through FP rounding when a plane
      // dot sits at 0 — assert invariance only when every dot is
      // comfortably nonzero
      val dots = (0 until 10).map { p =>
        (0 until 8).map(i => v(i).toDouble * planes(p * 8 + i)).sum
      }
      (b0 >>> 10) == 0L &&
        (!dots.forall(d => math.abs(d) > 1e-4) ||
          Kernels.hyperplaneBucket(farr(scaled), planes, 8) == b0)
    })
  }

  // --- round-11 kernels --------------------------------------------------

  /** The driver-side md5 bucket mirror (TrainOps5.tokenBucketLocal)
    * must agree with the Spark-side formula for ANY token, not just
    * the six static queries' terms — the pure-JVM mirror of Spark's
    * md5() + conv(hex,16,10) + pmod chain, checked here without a
    * session by re-deriving via BigInt.
    */
  test("bm25 token bucket: local mirror equals the conv(md5-prefix) % B definition") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expect = (BigInt(hex.substring(0, 15), 16) mod BigInt(graft.operators.TrainOps5.BM25_BUCKETS)).toLong
      graft.operators.TrainOps5.tokenBucketLocal(w) == expect
    })
  }

  /** BPE application safety: for ANY word and ANY merge table built
    * from it, folding the two-pass padded replaces never loses or
    * invents characters — concatenating the emitted tokens always
    * reconstructs the word. This is the invariant that makes
    * bpe_apply_batch's token accounting (fertility, OOV) trustworthy
    * regardless of which merges training produced.
    */
  test("charEntropy: equals the sorted-distinct -p·log2(p) fold; order-invariant; bounds") {
    val chars: Gen[List[String]] = Gen.listOf(
      Gen.oneOf("a", "b", "c", " ", "é", "字", "!", "0", " ", "😀"))
    check(Prop.forAll(chars) { cs =>
      val got = Kernels.charEntropy(arr(cs))
      // reference: the exact fold the Column formulation ran — terms in
      // sorted-distinct order (UTF8String binary order = code point
      // order for valid strings), StrictMath log ratio, left fold
      val n = cs.size.toDouble
      val want = cs.groupBy(identity).toSeq
        .sortBy(x => UTF8String.fromString(x._1))(
          Ordering.comparatorToOrdering(
            java.util.Comparator.naturalOrder[UTF8String]()))
        .foldLeft(0.0) { case (acc, (_, occ)) =>
          val p = occ.size.toDouble / n
          acc + -p * (StrictMath.log(p) / StrictMath.log(2.0))
        }
      val orderInv = Kernels.charEntropy(arr(scala.util.Random.shuffle(cs)))
      got == want && got == orderInv &&
        (cs.isEmpty || (got >= 0.0 &&
          got <= StrictMath.log(cs.distinct.size.toDouble) / StrictMath.log(2.0) + 1e-9))
    })
  }

  test("bpe padded-replace fold reconstructs the word for any merge chain") {
    def padReplace(s: String, pair: String, merged: String): String = {
      val (pat, rep) = (" " + pair + " ", " " + merged + " ")
      (" " + s + " ").replace(pat, rep).replace(pat, rep).trim
    }
    val genWord = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val gen = for {
      w <- genWord
      k <- Gen.choose(0, 6)
    } yield (w, k)
    check(Prop.forAll(gen) { case (w, k) =>
      // train k merges on the word itself (greedy argmax, operator tie-break)
      var seqs = List(w.toCharArray.mkString(" "))
      var merges = List.empty[(String, String)]
      var step = 0
      var done = false
      while (step < k && !done) {
        val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for (s <- seqs; a = s.split(" "); if a.length >= 2; i <- 0 until a.length - 1)
          counts(a(i) + " " + a(i + 1)) += 1L
        if (counts.isEmpty) done = true
        else {
          val (pair, _) = counts.toSeq.sortBy { case (p, n) => (-n, p) }.head
          merges :+= (pair, pair.replace(" ", ""))
          seqs = seqs.map(s => padReplace(s, pair, pair.replace(" ", "")))
          step += 1
        }
      }
      // apply the trained chain to the ORIGINAL word (serve side)
      var s = w.toCharArray.mkString(" ")
      for ((p, m) <- merges) s = padReplace(s, p, m)
      val tokens = s.split(" ").filter(_.nonEmpty)
      tokens.mkString("") == w && tokens.forall(_.nonEmpty)
    })
  }
}
