package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Expr
import graft.operators.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.Row

  test("dedup_exact groups identical normalized text") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, "Hello   world"), (2L, "hello world"), (3L, "different doc")
    ).toDF("doc_id", "text")
    val grouped = df.groupBy(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n")).toMap
    assert(grouped(1L) == 2L) // docs 1+2 collapse
    assert(grouped(3L) == 1L)
  }

  test("minhash signature: identical arrays → identical sigs; est_jaccard 1.0") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Tuple1(Array("a b c", "b c d", "c d e"))).toDF("sh")
    val sig = df.select(Expr.minhashSignature(col("sh"), 64).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(sig.length == 64)
    val sig2 = df.select(Expr.minhashSignature(col("sh"), 64).as("sig"))
      .collect()(0).getSeq[Long](0)
    assert(sig == sig2, "minhash must be deterministic")
  }

  test("md5_poly_fingerprint matches the independently-computed reference value") {
    val spark2 = spark
    import spark2.implicits._
    // 410211799 = Horner fold of md5-hex[:15] % (2^31-1) over the
    // tokens of "hello world foo" with base 1000003, computed outside
    // both engines (python hashlib)
    val got = Seq("hello world foo").toDF("text")
      .select(Expr.md5PolyFingerprint(split(col("text"), " ")).as("fp"))
      .collect()(0).getLong(0)
    assert(got == 410211799L, s"got $got")
    // order sensitivity: a permutation must not collide
    val perm = Seq("foo world hello").toDF("text")
      .select(Expr.md5PolyFingerprint(split(col("text"), " ")).as("fp"))
      .collect()(0).getLong(0)
    assert(perm != got)
  }

  test("md5 kernel properties: bounds, permutation sensitivity, engine-edge inputs") {
    val spark2 = spark
    import spark2.implicits._
    val texts = Seq("", "one", "a b", "a a a", "x " * 50 + "y",
      (1 to 40).map(i => s"tok$i").mkString(" "))
    val df = texts.toDF("text").select(
      Expr.md5PolyFingerprint(split(col("text"), " ")).as("fp"),
      Expr.md5Simhash60(split(col("text"), " ")).as("sh"))
    df.collect().foreach { r =>
      val fp = r.getLong(0)
      assert(fp >= 0L && fp < 2147483647L, s"fingerprint out of field: $fp")
      val sh = r.getLong(1)
      assert(sh >= 0L && (sh >> 60) == 0L, s"simhash uses bits past 60: $sh")
    }
    // all six inputs map to distinct fingerprints (no trivial collapse)
    val fps = df.collect().map(_.getLong(0)).toSet
    assert(fps.size == texts.size)
    // simhash is order-INsensitive, fingerprint order-SENSITIVE
    val pair = Seq(("a b c d", "d c b a")).toDF("t1", "t2").select(
      Expr.md5Simhash60(split(col("t1"), " ")) === Expr.md5Simhash60(split(col("t2"), " ")),
      Expr.md5PolyFingerprint(split(col("t1"), " ")) === Expr.md5PolyFingerprint(split(col("t2"), " ")))
      .collect()(0)
    assert(pair.getBoolean(0), "md5 simhash must be a bag-of-tokens hash")
    assert(!pair.getBoolean(1), "md5 fingerprint must be order-sensitive")
  }

  test("sig_agree_count matches the zip_with formulation") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 7L))).toDF("a", "b")
    val r = df.select(
      Expr.sigAgree(col("a"), col("b")).as("k"),
      size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), p => p)).as("z"))
      .collect()(0)
    assert(r.getAs[Int]("k") == 2 && r.getAs[Int]("z") == 2)
  }

  test("dedup_simhash_exact stars planted exact duplicates at the representative") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("simex").toString
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "an entirely different document about unrelated topics here"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupSimhashExact(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming")))
    assert(pairs.toSet.intersect(Set((1L, 2L, 0), (1L, 3L, 0))) == Set((1L, 2L, 0), (1L, 3L, 0)),
      s"identical docs must star at doc 1: ${pairs.mkString(",")}")
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 3L),
      "member-member pair must be elided (closure via the star)")
    Dedup.releaseCaches(blocking = true)
  }

  test("md5 minhash kernel matches an independent BigInt reimplementation") {
    val spark2 = spark
    import spark2.implicits._
    val texts = Seq("alpha beta gamma delta epsilon", "a b", "", "x y z w")
    val got = texts.toDF("text")
      .select(Expr.md5MinhashSig(Expr.trigramShingles(col("text")), 64).as("sig"))
      .collect().map(_.getSeq[Long](0).toArray)
    val P = BigInt("2305843009213693951") // 2^61 - 1
    def shinglesOf(s: String): Seq[String] = {
      val w = s.split(" ", -1)
      (if (w.length < 3) Seq(w.mkString(" "))
       else w.sliding(3).map(_.mkString(" ")).toSeq).distinct
    }
    val want = texts.map { s =>
      val hs = shinglesOf(s).map { g =>
        val dig = java.security.MessageDigest.getInstance("MD5").digest(g.getBytes)
        BigInt(1, dig.take(8)) >> 4 // top 60 bits = first 15 hex chars
      }
      (0 until 64).map { i =>
        val a = BigInt(i + 1) * BigInt(2654435761L)
        val b = BigInt(i) * 40503 + BigInt(2166136261L)
        hs.map(h => ((a * h + b) mod P).toLong).min
      }.toArray
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.toSeq == w.toSeq, s"signature mismatch on input $i")
    }
  }

  test("dedup_minhash_exact stars identical docs and gates like the xxhash plan") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mhex").toString
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, base),
      (4L, base.replace("tok50", "CHANGED")),
      (5L, "an entirely different document about unrelated topics written here today"))
      .toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.dedupMinhashExact(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("est_jaccard")))
    // identical docs 2,3 star at representative 1 with est 1.0
    assert(rows.count(p => p._1 == 1L && (p._2 == 2L || p._2 == 3L) && p._3 == 1.0) == 2,
      s"identical docs must star at doc 1: ${rows.mkString(",")}")
    assert(!rows.exists(p => p._1 == 2L && p._2 == 3L),
      "member-member pair must be elided (closure via the star)")
    // the one-token-changed near-dup bands with the representative
    assert(rows.exists(p => p._1 == 1L && p._2 == 4L && p._3 > 0.5),
      s"near-dup must surface via banding: ${rows.mkString(",")}")
    assert(!rows.exists(p => p._2 == 5L || p._1 == 5L),
      "unrelated doc must not pair")
    Dedup.releaseCaches(blocking = true)
  }

  test("dedup_ngram_jaccard_exact verifies exactly the exact-twin candidate pairs") {
    val cand = Dedup.dedupMinhashExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Dedup.dedupNgramJaccardExact(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == cand,
      "verify stage must keep the candidate set 1:1")
    rows.foreach { r =>
      val j = r.getDouble(3)
      assert(j >= 0.0 && j <= 1.0, s"jaccard out of range: $j")
    }
    // signature-identical pairs are near-dups, not necessarily exact:
    // a changed shingle that never wins a slot min leaves the whole
    // signature intact — assert they sit in the near-dup band instead
    val star = rows.filter(_.getDouble(2) == 1.0)
    assert(star.nonEmpty && star.forall(_.getDouble(3) >= 0.5),
      s"sig-identical pairs must verify as near-dups: ${star.map(_.getDouble(3)).mkString(",")}")
    Dedup.releaseCaches(blocking = true)
  }

  test("dedup_minhash finds a planted near-duplicate pair") {
    val spark2 = spark
    import spark2.implicits._
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok50", "CHANGED") // one token of 100 changed
    val docs = Seq((1L, base), (2L, nearDup), (3L, "completely unrelated text with nothing shared here at all"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("dedup_test_docs")
    // run the same pipeline on a temp dir by writing parquet
    val dir = java.nio.file.Files.createTempDirectory("dedupspec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupMinhash(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("est_jaccard")))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.5 },
      s"planted near-dup not found: ${pairs.mkString(",")}")
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L },
      "unrelated doc must not pair")
  }

  test("simhash of near-identical docs has small hamming distance") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1 to 100).map(i => s"tok$i").toArray
    val b = a.updated(50, "CHANGED")
    val df = Seq((a, b)).toDF("ta", "tb")
    val ham = df.select(Expr.hamming64(Expr.simhash64(col("ta")), Expr.simhash64(col("tb"))).as("h"))
      .collect()(0).getInt(0)
    assert(ham <= 16, s"hamming $ham too large for 1% token change")
  }

  test("clusterPairs assigns min-id labels across chains") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = Dedup.clusterPairs(pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusterPairs converges on a long chain (pointer-jump rounds)") {
    val spark2 = spark
    import spark2.implicits._
    // 30-node path graph: diameter 29 exercises the geometric jump —
    // plain 2-hop rounds would exhaust the default hop budget
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(labels.size == 30)
    assert(labels.values.forall(_ == 0L), s"chain not fully collapsed: $labels")
  }

  test("dedup_cluster_exact clusters every jaccard-block pair together") {
    val pairs = Dedup.dedupJaccardBlock(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val labels = Dedup.dedupClusterExact(spark, sf).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
    assert(pairs.nonEmpty || labels.isEmpty)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // every cluster label is a member of its own cluster (canonical min)
    labels.values.toSet.foreach((l: Long) => assert(labels(l) == l))
  }

  test("dedup_embedding pairs are ordered by cosine desc") {
    val rows = Dedup.dedupEmbedding(spark, sf).collect()
    assert(rows.nonEmpty)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.sameElements(cos.sorted(Ordering[Double].reverse)))
    assert(cos.forall(c => c <= 1.0001 && c >= -1.0001))
  }

  test("pipe_dedup_e2e: one disposition per doc, canonical chain well-formed") {
    val rows = Dedup.pipeDedupE2e(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length == n.toInt, "exactly one disposition row per document")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == n.toInt)
    val status = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    rows.foreach { r =>
      val canon = r.getAs[Long]("canonical")
      r.getAs[String]("status") match {
        case "kept" => assert(canon == r.getAs[Long]("doc_id"))
        case "near_dup" => assert(status(canon) == "kept",
          s"near_dup canonical $canon must be kept, was ${status(canon)}")
        case "exact_dup" => assert(status(canon) != "exact_dup",
          s"exact_dup canonical $canon must be a survivor")
      }
    }
  }

  test("bandedEmbeddingPairs collapses identical vectors to a star, not a clique") {
    val spark2 = spark
    import spark2.implicits._
    // 3000 bit-identical vectors share every band bucket AND the same
    // sub-split (sub is a function of the vector) — the one shape the
    // cap cannot break. The collapse must keep candidates linear.
    val dup = (0 until 3000).map(i => (i.toLong, Array.fill(64)(0.5f)))
    val others = (0 until 10).map(i =>
      (3000L + i, Array.tabulate(64)(j => ((i * 64 + j) % 97) / 97.0f)))
    val df = (dup ++ others).toDF("vec_id", "embedding")
    val pairs = Dedup.bandedEmbeddingPairs(df, 3010L).collect()
    assert(pairs.length < 4000,
      s"${pairs.length} candidate pairs — identical-vector clique not collapsed")
    val star = pairs.filter(r => r.getLong(0) == 0L && r.getLong(1) < 3000L)
    assert(star.length == 2999, s"star carried ${star.length}/2999 members")
  }

  test("dedup_embedding_exact stars planted duplicate vectors at the representative") {
    val spark2 = spark
    import spark2.implicits._
    // plant a corpus where the collapse path actually runs (cnt > 1):
    // ids 100..119 all carry vector 0's embedding
    val src = graft.Tables.embeddings(spark, sf).select("vec_id", "embedding", "label")
    val v0 = src.filter(col("vec_id") === 0L).select("embedding", "label")
    val dups = (100 until 120).map(i => v0.select(lit(i.toLong).as("vec_id"),
      col("embedding"), col("label"))).reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("emb_exact_star").toString
    src.filter(col("vec_id") < 100).unionByName(dups)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Dedup.dedupEmbeddingExact(spark, dir).collect()
    val starPairs = rows.filter(r => r.getAs[Long]("vec_a") == 0L && r.getAs[Long]("vec_b") >= 100L)
    assert(starPairs.length == 20, s"${starPairs.length}/20 duplicates attached to rep 0")
    // identical vectors score the self-dot, the maximum for the group,
    // and member-member pairs must NOT appear (star, not clique)
    val selfDot = starPairs.map(_.getAs[Long]("qdot")).distinct
    assert(selfDot.length == 1)
    assert(!rows.exists(r => r.getAs[Long]("vec_a") >= 100L && r.getAs[Long]("vec_b") >= 100L))
  }

  test("dedup_embedding_exact: md5 plane signs anchored; qdot is the exact quantized dot") {
    // md5('e0_1_2')[:15] = '461ecd36c29dc6a' (python hashlib, outside
    // both engines) — low bit 0 → sign -1; DuckDB derives the same.
    assert(Dedup.md5Sign("e0_1_2") == -1L)
    val rows = Dedup.dedupEmbeddingExact(spark, sf).collect()
    assert(rows.nonEmpty)
    val dots = rows.map(_.getAs[Long]("qdot"))
    assert(dots.sameElements(dots.sorted(Ordering[Long].reverse)))
    // the reported score must equal an independent driver-side
    // requantization of the pair — no hidden FP path anywhere
    val top = rows.head
    val ids = Seq(top.getAs[Long]("vec_a"), top.getAs[Long]("vec_b"))
    val e = graft.Tables.embeddings(spark, sf)
      .where(col("vec_id").isin(ids: _*))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    def q(v: Seq[Float]) = v.map(x => math.floor(x.toDouble * 1e6).toLong)
    val expect = q(e(ids.head)).zip(q(e(ids(1)))).map { case (x, y) => x * y }.sum
    assert(expect == top.getAs[Long]("qdot"))
  }

  test("ann_lsh_exact: ranked integer scores; rank contiguous per query") {
    val rows = Similarity.annLshExact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).sameElements(1L to rs.length.toLong))
      val dots = sorted.map(_.getAs[Long]("qdot"))
      assert(dots.sameElements(dots.sorted(Ordering[Long].reverse)), s"query $q not ranked")
      assert(rs.length <= 10)
    }
  }

  test("ann_bruteforce returns k neighbors per query, ranked") {
    val rows = Similarity.annBruteforce(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q: ${rs.length} neighbors")
      val cos = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.sameElements(cos.sorted(Ordering[Double].reverse)))
    }
  }

  test("ann_ivf recall@10 >= 0.9 vs bruteforce with trained centroids") {
    val exact = Similarity.annBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"ivf recall@10 $recall below 0.9")
  }

  test("multiprobe masks widen to hamming-2 past 10 planes") {
    assert(Similarity.probeMasks(8).length == 9)            // 1 + 8
    val p14 = Similarity.probeMasks(14)
    assert(p14.length == 1 + 14 + 14 * 13 / 2)
    assert(p14.distinct.length == p14.length)
    assert(p14.forall(m => java.lang.Long.bitCount(m) <= 2))
  }

  test("ivf geometry scales as sqrt(n) and lsh planes as log(n)") {
    assert(Similarity.ivfCells(2000L) == 90)   // 2*ceil(sqrt(2000))
    assert(Similarity.ivfCells(50L) == 16)     // floor
    assert(Similarity.ivfCells(100_000_000L) == 4096) // cap
    assert(Dedup.planesFor(2000L) == 8)              // floor at small corpora
    val p20x = Dedup.planesFor(2000L * 1000)         // 1000x corpus
    assert(p20x > 8 && p20x <= 16, s"planes $p20x should grow with log(n)")
    // expected bucket population stays bounded as n grows
    assert(2000L * 1000 / math.pow(2, p20x) <= 512)
  }

  test("dedup caches are reused across runs and released on demand") {
    // id-set deltas: other suites may hold their own caches in the
    // shared session, so only storage ADDED by these runs counts
    def ids = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    Dedup.releaseCaches(blocking = true)
    val baseline = ids
    Dedup.dedupMinhash(spark, sf).count()
    val afterFirst = ids
    Dedup.dedupMinhash(spark, sf).count()
    val grown = ids -- afterFirst
    assert(grown.isEmpty, s"repeat run must not add executor storage, added RDDs $grown")
    Dedup.releaseCaches(blocking = true)
    val leaked = ids -- baseline
    assert(leaked.isEmpty, s"releaseCaches must return all dedup storage, leaked RDDs $leaked")
  }

  test("ann_lsh results are a subset of bruteforce candidate space with correct scores") {
    val exact = Similarity.annBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cosine")).toMap
    val approx = Similarity.annLsh(spark, sf).collect()
    approx.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      // every LSH hit that is also a true top-10 must carry the same score
      exact.get(key).foreach { c => assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12) }
    }
  }
}
