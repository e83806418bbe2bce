package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainOps3

class TrainOps3Spec extends AnyFunSuite {
  import TestSpark._

  test("dedup_substring: one row per ≥8-token doc, ppm bounded, dups found") {
    val rows = TrainOps3.dedupSubstring(spark, sf).collect()
    val want = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 8).count()
    assert(rows.length == want)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "dup spans ⊆ spans")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000)
    }
    assert(rows.map(_.getLong(2)).sum > 0, "synthetic corpus has duplicated spans")
  }

  test("dedup_span_apply: maximal spans, keeper survives verbatim, accounting cross-checks dedup_substring") {
    val rows = TrainOps3.dedupSpanApply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.nonEmpty)
    // per-doc internal accounting: clean text has exactly n - removed
    // tokens; spans only exist where tokens were removed, and each
    // maximal span cuts >= SPAN_W tokens (a cut is a union of 8-wide
    // shingle covers)
    rows.foreach { case (id, (clean, n, removed, spans)) =>
      val cleanToks = clean.split(" ").filter(_.nonEmpty).length.toLong
      assert(cleanToks == n - removed, s"doc $id token accounting")
      assert((removed > 0) == (spans > 0), s"doc $id span/removal mismatch")
      assert(removed >= spans * TrainOps3.SPAN_W,
        s"doc $id: $spans maximal spans but only $removed tokens cut")
    }
    assert(rows.values.map(_._3).sum > 0, "corpus has duplicated spans to cut")
    // cross-check vs dedup_substring (same 8-gram geometry, but raw
    // split tokens there vs filtered here — compare only docs whose
    // token counts agree): a doc reported fully clean must lose
    // nothing, and removals are bounded by 8 x its duplicated-shingle
    // count (the APPLY face can never cut more than the REPORT covers)
    val sub = TrainOps3.dedupSubstring(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    var compared = 0
    sub.foreach { case (id, (nSpans, nDup)) =>
      rows.get(id).filter(_._2 == nSpans + TrainOps3.SPAN_W - 1).foreach {
        case (_, _, removed, _) =>
          compared += 1
          if (nDup == 0) assert(removed == 0L, s"doc $id: clean in report, cut in apply")
          assert(removed <= nDup * TrainOps3.SPAN_W,
            s"doc $id: removed $removed exceeds 8x duplicated shingles $nDup")
      }
    }
    assert(compared > 0, "cross-check compared no documents")
    // first occurrence keeps its text: the keeper doc of some
    // duplicated gram must still contain that gram verbatim
    val removedTotal = rows.values.map(_._3).sum
    val dupTotal = sub.values.map(_._2).sum
    assert(removedTotal < dupTotal * TrainOps3.SPAN_W,
      "keeper occurrences must survive — apply cut as much as if no keeper existed")
  }

  test("text_lm_rarity: mean lies in [min,max] token rarity, floor ≥ 1e6") {
    val rows = TrainOps3.textLmRarity(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (n, sum, mean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(mean >= 1000000L, "rarity T/c ≥ 1 → ppm ≥ 1e6")
      assert(mean * n <= sum && sum < (mean + 1) * n, "mean is floor(sum/n)")
    }
  }

  test("corpus_token_hist: coverage is monotone and ends at 100%") {
    val rows = TrainOps3.corpusTokenHist(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val cov = rows.map(_.getLong(4))
    assert(cov.toSeq == cov.sorted.toSeq, "cumulative coverage is monotone")
    if (rows.length < 50) // whole vocabulary fits → exact full coverage
      assert(cov.last == 1000000L)
  }

  test("dedup_incremental: statuses are consistent with the signature sets") {
    val rows = TrainOps3.dedupIncremental(spark, sf).collect()
    val batchIds = rows.map(_.getLong(0)).toSet
    assert(batchIds.forall(_ % 10 == 9))
    rows.foreach { r =>
      r.getString(1) match {
        case "unique"     => assert(r.isNullAt(2))
        case "dup_corpus" => assert(r.getLong(2) % 10 != 9, "matches a corpus doc")
        case "dup_batch"  => assert(r.getLong(2) % 10 == 9 && r.getLong(2) < r.getLong(0))
      }
    }
    assert(rows.exists(_.getString(1) != "unique"), "bag-of-words sigs collide by design")
  }

  test("pipe_quality_funnel: stages chain exactly (n_out == next n_in), all gates active") {
    val rows = TrainOps3.pipeQualityFunnel(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.head.getLong(2) == Tables.documents(spark, sf).count())
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(2), "stage k survivors feed stage k+1")
    }
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3) + r.getLong(4), "in = dropped + out")
      assert(r.getLong(3) > 0, s"gate ${r.getString(1)} must be active on this corpus")
    }
  }

  test("eval_split: partitions the corpus, shares near 90/5/5, assignment is id-stable") {
    val rows = TrainOps3.evalSplit(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "splits partition the corpus")
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") * 5 && byName("train") > byName("test") * 5)
    // stability: re-evaluating yields the identical assignment
    val again = TrainOps3.evalSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == byName)
  }

  test("bpe_pair_counts: ranks are dense, counts monotone, pairs are 2 chars") {
    val rows = TrainOps3.bpePairCounts(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts == counts.sorted(Ordering[Long].reverse))
    assert(rows.forall(_.getString(1).length == 2))
  }

  test("embed_dim_stats: 64 dims, n = corpus size, moments bounded by unit quantization") {
    val rows = TrainOps3.embedDimStats(spark, sf).collect()
    assert(rows.length == 64)
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(4) >= -1000000L && r.getLong(5) <= 1000000L)
      // sum_sq aggregates in DECIMAL(38,0) (no wrap) but EMITS double
      // so the typed hash matches DuckDB's materialization
      val sumSq = r.getDouble(3)
      assert(sumSq >= 0 && sumSq <= n.toDouble * 1e12)
    }
  }

  test("dedup_semantic_keep: keepers dominate their dropped docs and are never dropped by them") {
    val rows = TrainOps3.dedupSemanticKeep(spark, sf).collect()
    assert(rows.nonEmpty)
    val chars = Tables.documents(spark, sf)
      .join(Tables.embeddings(spark, sf), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val droppedBy = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (doc, keep) = (r.getLong(0), r.getLong(1))
      assert(chars(keep) > chars(doc) ||
        (chars(keep) == chars(doc) && keep < doc), "keeper must dominate")
      assert(r.getLong(2) >= TrainOps3.SEMANTIC_THRESH)
      assert(droppedBy.get(keep) != Some(doc), "no two-cycle: keeper not dropped by its doc")
    }
  }

  test("knn/semantic oracle SQL mirrors the md5-hashed sub-split key") {
    // ADVICE r5 (high): dedup_semantic_keep's oracle kept a raw
    // `vec_id % ceil(...)` split after the Spark side moved to the
    // md5-hashed key — engine and oracle then disagree on (label, sub)
    // blocks exactly when a label exceeds KNN_BLOCK_CAP. Lock both
    // oracles to the shared idSubSql helper so the drift is structural
    // (a future edit to one side fails here, not at the driver gate).
    Seq("knn_graph", "dedup_semantic_keep").foreach { k =>
      val sql = SparkEntry.oracleSql(k)
      assert(sql.contains(TrainOps3.idSubSql),
        s"$k oracle SQL does not embed the md5-hashed idSubSql split")
      assert(!sql.contains("vec_id % CAST(ceil"),
        s"$k oracle SQL still splits on the raw vec_id modulo")
    }
  }

  test("idSub bounds a >512-vector label with STRIDED ids (raw modulo would collapse)") {
    val spark2 = spark
    import spark2.implicits._
    // 2000 same-label vectors with ids strided by 16: a raw
    // vec_id % 4 puts all of them in one residue class; the md5 key
    // must spread them across all 4 sub-blocks with multinomial
    // balance (mean 500, cap-adjacent max)
    val ids = (0 until 2000).map(_.toLong * 16)
    val subs = ids.toDF("vec_id").withColumn("lsz", lit(2000L))
      .withColumn("sub", TrainOps3.idSub(col("lsz")))
      .groupBy(col("sub")).agg(count(lit(1)).as("sz")).collect()
    assert(subs.length == 4, s"expected 4 sub-blocks, got ${subs.length}")
    val mx = subs.map(_.getLong(1)).max
    assert(mx <= (TrainOps3.KNN_BLOCK_CAP * 1.25).toLong,
      s"hash split degenerated: max sub-block $mx")
  }

  test("knn_graph: 5 in-label edges per vector via TopKPerGroup; mutuality is symmetric") {
    val df = TrainOps3.knnGraph(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "top-5 must run through the bounded-heap physical operator")
    val rows = df.collect()
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.values.forall(_.length == 5))
    val edgeSet = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      assert(r.getBoolean(5) == edgeSet.contains((r.getLong(1), r.getLong(0))),
        "is_mutual ⇔ reverse edge kept")
    }
    assert(rows.exists(_.getBoolean(5)), "planted clusters produce mutual edges")
  }

  /** Independent word-level BPE on plain Scala strings/maps, with the
    * operator's exact semantics: (count desc, pair asc) argmax and the
    * two-pass padded literal replace (Java String.replace is the same
    * scan-forward non-overlapping replace Spark and DuckDB use).
    */
  private def bpeReference(words: Map[String, Long], k: Int): Seq[(Long, String, String, Long)] = {
    def padReplace(s: String, pair: String, merged: String): String = {
      val (pat, rep) = (" " + pair + " ", " " + merged + " ")
      (" " + s + " ").replace(pat, rep).replace(pat, rep).trim
    }
    var seqs = words.toSeq.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((s, f) <- seqs; a = s.split(" "); if a.length >= 2; i <- 0 until a.length - 1)
        counts(a(i) + " " + a(i + 1)) += f
      if (counts.isEmpty) done = true
      else {
        val (pair, c) = counts.toSeq.sortBy { case (p, n) => (-n, p) }.head
        val merged = pair.replace(" ", "")
        out += ((step.toLong, pair, merged, c))
        seqs = seqs.map { case (s, f) => (padReplace(s, pair, merged), f) }
        step += 1
      }
    }
    out.toSeq
  }

  test("bpe_train_merges: matches independent BPE on a planted corpus with ties and self-pair runs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpetrain").toString
    val texts = Seq(
      "lllll aab aab aab",          // 'l l' self-pair run + repeated word
      "banana bandana banana",      // tie-heavy pairs (an/na)
      "aab banana lllll",
      "zq zq zqzq")                 // short words, one 4-char
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val want = bpeReference(words, TrainOps3.BPE_MERGES)
    val got = TrainOps3.bpeTrainMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty)
  }

  test("bpe_tokenize: matches weighted-vocab tokenization under independently-trained merges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpetok").toString
    val texts = Seq(
      "lllll aab aab aab",
      "banana bandana banana",
      "aab banana lllll",
      "zq zq zqzq")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val merges = bpeReference(words, TrainOps3.BPE_MERGES)
    def padReplace(s: String, pair: String, merged: String): String = {
      val (pat, rep) = (" " + pair + " ", " " + merged + " ")
      (" " + s + " ").replace(pat, rep).replace(pat, rep).trim
    }
    val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, f) <- words) {
      var s = w.toCharArray.mkString(" ")
      for ((_, pair, merged, _) <- merges) s = padReplace(s, pair, merged)
      for (t <- s.split(" ")) counts(t) += f
    }
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(25)
    val got = TrainOps3.bpeTokenize(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty)
  }

  test("bpe_tokenize: sf corpus — 25 rows, counts non-increasing, tokens distinct and non-empty") {
    val rows = TrainOps3.bpeTokenize(spark, sf).collect()
    assert(rows.length == 25)
    val cs = rows.map(_.getLong(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, cs.mkString(","))
    val toks = rows.map(_.getString(0))
    assert(toks.distinct.length == toks.length)
    assert(toks.forall(t => t.nonEmpty && !t.contains(" ")))
  }

  test("bpe_apply_batch: held-out batch with true OOV matches an independent train/serve run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpeapply").toString
    // doc_ids 0,1,2,4,5,6 train (id % 7 != 3); doc 3 and doc 10 are the
    // batch. Doc 3 contains 'zz' and 'qqq' whose chars never occur in
    // training -> every emitted token is OOV; 'aab' is in-vocab.
    val rows = Seq(
      (0L, "aab aab aab banana", "src0"),
      (1L, "banana bandana aab", "src0"),
      (2L, "aab banana banana", "src1"),
      (3L, "zz qqq aab", "src0"),           // batch
      (4L, "bandana aab aab", "src1"),
      (5L, "aab banana", "src1"),
      (6L, "banana banana aab", "src0"),
      (10L, "aab banana", "src1"))           // batch (10 % 7 = 3)
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // independent train on the complement
    val trainWords = rows.filter(_._1 % 7 != 3).flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val merges = bpeReference(trainWords, TrainOps3.BPE_MERGES)
    def padReplace(s: String, pair: String, merged: String): String = {
      val (pat, rep) = (" " + pair + " ", " " + merged + " ")
      (" " + s + " ").replace(pat, rep).replace(pat, rep).trim
    }
    def applyAll(w: String): Seq[String] = {
      var s = w.toCharArray.mkString(" ")
      for ((_, pair, merged, _) <- merges) s = padReplace(s, pair, merged)
      s.split(" ").toSeq
    }
    val vocab = trainWords.keys.flatMap(applyAll).toSet
    val batch = rows.filter(_._1 % 7 == 3)
    val want = batch.groupBy(_._3).map { case (src, docs) =>
      val words = docs.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      val toks = words.flatMap(applyAll)
      val oov = toks.count(!vocab.contains(_)).toLong
      (src, words.size.toLong, toks.size.toLong,
        toks.size.toLong * 1000000L / words.size, oov,
        if (toks.isEmpty) 0L else oov * 1000000L / toks.size)
    }.toSeq.sortBy(_._1)
    val got = TrainOps3.bpeApplyBatch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the planted OOV actually fires
    assert(got.find(_._1 == "src0").get._5 > 0, "zz/qqq emit OOV tokens")
    assert(got.find(_._1 == "src1").get._5 == 0, "in-vocab batch doc has zero OOV")
  }

  test("bpe_apply_batch: sf corpus — fertility within [1, 1e7] ppm, OOV bounded by token count") {
    val rows = TrainOps3.bpeApplyBatch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nt, fert, oov, oovppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nw > 0 && nt >= nw, "merging never splits below one token per word")
      assert(fert == nt * 1000000L / nw)
      assert(oov >= 0 && oov <= nt)
      assert(oovppm == (if (nt == 0) 0L else oov * 1000000L / nt))
    }
  }

  test("bpe_train_merges: sf corpus — contiguous ranks, non-increasing counts, merged = pair sans space") {
    val rows = TrainOps3.bpeTrainMerges(spark, sf).collect()
    assert(rows.length == TrainOps3.BPE_MERGES, "sf corpus never exhausts 6 merges")
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    rows.foreach { r =>
      assert(r.getString(2) == r.getString(1).replace(" ", ""))
      assert(r.getLong(3) > 0)
    }
    // the chosen count can never rise: merging only removes occurrences
    // of existing pairs, and a new pair's count is bounded by the count
    // of the merge that created its symbol
    val cs = rows.map(_.getLong(3))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, cs.mkString(","))
    // distinct merged symbols (each merge consumes its pair)
    assert(rows.map(_.getString(2)).distinct.length == rows.length)
  }
}
