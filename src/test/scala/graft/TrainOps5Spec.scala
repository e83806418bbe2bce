package graft

import graft.operators.TrainOps5
import org.scalatest.funsuite.AnyFunSuite

class TrainOps5Spec extends AnyFunSuite {
  import TestSpark._

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("t5").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", s"src${i % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // --- dedup_paragraph -------------------------------------------------

  /** Independent reference: plain-Scala window chunking + first-
    * occurrence keep over (doc_id, idx) order.
    */
  private def paraReference(texts: Seq[String]): Map[Long, (Long, Long, Long, Long, Long)] = {
    val w = TrainOps5.PARA_W
    val chunks = texts.zipWithIndex.flatMap { case (t, doc) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      toks.grouped(w).zipWithIndex.map { case (g, i) =>
        (doc.toLong, i.toLong, g.mkString(" "), g.length.toLong)
      }
    }
    val keeper = chunks.groupBy(_._3).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._2)).min
    }
    val perDoc = chunks.groupBy(_._1).map { case (doc, cs) =>
      val kept = cs.filter(c => keeper(c._3) == ((c._1, c._2)))
      val nTok = cs.map(_._4).sum
      val tokKept = kept.map(_._4).sum
      val ppm = if (nTok == 0) 0L else math.floor((nTok - tokKept) * 1000000.0 / nTok).toLong
      doc -> ((cs.size.toLong, (cs.size - kept.size).toLong, nTok, tokKept, ppm))
    }
    texts.indices.map(_.toLong).map(d => d -> perDoc.getOrElse(d, (0L, 0L, 0L, 0L, 0L))).toMap
  }

  test("dedup_paragraph: planted duplicate windows — counts match the independent reference") {
    // docs 0 and 1 share their first 10-token window verbatim; doc 2
    // repeats doc 0's window INSIDE itself; doc 3 is unique; doc 4 is
    // a short doc that is a full duplicate of doc 3's trailing partial
    // window; doc 5 is whitespace-only (0 tokens, 0 chunks).
    val w10 = "a b c d e f g h i j"
    val texts = Seq(
      s"$w10 k l m",
      s"$w10 x y z",
      s"p q r s t u v w aa bb $w10",
      "unique tokens only here two three four five six seven eight nine",
      "eight nine",
      "   ")
    val dir = writeDocs(texts)
    val want = paraReference(texts)
    val got = TrainOps5.dedupParagraph(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == want, s"\ngot:  ${got.toSeq.sortBy(_._1)}\nwant: ${want.toSeq.sortBy(_._1)}")
    // the planted duplicates actually removed something
    assert(got(1L)._2 == 1L, "doc 1 loses the shared leading window")
    assert(got(2L)._2 == 1L, "doc 2 loses its copy of doc 0's window")
    assert(got(0L)._2 == 0L, "doc 0 is the first occurrence and keeps all")
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L)), "empty doc reports zeros")
  }

  test("dedup_paragraph: sf corpus — removal accounting is globally consistent") {
    val rows = TrainOps5.dedupParagraph(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_removed <= n_chunks")
      assert(r.getLong(4) <= r.getLong(3), "tokens_kept <= n_tokens")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000)
    }
    // global identity: removed chunk count == occurrences - distinct chunks
    val totalChunks = rows.map(_.getLong(1)).sum
    val totalRemoved = rows.map(_.getLong(2)).sum
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), filter(split(coalesce(col("text"), lit("")), " "), x => x =!= lit("")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(explode(expr(
        s"transform(sequence(0, CAST(ceil(n / ${TrainOps5.PARA_W}.0) AS INT) - 1), i -> array_join(slice(toks, i * ${TrainOps5.PARA_W} + 1, ${TrainOps5.PARA_W}), ' '))")).as("chunk"))
    val distinctChunks = docs.select(col("chunk")).distinct().count()
    assert(totalRemoved == totalChunks - distinctChunks,
      s"removed=$totalRemoved chunks=$totalChunks distinct=$distinctChunks")
  }

  test("dedup_paragraph_apply: planted corpus — cleaned text keeps exactly the first-occurrence windows") {
    val w10 = "a b c d e f g h i j"
    val texts = Seq(
      s"$w10 k l m",
      s"$w10 x y z",
      s"p q r s t u v w aa bb $w10",
      "unique tokens only here two three four five six seven eight nine",
      "eight nine",
      "   ")
    val dir = writeDocs(texts)
    // independent reference: first-occurrence keep over (doc_id, idx),
    // surviving windows re-joined in order
    val w = TrainOps5.PARA_W
    val chunks = texts.zipWithIndex.flatMap { case (t, doc) =>
      t.split(" ").filter(_.nonEmpty).grouped(w).zipWithIndex.map {
        case (g, i) => (doc.toLong, i.toLong, g.mkString(" "), g.length.toLong)
      }
    }
    val keeper = chunks.groupBy(_._3).map { case (c, occ) => c -> occ.map(o => (o._1, o._2)).min }
    val want = texts.indices.map { doc =>
      val kept = chunks.filter(c => c._1 == doc && keeper(c._3) == ((c._1, c._2))).sortBy(_._2)
      (doc.toLong, kept.map(_._3).mkString(" "), kept.size.toLong, kept.map(_._4).sum)
    }
    val got = TrainOps5.dedupParagraphApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq.sortBy(_._1)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got(1)._2 == "x y z", "doc 1's duplicated leading window is cut from the text")
    assert(got(5)._2 == "" && got(5)._3 == 0L, "empty doc rebuilds to empty")
  }

  test("dedup_paragraph_apply agrees with dedup_paragraph's accounting on the sf corpus") {
    val report = TrainOps5.dedupParagraph(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) - r.getLong(2), r.getLong(4)))).toMap
    val applied = TrainOps5.dedupParagraphApply(spark, sf).collect()
    applied.foreach { r =>
      val (keptChunks, keptTokens) = report(r.getLong(0))
      assert(r.getLong(2) == keptChunks, s"doc ${r.getLong(0)} kept-chunk count")
      assert(r.getLong(3) == keptTokens, s"doc ${r.getLong(0)} kept-token count")
      val rebuiltTokens = r.getString(1).split(" ").count(_.nonEmpty).toLong
      assert(rebuiltTokens == keptTokens, s"doc ${r.getLong(0)} rebuilt text token count")
    }
  }

  // --- bm25_retrieval --------------------------------------------------

  /** Independent BM25 with the operator's exact op order and snap. */
  private def bm25Reference(texts: Seq[String]): Map[Long, Seq[(Long, Long, Long)]] = {
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t.split(" ").filter(_.nonEmpty).toSeq)
    }
    val n = docs.size.toLong
    val tTokens = docs.map(_._2.size.toLong).sum
    val avgdl = tTokens.toDouble / n
    val dfm = docs.flatMap { case (_, ts) => ts.distinct }.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    TrainOps5.BM25_QUERIES.map { case (qid, qtext) =>
      val terms = qtext.split(" ").toSeq
      val scored = docs.flatMap { case (doc, ts) =>
        val dl = ts.size.toLong
        val hits = terms.flatMap { term =>
          val tf = ts.count(_ == term).toLong
          if (tf == 0) None
          else {
            val df = dfm(term)
            val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            val w = idf * ((tf * (1.2 + 1.0)) / (tf + (1.2 * ((1.0 - 0.75) + ((0.75 * dl) / avgdl)))))
            Some(math.floor(w * 1e6 + 0.5).toLong)
          }
        }
        if (hits.isEmpty) None else Some((doc, hits.sum, hits.size.toLong))
      }
      qid -> scored.sortBy { case (d, sc, _) => (-sc, d) }.take(5)
        .map { case (d, sc, h) => (d, sc, h) }
    }.toMap
  }

  test("bm25_retrieval: planted corpus — top-5 matches the independent scorer") {
    val texts = Seq(
      "data query plan data data plan",
      "window merge batch window merge",
      "slow scan filter scan scan scan",
      "customer order line order",
      "stream join state join stream stream state",
      "hash group sort group",
      "data window slow customer stream hash",           // one term from each query
      "filler tokens with no overlap at all whatsoever", // never retrieved
      "query merge scan order join sort")                // second term from each
    val dir = writeDocs(texts)
    val want = bm25Reference(texts)
    val got = TrainOps5.bm25Retrieval(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      }
    assert(got.keySet == want.keySet.filter(want(_).nonEmpty))
    got.foreach { case (q, rs) =>
      assert(rs == want(q), s"query $q:\ngot:  $rs\nwant: ${want(q)}")
    }
  }

  test("rag_context_pack: budget prefix matches a driver-side recomputation from bm25 pairs") {
    val rows = TrainOps5.ragContextPack(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"query $q ranks")
      assert(sorted.length <= TrainOps5.RAG_CAND)
      // cum_tokens is the prefix sum of dl; included iff within budget
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(3)
        assert(r.getLong(4) == cum, s"query $q cum at rank ${r.getLong(1)}")
        assert(r.getBoolean(5) == (cum <= TrainOps5.RAG_BUDGET), s"query $q included flag")
      }
      // the included set is a prefix
      val inc = sorted.map(_.getBoolean(5))
      assert(!inc.zip(inc.tail).exists { case (a, b) => !a && b }, s"query $q prefix property")
    }
  }

  test("rag_context_pack: top-5 candidate order agrees with bm25_retrieval") {
    val bm25 = TrainOps5.bm25Retrieval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pack = TrainOps5.ragContextPack(spark, sf).collect()
      .filter(_.getLong(1) <= 5)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pack == bm25, "first five ranks of the pack are exactly the retrieval head")
  }

  // --- bm25_index --------------------------------------------------------

  test("bm25_index: driver-side bucket mirror matches Spark's md5 bucket for every query term") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val terms = TrainOps5.BM25_QUERIES.flatMap(_._2.split(" ")).distinct
    val sparkSide = terms.toDF("t")
      .select(col("t"), pmod(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"),
        lit(TrainOps5.BM25_BUCKETS.toLong)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      assert(TrainOps5.tokenBucketLocal(t) == sparkSide(t), s"bucket mismatch for '$t'")
    }
  }

  test("bm25_index: persisted index serves the identical ranking and PRUNES to the probed buckets") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_spec"
    TrainOps5.buildBm25Index(Tables.documents(spark, sf), path)
    // layout: one directory per bucket inside the build delta, bounded
    // by the bucket count
    val bucketDirs = new java.io.File(s"$path/delta_v0").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(bucketDirs.nonEmpty && bucketDirs.size <= TrainOps5.BM25_BUCKETS)
    val served = TrainOps5.queryBm25Index(spark, path)
    // STATIC pruning: the postings scan carries the bucket IN (...)
    // predicate as a PartitionFilter — directory elimination at plan
    // time, before any IO
    val plan = served.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("PartitionFilters") && l.contains("bucket")).getOrElse("")
    assert(scanLine.contains("bucket"),
      s"postings scan must prune on bucket; plan:\n$plan")
    val got = served.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val want = TrainOps5.bm25Retrieval(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, "index serve equals fresh retrieval")
    // the probed bucket set is a strict subset of the written buckets
    val probed = TrainOps5.BM25_QUERIES.flatMap(_._2.split(" "))
      .map(TrainOps5.tokenBucketLocal).distinct.toSet
    assert(probed.size < bucketDirs.size,
      s"probe set (${probed.size}) should be smaller than the layout (${bucketDirs.size})")
  }

  test("bm25_index_incr: build-then-append serves the identical ranking as one-shot build") {
    import org.apache.spark.sql.functions._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_incr_spec"
    val full = Tables.documents(spark, sf)
    // one-shot reference index
    TrainOps5.buildBm25Index(full, s"$base/full")
    val oneShot = TrainOps5.queryBm25Index(spark, s"$base/full").collect().toSeq
    // split build + append (with the batches-partition-docs check on)
    TrainOps5.buildBm25Index(full.filter(col("doc_id") % 7 =!= 3), s"$base/incr")
    TrainOps5.appendBm25Index(full.filter(col("doc_id") % 7 === 3), s"$base/incr",
      checkDisjoint = true)
    val incr = TrainOps5.queryBm25Index(spark, s"$base/incr").collect().toSeq
    def canon(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(canon(incr) == canon(oneShot), "append path diverged from rebuild")
    // the appended delta carries the same bucket partitioning
    val dirs = new java.io.File(s"$base/incr/delta_v1").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.size <= TrainOps5.BM25_BUCKETS)
    // committed stats are the additive scalars of both batches
    val stats = spark.read.parquet(s"$base/incr/stats_v1").collect()(0)
    val fullStats = spark.read.parquet(s"$base/full/stats_v0").collect()(0)
    assert(stats.getLong(0) == fullStats.getLong(0) && stats.getLong(1) == fullStats.getLong(1))
  }

  test("bm25 index commit protocol: serve during an in-flight append sees fully-old, commit flips to fully-new, retry is idempotent") {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_torn_spec"
    val full = Tables.documents(spark, sf)
    val oldBatch = full.filter(col("doc_id") % 7 =!= 3)
    val newBatch = full.filter(col("doc_id") % 7 === 3)
    TrainOps5.buildBm25Index(oldBatch, path)
    val preAppend = TrainOps5.queryBm25Index(spark, path).collect().toSeq
    // complete append, then simulate the failure window between the
    // delta write and the stats commit by deleting the stats dir: the
    // delta_v1 files are on disk but the version never committed
    TrainOps5.appendBm25Index(newBatch, path)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$path/stats_v1"))
    assert(new java.io.File(s"$path/delta_v1").exists(), "torn state: delta present")
    val torn = TrainOps5.queryBm25Index(spark, path).collect().toSeq
    assert(torn == preAppend,
      "a reader during an uncommitted append must see the fully-old index")
    // retry the append: delta_v1 is overwritten (idempotent), stats commit
    TrainOps5.appendBm25Index(newBatch, path)
    val committed = TrainOps5.queryBm25Index(spark, path).collect().toSeq
    val fresh = TrainOps5.bm25Retrieval(spark, sf).collect().toSeq
    assert(committed == fresh, "after the stats commit the serve is fully-new")
  }

  test("bm25 commit protocol: a multi-batch append chain serves every committed prefix exactly") {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_chain_spec"
    val full = Tables.documents(spark, sf).filter(col("doc_id") < 350)
    def slice(i: Int) = full.filter(col("doc_id") % 5 === i)
    // build = batch 0, then four appends -> versions 1..4 (exercises
    // multi-delta version discovery and union reads past v1)
    TrainOps5.buildBm25Index(slice(0), path)
    (1 to 4).foreach { i =>
      TrainOps5.appendBm25Index(slice(i), path, checkDisjoint = true)
      assert(TrainOps5.committedVersion(path).contains(i))
      // serve over the committed prefix == one-shot build of that prefix
      val ref = s"$path-ref$i"
      TrainOps5.buildBm25Index(full.filter(col("doc_id") % 5 <= i), ref)
      val got = TrainOps5.queryBm25Index(spark, path).collect().toSeq
      val want = TrainOps5.queryBm25Index(spark, ref).collect().toSeq
      assert(got == want, s"after append $i the chain diverged from the one-shot build")
    }
  }

  test("bm25 df dictionary: committed df_vN equals a per-token recount of the committed postings at every version") {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_df_spec"
    val full = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    TrainOps5.buildBm25Index(full.filter(col("doc_id") % 3 === 0), path)
    TrainOps5.appendBm25Index(full.filter(col("doc_id") % 3 =!= 0), path,
      checkDisjoint = true)
    val view = TrainOps5.openBm25View(spark, path)
    assert(view.version == 1)
    val want = view.postings.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = view.dfreq.select(col("token"), col("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, "dictionary must be exactly the per-token posting count")
    assert(got.nonEmpty && got.values.forall(_ >= 1L))
  }

  test("compactBm25Index: serve identical before/after, subsumed deltas retired, append and re-compact keep working") {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_compact_spec"
    val full = Tables.documents(spark, sf).filter(col("doc_id") < 350)
    def slice(i: Int) = full.filter(col("doc_id") % 5 === i)
    TrainOps5.buildBm25Index(slice(0), path)
    (1 to 3).foreach(i => TrainOps5.appendBm25Index(slice(i), path, checkDisjoint = true))
    val before = TrainOps5.queryBm25Index(spark, path).collect().toSeq
    TrainOps5.compactBm25Index(spark, path)
    val after = TrainOps5.queryBm25Index(spark, path).collect().toSeq
    assert(after == before, "compaction changed serve output")
    // layout: delta roots retired, one committed compact at v3, bounded
    // at one file per bucket
    val rootNames = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(rootNames == Set("compact_v3", "df_v3", "stats_v3"),
      s"compaction must retire subsumed deltas AND superseded df/stats: $rootNames")
    assert(new java.io.File(s"$path/compact_v3/_SUCCESS").exists())
    val bucketDirs = new java.io.File(s"$path/compact_v3").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty && bucketDirs.length <= TrainOps5.BM25_BUCKETS)
    bucketDirs.foreach { b =>
      val parts = b.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${b.getName}: ${parts.length} files after compaction")
    }
    // append AFTER compaction: reader unions compact_v3 + delta_v4 and
    // the chain still equals a one-shot build of the whole corpus
    TrainOps5.appendBm25Index(slice(4), path, checkDisjoint = true)
    val ref = s"$path-ref"
    TrainOps5.buildBm25Index(full, ref)
    assert(TrainOps5.queryBm25Index(spark, path).collect().toSeq ==
      TrainOps5.queryBm25Index(spark, ref).collect().toSeq,
      "post-compaction append diverged from one-shot build")
    // second compaction consolidates compact_v3 + delta_v4 into
    // compact_v4 and retires both
    TrainOps5.compactBm25Index(spark, path)
    val names2 = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(names2.contains("compact_v4") && !names2.contains("compact_v3")
      && !names2.exists(_.startsWith("delta_v")), s"re-compaction layout: $names2")
    assert(TrainOps5.queryBm25Index(spark, path).collect().toSeq ==
      TrainOps5.queryBm25Index(spark, ref).collect().toSeq)
  }

  test("grace-period compaction: subsumed roots survive for in-flight readers until vacuum ages them out") {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_grace_spec"
    val full = Tables.documents(spark, sf).filter(col("doc_id") < 300)
    TrainOps5.buildBm25Index(full.filter(col("doc_id") % 3 === 0), path)
    TrainOps5.appendBm25Index(full.filter(col("doc_id") % 3 =!= 0), path,
      checkDisjoint = true)
    // a long-running reader resolves its roots BEFORE the compact lands
    val preCompactView = TrainOps5.openBm25View(spark, path)
    val preCompactServe = TrainOps5.queryBm25Index(spark, path).collect().toSeq
    TrainOps5.compactBm25Index(spark, path, retireGraceMs = 60 * 60 * 1000L)
    val names = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(Set("delta_v0", "delta_v1", "df_v0", "stats_v0").subsetOf(names),
      s"grace compaction must not delete subsumed roots: $names")
    assert(names.contains("compact_v1"))
    assert(new java.io.File(s"$path/delta_v0/_RETIRED").exists()
      && new java.io.File(s"$path/stats_v0/_RETIRED").exists(),
      "subsumed roots must carry retirement markers")
    // the in-flight reader's already-resolved plan still executes
    // against the retired roots — the point of deferred deletion
    assert(preCompactView.postings.count() > 0)
    // NEW readers resolve only the live compact — serve output unchanged
    assert(TrainOps5.queryBm25Index(spark, path).collect().toSeq == preCompactServe)
    // vacuum cannot void the grace the compactor promised: the marker
    // records it, and a caller grace of 0 is overridden by the
    // recorded 1h — nothing is deleted
    assert(TrainOps5.vacuumBm25Index(path, 0L).isEmpty,
      "vacuum must honor the retirement-time grace, not just the caller's")
    assert(TrainOps5.vacuumBm25Index(path, 60 * 60 * 1000L).isEmpty)
    assert(new java.io.File(s"$path/delta_v0").exists())
    // re-mark with a 1 ms grace (test-only rewrite of the markers) and
    // let it elapse: vacuum now deletes exactly the retired set
    val (fs, root) = {
      val p = new org.apache.hadoop.fs.Path(path)
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }
    Seq("delta_v0", "delta_v1", "df_v0", "stats_v0").foreach { n =>
      val d = new org.apache.hadoop.fs.Path(root, n)
      fs.delete(new org.apache.hadoop.fs.Path(d, "_RETIRED"), false)
      graft.operators.IndexMaintenance.retire(fs, d, 1L)
    }
    Thread.sleep(10)
    val deleted = TrainOps5.vacuumBm25Index(path, 0L).toSet
    assert(deleted == Set("delta_v0", "delta_v1", "df_v0", "stats_v0"),
      s"vacuumed: $deleted")
    val names2 = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(names2 == Set("compact_v1", "df_v1", "stats_v1"),
      s"post-vacuum layout: $names2")
    assert(TrainOps5.queryBm25Index(spark, path).collect().toSeq == preCompactServe)
  }

  test("buildBm25Index refuses to clear a directory holding non-index entries") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("bm25guard").toString
    Files.writeString(Paths.get(s"$dir/precious_data.csv"), "do,not,delete\n")
    val e = intercept[IllegalArgumentException] {
      TrainOps5.buildBm25Index(Tables.documents(spark, sf).limit(5), dir)
    }
    assert(e.getMessage.contains("refusing to clear"))
    assert(Files.exists(Paths.get(s"$dir/precious_data.csv")),
      "the guard must leave foreign files untouched")
  }

  test("bm25 commit protocol resolves through an explicit file: URI (Hadoop FileSystem, not java.io)") {
    import org.apache.spark.sql.functions._
    val path = "file:" + s"${System.getProperty("java.io.tmpdir")}/graft_bm25_uri_spec"
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    TrainOps5.buildBm25Index(docs.filter(col("doc_id") % 2 === 0), path)
    TrainOps5.appendBm25Index(docs.filter(col("doc_id") % 2 === 1), path,
      checkDisjoint = true)
    assert(TrainOps5.committedVersion(path).contains(1))
    val ref = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_uri_ref"
    TrainOps5.buildBm25Index(docs, ref)
    assert(TrainOps5.queryBm25Index(spark, path).collect().toSeq ==
      TrainOps5.queryBm25Index(spark, ref).collect().toSeq,
      "file:-URI index serves identically to the local-path index")
  }

  test("bm25 append: checkDisjoint rejects a batch that re-ingests indexed doc_ids") {
    import org.apache.spark.sql.functions._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bm25_dup_spec"
    val full = Tables.documents(spark, sf)
    TrainOps5.buildBm25Index(full.filter(col("doc_id") < 100), path)
    val overlapping = full.filter(col("doc_id") < 50) // already indexed
    val e = intercept[IllegalArgumentException] {
      TrainOps5.appendBm25Index(overlapping, path, checkDisjoint = true)
    }
    assert(e.getMessage.contains("double-count"))
    // the rejected batch committed nothing: still at version 0
    assert(TrainOps5.committedVersion(path).contains(0))
  }

  test("clearIndexState contract: after an in-place corpus rewrite the memoized bm25_index must not serve the stale build") {
    import spark.implicits._
    // two corpora at the SAME path whose top-1 doc for a bm25 query
    // differs: corpus A makes doc 0 the 'data query plan' hit, corpus B
    // hands it to doc 1
    val dir = java.nio.file.Files.createTempDirectory("t5swap").toString
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    write(Seq("data query plan data query plan", "filler tokens only"))
    val before = graft.SparkEntry.queries("bm25_index")(spark, dir).collect().toSeq
    // in-place rewrite + the exact invalidation trio ScaleData's
    // writers run (Dedup + Similarity + TrainOps5)
    write(Seq("filler tokens only", "data query plan data query plan"))
    graft.operators.Dedup.invalidateCorpusSizes()
    graft.operators.Similarity.clearTrainedState()
    graft.operators.TrainOps5.clearIndexState()
    val after = graft.SparkEntry.queries("bm25_index")(spark, dir).collect().toSeq
    assert(before != after, "post-rewrite serve must reflect the new corpus, not the memo")
    val fresh = TrainOps5.bm25Retrieval(spark, dir).collect().toSeq
    assert(after == fresh, "post-invalidation serve equals fresh retrieval on the new corpus")
  }

  // --- text_lm_bigram ---------------------------------------------------

  /** Independent add-one bigram LM on plain Scala collections. */
  private def bigramReference(texts: Seq[String]): Map[Long, (Long, Long, Long)] = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.split(" ").filter(_.nonEmpty).toSeq) }
    val pairs = docs.flatMap { case (d, ts) => ts.zip(ts.drop(1)).map(p => (d, p._1, p._2)) }
    val c2 = pairs.groupBy(p => (p._2, p._3)).map { case (k, g) => k -> g.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val v = docs.flatMap(_._2).distinct.size.toLong
    docs.map { case (d, _) =>
      val mine = pairs.filter(_._1 == d)
      val micros = mine.map { case (_, w1, w2) =>
        math.floor(math.log((c1(w1) + v).toDouble / (c2((w1, w2)) + 1L)) * 1e6 + 0.5).toLong
      }
      val s = micros.sum
      d -> ((mine.size.toLong, s, if (mine.isEmpty) 0L else s / mine.size))
    }.toMap
  }

  test("text_lm_bigram: planted corpus matches the independent add-one bigram LM") {
    val texts = Seq(
      "a b a b a c",      // repeated bigram (a,b) is cheap; (a,c) rare
      "a b",              // single common pair -> low surprisal
      "x y z q",          // all-singleton bigrams -> high surprisal
      "loner",            // one token -> zero pairs
      "")                 // empty -> zero pairs
    val dir = writeDocs(texts)
    val want = bigramReference(texts)
    val got = TrainOps5.textLmBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"\ngot:  ${got.toSeq.sortBy(_._1)}\nwant: ${want.toSeq.sortBy(_._1)}")
    assert(got(3L) == ((0L, 0L, 0L)) && got(4L) == ((0L, 0L, 0L)))
    // the all-singleton doc is strictly more surprising than the common-pair doc
    assert(got(2L)._3 > got(1L)._3, "rare bigrams score higher surprisal")
  }

  test("text_lm_bigram: sf corpus — mean is the integer quotient and surprisal is positive") {
    val rows = TrainOps5.textLmBigram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, sum, mean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (np == 0) assert(sum == 0 && mean == 0)
      else {
        assert(sum > 0, s"doc ${r.getLong(0)}: smoothed surprisal is strictly positive")
        assert(mean == sum / np)
      }
    }
  }

  // --- quality_classifier ----------------------------------------------

  test("quality_classifier: planted corpus matches a driver-side scoring of the frozen model") {
    val texts = Seq(
      "the a of and to in is the a of",                       // stopword-heavy
      "alpha beta gamma delta epsilon zeta eta theta",        // all distinct, no stopwords
      "x x x x x x x x x x x x",                              // degenerate repetition
      "")                                                     // empty
    val dir = writeDocs(texts)
    val (w0, w1, w2, w3, w4) = TrainOps5.QC_W
    val ws = Seq(w0, w1, w2, w3, w4).map(_.toDouble)
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ts = t.split(" ").filter(_.nonEmpty)
      val n = ts.length.toLong
      val (ml, sr, dr) =
        if (n == 0) (0.0, 0.0, 0.0)
        else (ts.map(_.length.toLong).sum.toDouble / n,
          ts.count(TrainOps5.QC_STOPWORDS.contains).toDouble / n,
          ts.distinct.length.toDouble / n)
      val z = ((ws(0) + (ws(1) * n)) + (ws(2) * ml)) + ((ws(3) * sr) + (ws(4) * dr))
      val sc = math.floor((1.0 / (1.0 + math.exp(-z))) * 1e6 + 0.5).toLong
      (i.toLong, n, math.floor(ml * 1e6 + 0.5).toLong, math.floor(sr * 1e6 + 0.5).toLong,
        math.floor(dr * 1e6 + 0.5).toLong, sc, sc >= 500000L)
    }
    val got = TrainOps5.qualityClassifier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))).toSeq.sortBy(_._1)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("bm25_retrieval: sf corpus — ranks contiguous, scores non-increasing, hits bounded") {
    val rows = TrainOps5.bm25Retrieval(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    val nTerms = TrainOps5.BM25_QUERIES.toMap.view.mapValues(_.split(" ").length).toMap
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq, s"query $q ranks")
      assert(sorted.length <= 5)
      val scores = sorted.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"query $q scores")
      sorted.foreach { r =>
        assert(r.getLong(4) >= 1 && r.getLong(4) <= nTerms(q), s"query $q n_terms_hit")
        assert(r.getLong(3) > 0, s"query $q positive score")
      }
    }
  }
}
