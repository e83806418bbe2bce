package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class IndexSpec extends AnyFunSuite {
  import TestSpark._

  private val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_spec"

  test("persisted IVF index matches in-memory IVF recall and layout") {
    val corpus = Tables.embeddings(spark, sf)
    val (nCent, nProbe) = Similarity.buildIvfIndex(corpus, path)
    assert(nCent >= 16 && nProbe >= 2)
    // corpus is laid out as one directory per cell at the committed
    // version root
    val cv = Similarity.committedCorpusVersion(spark, path).get
    val cells = new java.io.File(s"$path/corpus_v$cv").listFiles()
      .filter(_.getName.startsWith("cent_id=")).length
    assert(cells > 0 && cells <= nCent)
    val qs = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = Similarity.queryIvfIndex(spark, path, qs, nProbe, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = Similarity.annBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"persisted-index recall@10 $recall below 0.9")
  }

  /** A corpus with real cluster structure — the case IVF exists for
    * (the sf testdata is adversarially isotropic, where low probe
    * fractions are information-theoretically insufficient and
    * calibration honestly climbs instead): `nClusters` well-separated
    * unit directions in 64-d, `members` each, 10% relative noise.
    * Builds the index, asserts the calibrated probe fraction stays
    * ≤ 10% of cells, and checks recall@10 ≥ 0.9 against the exact
    * broadcast top-k.
    */
  private def clusteredCorpus(nClusters: Int, members: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(42L)
    val dim = 64
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = for {
      c <- centers.indices
      m <- 0 until members
    } yield {
      val v = centers(c).map(x => x + 0.1 * rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      ((c.toLong * members + m).toLong, v.map(x => (x / n).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def clusteredCase(nClusters: Int, members: Int, tag: String): Unit = {
    val corpus = clusteredCorpus(nClusters, members)
    val cpath = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_clustered_$tag"
    val (nCent, nProbe) = Similarity.buildIvfIndex(corpus, cpath)
    assert(nProbe <= math.ceil(0.1 * nCent).toInt,
      s"[$tag] calibrated nProbe $nProbe exceeds 10% of $nCent cells on clustered data")
    val qs = corpus.filter(col("vec_id") % members === 0).limit(8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val got = Similarity.queryIvfIndex(spark, cpath, qs, nProbe, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = graft.plans.TopK.topKPerGroup(
        corpus.crossJoin(broadcast(qs))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"),
            graft.functions.Expr.dotProduct(col("qvec"), col("embedding")).as("cosine")),
        Seq("query_id"), Seq(("cosine", true), ("vec_id", false)), 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"[$tag] clustered-index recall@10 $recall below 0.9 at nProbe $nProbe")
  }

  test("clustered corpus: calibrated probe fraction <= 10% of cells at recall@10 >= 0.9") {
    clusteredCase(40, 50, "1x")
  }

  test("10x clustered corpus: probe fraction and recall guarantees hold at scale") {
    // the 10× point of the same geometry (400 clusters × 50 members =
    // 20 000 vectors): nCent grows as 2√n, and both the ≤10% probe
    // fraction and the recall bar must survive the scale-up — the
    // scale-stability claim behind ann_ivf_index
    clusteredCase(400, 50, "10x")
  }

  /** ann_ivf_index_incr losslessness gate: append-then-serve must
    * EXACTLY equal a fresh whole-corpus assignment under the SAME
    * frozen centroids. The reference index copies the incr build's
    * centroids and assigns the whole corpus in one appendIvfIndex pass
    * (append into an empty corpus dir IS the assignment pass), so any
    * divergence is an append bug — never k-means nondeterminism.
    */
  private def losslessCase(corpus: org.apache.spark.sql.DataFrame, tag: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    val ipath = s"${System.getProperty("java.io.tmpdir")}/graft_ivfi_spec_$tag"
    val rpath = s"${System.getProperty("java.io.tmpdir")}/graft_ivfi_ref_$tag"
    rm(new java.io.File(ipath)); rm(new java.io.File(rpath))
    val (_, nProbe) = Similarity.buildIvfIndex(corpus.filter(col("vec_id") % 7 =!= 3), ipath)
    Similarity.appendIvfIndex(corpus.filter(col("vec_id") % 7 === 3), ipath)
    val centSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "cent_id BIGINT, cvec ARRAY<FLOAT>")
    spark.read.schema(centSchema).parquet(s"$ipath/centroids")
      .write.parquet(s"$rpath/centroids")
    Similarity.appendIvfIndex(corpus, rpath)
    val qs = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def serve(p: String) = Similarity.queryIvfIndex(spark, p, qs, nProbe, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
      .toSet
    assert(serve(ipath) == serve(rpath),
      s"[$tag] frozen-quantizer append diverged from fresh whole-corpus assignment")
  }

  test("ann_ivf_index_incr: frozen-quantizer append is lossless at 1x") {
    losslessCase(Tables.embeddings(spark, sf), "1x")
  }

  test("ann_ivf_index_incr: frozen-quantizer append is lossless at the 10x clustered corpus") {
    losslessCase(clusteredCorpus(400, 50), "10x")
  }

  test("eval_retrieval metrics equal a driver-side recomputation from the two graded heads") {
    val truth = Similarity.queries("ann_quantized")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val cand = Similarity.queries("ann_lsh_exact")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("rank")))
    val got = Similarity.evalRetrieval(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byQ = truth.groupBy(_._1)
    assert(got.keySet == byQ.keySet)
    byQ.foreach { case (q, ts) =>
      val nTruth = ts.size.toLong
      val rel = cand.filter(c => c._1 == q && truth((c._1, c._2)))
      val nHit = rel.size.toLong
      val rr = if (rel.isEmpty) 0L else 1000000L / rel.map(_._3).min
      val recall = nHit * 1000000L / nTruth
      assert(got(q) == ((nTruth, nHit, recall, rr)),
        s"query $q: got ${got(q)}, want (${nTruth}, $nHit, $recall, $rr)")
    }
  }

  test("compactIvfIndex: serve identical before/after; cells coalesce back to one file after many appends") {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    val cpath = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_compact_spec"
    rm(new java.io.File(cpath))
    val corpus = Tables.embeddings(spark, sf)
    val (_, nProbe) = Similarity.buildIvfIndex(corpus.filter(col("vec_id") % 7 === 0), cpath)
    // three separate appends -> up to 4 files per touched cell
    (1 to 6).grouped(2).foreach { g =>
      Similarity.appendIvfIndex(
        corpus.filter(col("vec_id") % 7 === g.head || col("vec_id") % 7 === g.last), cpath)
    }
    assert(Similarity.committedCorpusVersion(spark, cpath).contains(0),
      "build commits corpus_v0")
    val someCell = new java.io.File(s"$cpath/corpus_v0").listFiles()
      .filter(_.getName.startsWith("cent_id="))
    assert(someCell.nonEmpty)
    assert(someCell.map(_.listFiles().count(_.getName.endsWith(".parquet"))).max > 1,
      "precondition: appends produced multi-file cells")
    val qs = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def serve() = Similarity.queryIvfIndex(spark, cpath, qs, nProbe, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
      .toSet
    val before = serve()
    // ONLINE compaction: a reader that resolved corpus_v0 before the
    // compact keeps a scannable root under the retirement grace period
    // (1 ms here so the deletion path is testable without waiting; the
    // marker-enforcement path is covered in TrainOps5Spec)
    val preCompactRoot = s"$cpath/corpus_v0"
    Similarity.compactIvfIndex(spark, cpath, retireGraceMs = 1L)
    assert(serve() == before, "compaction changed serve output")
    assert(Similarity.committedCorpusVersion(spark, cpath).contains(1),
      "compaction commits corpus_v1 and retires v0")
    assert(new java.io.File(s"$preCompactRoot/_RETIRED").exists(),
      "subsumed corpus version carries the retirement marker")
    assert(new java.io.File(preCompactRoot).exists(),
      "grace-period compaction must leave the old root for in-flight serves")
    val cells = new java.io.File(s"$cpath/corpus_v1").listFiles()
      .filter(_.getName.startsWith("cent_id="))
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val parts = c.listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts == 1, s"${c.getName}: $parts files after compaction")
    }
    // vacuum inside the caller's grace window keeps the retired root;
    // past both graces (marker 1 ms, caller 0) the root goes and serve
    // is unchanged
    assert(Similarity.vacuumIvfIndex(spark, cpath, 60 * 60 * 1000L).isEmpty)
    Thread.sleep(10)
    assert(Similarity.vacuumIvfIndex(spark, cpath, 0L) == Seq("corpus_v0"))
    assert(!new java.io.File(preCompactRoot).exists())
    assert(serve() == before, "serve must be unchanged after vacuum")
    // appends keep working against the compacted version (and a
    // zero-row append must still resolve the live root, not throw)
    Similarity.appendIvfIndex(corpus.limit(0), cpath)
    assert(Similarity.committedCorpusVersion(spark, cpath).contains(1))
  }

  test("eval_retrieval_ivf grades the persisted exact-IVF head; metrics recompute from its own serve") {
    val got = Similarity.queries("eval_retrieval_ivf")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == (0L until 5L).toSet)
    got.values.foreach { case (nTruth, nHit, recall, rr) =>
      assert(nTruth == 10L, "truth is the exact int64 top-10")
      assert(nHit >= 0 && nHit <= nTruth)
      assert(recall == nHit * 1000000L / nTruth)
      assert(rr >= 0 && rr <= 1000000L)
    }
    // driver-side recomputation from the two heads it composes
    val truth = Similarity.queries("ann_quantized")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfx_" +
      sf.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    val qs = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    val cand = Similarity.queryIvfExactIndex(spark, path, qs).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"), r.getAs[Long]("rank")))
    truth.groupBy(_._1).foreach { case (q, ts) =>
      val rel = cand.filter(c => c._1 == q && truth((c._1, c._2)))
      val rr = if (rel.isEmpty) 0L else 1000000L / rel.map(_._3).min
      assert(got(q) == ((ts.size.toLong, rel.size.toLong,
        rel.size.toLong * 1000000L / ts.size, rr)), s"query $q metric mismatch")
    }
  }

  test("exact-IVF serve plan prunes cent_id partitions dynamically, like the float head") {
    // ensure the memoized index exists at the key's path
    Similarity.queries("eval_retrieval_ivf")(spark, sf).count()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfx_" +
      sf.replaceAll("[^A-Za-z0-9._-]", "_") + "_" + ProcessHandle.current().pid()
    val qs = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    val plan = Similarity.queryIvfExactIndex(spark, path, qs)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"exact-IVF probe must prune cent_id partitions:\n${plan.take(2000)}")
    assert(plan.contains("long_dot_product"), "scoring must be the codegen'd kernel")
  }

  test("exact-IVF index shares the versioned corpus lifecycle: build commits corpus_v0, compact/vacuum serve-identical") {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    val xpath = s"${System.getProperty("java.io.tmpdir")}/graft_ivfx_lifecycle_spec"
    rm(new java.io.File(xpath))
    val emb = Tables.embeddings(spark, sf)
    Similarity.buildIvfExactIndex(emb.filter(col("vec_id") % 7 =!= 3), xpath)
    assert(Similarity.committedCorpusVersion(spark, xpath).contains(0),
      "exact build bootstraps corpus_v0 under the same commit protocol")
    assert(!new java.io.File(s"$xpath/corpus").exists(),
      "no legacy unversioned corpus root")
    Similarity.appendIvfExactIndex(emb.filter(col("vec_id") % 7 === 3), xpath)
    assert(Similarity.committedCorpusVersion(spark, xpath).contains(0),
      "appends land inside the committed version")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    def serve() = Similarity.queryIvfExactIndex(spark, xpath, qs).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id")))
      .toSet
    val before = serve()
    assert(before.nonEmpty)
    // no schema argument: compaction infers the exact-head layout
    // (vec_id, cv, cent_id) from the committed footers — the caller
    // can't corrupt the rewrite by describing the wrong head
    Similarity.compactIvfIndex(spark, xpath, retireGraceMs = 1L)
    assert(Similarity.committedCorpusVersion(spark, xpath).contains(1))
    assert(serve() == before, "compaction changed exact-head serve output")
    Thread.sleep(10)
    assert(Similarity.vacuumIvfIndex(spark, xpath, 0L) == Seq("corpus_v0"))
    assert(serve() == before, "serve must be unchanged after vacuum")
    // a rebuild replaces the whole versioned history, leaving exactly
    // one live version (stale-root shadowing is the failure this
    // layout exists to prevent)
    Similarity.buildIvfExactIndex(emb, xpath)
    assert(Similarity.committedCorpusVersion(spark, xpath).contains(0))
    assert(new java.io.File(xpath).listFiles()
      .count(_.getName.matches("corpus_v\\d+")) == 1)
  }

  test("index probe plan uses dynamic partition pruning on cent_id") {
    val qs = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val plan = Similarity.queryIvfIndex(spark, path, qs, 4, 10)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"probe scan must prune cent_id partitions dynamically:\n${plan.take(2000)}")
  }
}
