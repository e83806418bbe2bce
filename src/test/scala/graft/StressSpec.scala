package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Scale-behavior checks on the 20×/40× stress corpus. The stress
  * parquet is generated outside the repo (near-dup document clusters,
  * 40-copy embedding clusters); tests cancel cleanly when it is
  * absent so the suite stays green in a fresh checkout.
  */
class StressSpec extends AnyFunSuite {
  import TestSpark._

  private val stressDir = "/tmp/stress"
  private def haveStress = new java.io.File(s"$stressDir/embeddings.parquet").exists()

  test("capped hyperplane buckets stay bounded on the 40x near-dup corpus") {
    assume(haveStress, "stress corpus not generated")
    val e = Tables.embeddings(spark, stressDir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    assert(n >= 20000L)
    val sizes = Dedup.cappedBuckets(e, "embedding", n)
      .groupBy(col("bucket"), col("sub")).agg(count(lit(1)).as("sz"))
      .agg(max(col("sz")).as("mx"), count(lit(1)).as("groups")).collect()(0)
    // hard cap is 2048; near-dup clusters concentrate but must not
    // recreate an O(n) bucket
    assert(sizes.getAs[Long]("mx") <= 2048,
      s"max bucket ${sizes.getAs[Long]("mx")} exceeds cap")
    assert(sizes.getAs[Long]("groups") >= 64L, "buckets must actually spread")
  }

  test("banded embedding pairs recover planted near-dup clusters at 40x") {
    assume(haveStress, "stress corpus not generated")
    val e = Tables.embeddings(spark, stressDir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    // vec N and N+1000 are near-identical by construction; sample the
    // first 200 base vectors and require banded LSH to surface >=95%
    val pairs = Dedup.bandedEmbeddingPairs(e, n)
      .filter(col("vec_a") < 200 && col("vec_b") === col("vec_a") + 1000L)
      .count()
    assert(pairs >= 190L, s"only $pairs/200 planted near-dup pairs recovered")
  }

  test("jaccard-block cap sub-splits a planted boilerplate block") {
    val spark2 = spark
    import spark2.implicits._
    // 600 docs sharing one minimal shingle ("aaa aaa aaa" prefix sorts
    // below every other shingle) — an uncapped block would self-join
    // 600² rows. 20 exact-dup pairs planted on top must survive the
    // sub-split (identical docs agree on their second-min shingle too).
    val base = (0 until 600).map { i =>
      (i.toLong, s"aaa aaa aaa filler$i words beyond the common prefix run $i")
    }
    val dups = (0 until 20).map { i =>
      ((1000 + i).toLong, s"aaa aaa aaa filler$i words beyond the common prefix run $i")
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val blocked = Dedup.jaccardBlockedDocs(docs)
    val maxGroup = blocked.groupBy(col("blk"), col("sub"), col("sub2"))
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).collect()(0).getLong(0)
    assert(maxGroup <= Dedup.JACCARD_BLOCK_CAP,
      s"sub-split failed: a (blk,sub,sub2) group still has $maxGroup docs")
    val pairs = Dedup.jaccardBlockPairs(docs)
      .filter(col("doc_b") === col("doc_a") + 1000L).count()
    assert(pairs == 20L, s"only $pairs/20 planted exact dups survived the cap")
    Dedup.releaseCaches(blocking = true)
  }

  test("jaccard cap survives a second-min-shingle collision (level-2 split)") {
    val spark2 = spark
    import spark2.implicits._
    // the adversarial boilerplate shape: every doc shares BOTH its min
    // ("aaa aaa aaa") and second-min ("aaa aaa bbb") shingle, so the
    // level-1 sub-split collapses to ONE group of 2000 — the level-2
    // md5(doc_id)-mod split must bound it. Doc ids are STRIDED (×16)
    // on purpose: a raw doc_id % k split would put every doc in one
    // residue class and resurrect the quadratic block; the hash split
    // must spread them regardless of id structure.
    val base = (0 until 1000).map { i =>
      (i.toLong * 16, s"aaa aaa aaa bbb filler$i trailing tail token$i")
    }
    val dups = base.map { case (id, t) => (id + 16000L, t) }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val blocked = Dedup.jaccardBlockedDocs(docs)
    val maxGroup = blocked.groupBy(col("blk"), col("sub"), col("sub2"))
      .agg(count(lit(1)).as("sz")).agg(max(col("sz"))).collect()(0).getLong(0)
    assert(maxGroup <= Dedup.JACCARD_BLOCK_CAP,
      s"level-2 split failed: a group still has $maxGroup docs")
    // exact-dup twins survive only when both land in the same sub2 —
    // the documented cap tradeoff (dedup_exact and the simhash star
    // carry identical-text pairs regardless). Expected survivors are
    // derived from the SAME blocked frame, so the pair stage must
    // agree with it exactly, and the hash must keep a healthy spread.
    val subOf = blocked.select(col("doc_id"), col("sub2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = base.map(_._1).count(id => subOf(id) == subOf(id + 16000L))
    val pairs = Dedup.jaccardBlockPairs(docs)
      .filter(col("doc_b") === col("doc_a") + 16000L).count()
    assert(pairs == expected.toLong, s"got $pairs planted pairs, expected $expected")
    assert(expected > 50, s"hash split degenerated: only $expected/1000 co-located")
    Dedup.releaseCaches(blocking = true)
  }

  test("simhash identical-hash groups emit a linear star, not a quadratic clique") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.Expr
    // 2000 docs with IDENTICAL text collapse onto one simhash value; an
    // uncapped clique would be ~2M pairs — the star must be exactly n-1
    // rows, all anchored at the representative (min doc id)
    val docs = (0 until 2000)
      .map(i => (i.toLong, "the same boilerplate text repeated across the corpus"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(
      docs.select(col("doc_id"), Expr.simhash64(split(col("text"), " ")).as("sim")))
    assert(pairs.count() == 1999L, "star must be linear in group size")
    assert(pairs.filter(col("doc_a") =!= 0L || col("hamming") =!= 0).count() == 0L,
      "every identical-hash pair anchors at the representative with hamming 0")
    Dedup.releaseCaches(blocking = true)
  }

  test("simhashPairs links skewed signature groups through representatives only") {
    val spark2 = spark
    import spark2.implicits._
    // 1000 docs on sim=5, 500 on sim=7 (hamming 1, same 16-bit chunks):
    // two stars + exactly ONE rep↔rep cross pair — member×member
    // expansion (1000×500 rows) must never happen
    val sigs = ((0 until 1000).map(i => (i.toLong, 5L)) ++
        (1000 until 1500).map(i => (i.toLong, 7L)))
      .toDF("doc_id", "sim")
    val pairs = Dedup.simhashPairs(sigs).collect()
    assert(pairs.length == 999 + 499 + 1, s"got ${pairs.length} pairs")
    val cross = pairs.filter(_.getAs[Int]("hamming") > 0)
    assert(cross.length == 1)
    assert(cross(0).getAs[Long]("doc_a") == 0L && cross(0).getAs[Long]("doc_b") == 1000L,
      "cross-hash pair must link the two representatives")
    Dedup.releaseCaches(blocking = true)
  }

  test("dedup_minhash stars identical-signature groups instead of band cliques") {
    val spark2 = spark
    import spark2.implicits._
    // 1500 docs with IDENTICAL text share one exact minhash signature;
    // every band of the group collides, so an uncollapsed band join
    // would emit ~1.1M pairs — the star must be exactly n-1 rows at
    // est_jaccard 1.0, anchored at the min doc id
    val dir = java.nio.file.Files.createTempDirectory("mhstar").toString
    (0 until 1500).map(i => (i.toLong, "identical boilerplate body repeated verbatim across the corpus"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupMinhash(spark, dir).collect()
    assert(pairs.length == 1499, s"star must be linear: got ${pairs.length}")
    assert(pairs.forall(r => r.getAs[Long]("doc_a") == 0L &&
      r.getAs[Double]("est_jaccard") == 1.0))
    Dedup.releaseCaches(blocking = true)
  }

  test("dedup_minhash finds the planted duplicate clusters at 20x") {
    assume(haveStress, "stress corpus not generated")
    // doc N and N+10000 are near-identical by construction
    val pairs = Dedup.dedupMinhash(spark, stressDir)
      .filter(col("est_jaccard") >= 0.8)
    val planted = pairs
      .filter(col("doc_b") - col("doc_a") === 10000L).count()
    assert(planted > 100L, s"only $planted planted near-dup pairs recovered")
    Dedup.releaseCaches(blocking = true)
  }

  /** 10× documents corpus for the shuffle_epoch balance check: the
    * full /tmp/scale10 (ScaleData) when present, else a documents-only
    * 10× of sf0.1 generated once into /tmp (shuffle_epoch reads only
    * doc_id, so key-offset copies are the whole requirement).
    */
  private def scale10DocsDir(): String =
    if (new java.io.File("/tmp/scale10/documents.parquet").exists()) "/tmp/scale10"
    else {
      val out = "/tmp/graft_scale10_docs"
      if (!new java.io.File(s"$out/documents.parquet/_SUCCESS").exists()) {
        val src = Tables.documents(spark, "/root/testdata/sf0.1")
        val off = src.agg(max(col("doc_id"))).first().getLong(0) + 1L
        (0 until 10).map(i => src.withColumn("doc_id", col("doc_id") + lit(i * off)))
          .reduce(_ unionByName _)
          .repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
      }
      out
    }

  test("shuffle_epoch range slices stay balanced at 10x (no per-task sort ceiling)") {
    // the scale property the globalRowNumber design buys: the executed
    // ranked frame keeps the range partitioning, and no slice may hold
    // more than ~2× the mean regardless of (epoch, shard) skew — the
    // old per-shard window put a whole shard (~n/32 rows) in ONE task
    assume(new java.io.File("/tmp/scale10/documents.parquet").exists() ||
      new java.io.File("/root/testdata/sf0.1/documents.parquet").exists(),
      "neither /tmp/scale10 nor the sf0.1 source corpus is present")
    val dir = scale10DocsDir()
    val ranked = graft.operators.TrainOps4.shuffleEpochRanked(spark, dir)
    val counts = ranked
      .withColumn("__p", spark_partition_id())
      .groupBy(col("__p")).agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    val mean = counts.sum.toDouble / counts.length
    assert(counts.length > 1, "balance check needs multiple slices")
    assert(counts.max <= 2.0 * mean,
      s"skewed range slices (max=${counts.max}, mean=$mean): ${counts.toSeq}")
    graft.Caches.release(blocking = true)
  }
}
