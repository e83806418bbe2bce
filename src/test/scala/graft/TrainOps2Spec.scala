package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainOps2

class TrainOps2Spec extends AnyFunSuite {
  import TestSpark._

  test("decontam_overlap pairs truly share a trigram shingle; eval side only % 97 docs") {
    val rows = TrainOps2.decontamOverlap(spark, sf).collect()
    assert(rows.nonEmpty, "the duplicated synthetic corpus should show overlap")
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    rows.foreach { r =>
      val (doc, eval, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(doc % 97 != 0 && eval % 97 == 0)
      val shared = shingles(texts(doc)).intersect(shingles(texts(eval)))
      assert(shared.size == n, s"pair ($doc,$eval): expected ${shared.size} got $n")
    }
  }

  test("decontam_overlap carries no static broadcast hint (AQE decides at runtime)") {
    // The %97 eval stand-in is O(corpus) shingles — a hard-coded
    // broadcast() would OOM the driver at scale. The scale-safe plan
    // lets AQE pick broadcast-vs-shuffle from measured sizes.
    val analyzed = TrainOps2.decontamOverlap(spark, sf).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint") && !analyzed.contains("UnresolvedHint"),
      "decontam_overlap must not pin a broadcast hint on the eval side")
  }

  test("text_repetition drops <2-token docs instead of crashing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shortdocs").toString
    import spark.implicits._
    Seq((1L, "one", "s"), (2L, "", "s"), (3L, "two tokens", "s"),
        (4L, "a b c d", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TrainOps2.textRepetition(spark, dir).collect()
    // docs 1 ("one") and 2 ("") have <2 tokens -> dropped, like the
    // oracle's range(1, len(w)); the rest keep exact bigram counts
    assert(rows.map(_.getLong(0)).toSet == Set(3L, 4L))
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(3L) == 1L && byId(4L) == 3L)
  }

  test("text_repetition counts are internally consistent") {
    val rows = TrainOps2.textRepetition(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (nTok, nBig, nDist) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nBig == nTok - 1, "one bigram per adjacent token pair")
      assert(nDist <= nBig)
      val (top, dup) = (r.getDouble(4), r.getDouble(5))
      assert(top > 0 && top <= 1.0 && dup >= 0 && dup <= 1.0)
      assert(dup == 0.0 || dup >= top, "dup share includes the top bigram when repeated")
    }
  }

  test("pack_sequences is a consistent contiguous packing per source") {
    val rows = TrainOps2.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (_, _, n, seqId, off) =>
        assert(seqId == cum / TrainOps2.SEQ_LEN)
        assert(off == cum % TrainOps2.SEQ_LEN)
        cum += n
      }
    }
  }

  test("pack_sequences two-level cumsum matches the single-window formulation on a skewed source") {
    // One source holds 95% of a 4000-doc corpus — the shape where a
    // plain partitionBy(source) window collapses to a single reducer.
    val dir = java.nio.file.Files.createTempDirectory("graft_packskew").toString
    import spark.implicits._
    (0L until 4000L).map { i =>
      val src = if (i % 20 == 0) s"small${i % 3}" else "big"
      (i, Seq.fill((i % 7 + 1).toInt)("t").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // independent single-window reference
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"),
        floor(col("cum_before").cast("double") / TrainOps2.SEQ_LEN).cast("long").as("seq_id"),
        (col("cum_before") % TrainOps2.SEQ_LEN).as("seq_offset"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = TrainOps2.packSequences(spark, dir).collect()
    assert(got.length == 4000)
    got.foreach { r =>
      assert((r.getLong(3), r.getLong(4)) == ref(r.getLong(0)),
        s"doc ${r.getLong(0)}: two-level != single-window")
    }
    // the heavy window must partition on (source, bkt), not source alone
    val plan = TrainOps2.packSequences(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("bkt"), "expected two-level bucket key in the plan")
  }

  test("embed_outliers ranks the farthest-from-centroid vectors per label") {
    val rows = TrainOps2.embedOutliers(spark, sf).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    assert(byLabel.size == Tables.embeddings(spark, sf).select("label").distinct().count())
    byLabel.foreach { case (_, rs) =>
      assert(rs.length == TrainOps2.OUTLIER_K)
      val d2s = rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(d2s == d2s.sorted.reverse, "d2 must be non-increasing in rank")
    }
    // spot-check one distance against a driver-side exact recompute
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).toArray))
    val top = rows.head
    val (lbl, vid) = (top.getInt(0), top.getLong(1))
    val members = vecs.filter(_._2 == lbl)
    val n = members.length
    val q = members.map { case (id, _, v) => id -> v.map(x => math.floor(x.toDouble * 1e6).toLong) }.toMap
    val sums = q.values.transpose.map(_.sum).toArray
    val d2 = q(vid).zip(sums).map { case (qi, s) => val diff = BigInt(qi) * n - BigInt(s); diff * diff }.sum
    assert(top.getDouble(2) == d2.toDouble, s"exact d2 mismatch for vec $vid")
  }

  test("chunk_sliding windows reconstruct the document at stride overlap") {
    val chunks = TrainOps2.chunkSliding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4)))
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val toks = texts(doc).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      sorted.foreach { case (_, i, text, nTok) =>
        val want = toks.slice((i * TrainOps2.CHUNK_S).toInt,
          (i * TrainOps2.CHUNK_S).toInt + TrainOps2.CHUNK_W)
        assert(text == want.mkString(" "), s"doc $doc chunk $i")
        assert(nTok == want.length.toLong)
      }
      // every token is covered by the last chunk's end
      val last = sorted.last
      assert(last._2 * TrainOps2.CHUNK_S + last._4 == toks.length.toLong)
    }
  }

  test("mix_weights upsamples small sources and normalizes to ~1") {
    val rows = TrainOps2.mixWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    val wsum = rows.map(_._4).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights sum $wsum")
    // temperature < 1 exponent compresses: smaller share => larger weight/share ratio
    val sorted = rows.sortBy(_._2)
    val ratios = sorted.map(r => r._4 / r._3)
    assert(ratios.head >= ratios.last, "smallest source should be boosted most")
  }
}
