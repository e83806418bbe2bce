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
