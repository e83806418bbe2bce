package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Expr
import graft.operators.{MultiModal, TextOps}

class TextAndMultiModalSpec extends AnyFunSuite {
  import TestSpark._

  test("text_tokens counts match document n_chars") {
    val bad = TextOps.textTokens(spark, sf)
      .filter(col("n_chars_calc") =!= col("n_chars")).count()
    assert(bad == 0, "length(text) must equal the n_chars column")
  }

  test("text_quality ratios are within [0,1]") {
    TextOps.textQuality(spark, sf).collect().foreach { r =>
      val pr = r.getAs[Double]("punct_ratio")
      val sr = r.getAs[Double]("stopword_ratio")
      val qs = r.getAs[Double]("quality_score")
      assert(pr >= 0 && pr <= 1); assert(sr >= 0 && sr <= 1)
      assert(qs >= 0 && qs <= 1.0001)
    }
  }

  test("text_langid picks the max-scoring profile") {
    TextOps.textLangid(spark, sf).collect().foreach { r =>
      val scores = Map(
        "en" -> r.getAs[Long]("score_en"), "es" -> r.getAs[Long]("score_es"),
        "fr" -> r.getAs[Long]("score_fr"), "de" -> r.getAs[Long]("score_de"),
        "zh" -> r.getAs[Long]("score_zh"))
      val pred = r.getAs[String]("lang_pred")
      assert(scores(pred) == scores.values.max)
    }
  }

  test("rolling hash is order-sensitive; simhash is not sign-degenerate") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array("a", "b", "c"), Array("c", "b", "a"))).toDF("x", "y")
    val r = df.select(
      Expr.rollingHash(col("x")).as("hx"), Expr.rollingHash(col("y")).as("hy"),
      Expr.simhash64(col("x")).as("sx"), Expr.simhash64(col("y")).as("sy")).collect()(0)
    assert(r.getAs[Long]("hx") != r.getAs[Long]("hy"), "rolling hash must depend on order")
    assert(r.getAs[Long]("sx") == r.getAs[Long]("sy"), "simhash is a bag-of-tokens hash")
  }

  test("cosine expression matches a hand computation") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f))).toDF("a", "b")
    val c = df.select(Expr.cosineSimilarity(col("a"), col("b")).as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - 0.5) < 1e-9) // dot=1, |a|=|b|=sqrt(2)
    val d = df.select(Expr.dotProduct(col("a"), col("b")).as("d")).collect()(0).getDouble(0)
    assert(d == 1.0)
  }

  test("mm_pipeline preserves payload size and format tags") {
    val rows = MultiModal.mmPipeline(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      // utf-8 payload of ascii-ish text: byte length == n_chars for ascii docs
      assert(r.getAs[Long]("n_bytes") >= docs(r.getAs[Long]("doc_id")) * 1L)
      assert(Set("png", "jpeg", "wav").contains(r.getAs[String]("fmt")))
      assert(r.getAs[Double]("feat_norm") >= 0.0)
    }
  }

  test("mm_audio_window: ≤16 windows per clip, 1s coverage, consistent offsets") {
    val rows = graft.operators.MultiModal.mmAudioWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == Tables.documents(spark, sf).count(),
      "every clip contributes at least one window")
    byDoc.foreach { case (doc, ws) =>
      assert(ws.length <= 16, s"clip $doc got ${ws.length} windows (hop sizing)")
      val sr = doc % 2 * 28100 + 16000
      ws.foreach { r =>
        val (st, tsMs, off) = (r.getAs[Long]("start_sample"),
          r.getAs[Long]("ts_ms"), r.getAs[Long]("byte_off"))
        assert(tsMs == st * 1000 / sr, "timestamp is sample time")
        assert(off == st * 2, "offset assumes 16-bit mono")
      }
    }
  }

  test("mm_frame_sample: ≤8+1 frames per video, consistent timestamps and offsets") {
    val rows = graft.operators.MultiModal.mmFrameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == Tables.documents(spark, sf).count(),
      "every video contributes sampled frames")
    byDoc.foreach { case (doc, fs) =>
      assert(fs.length <= 9, s"video $doc sampled ${fs.length} frames (step sizing)")
      val fps = doc % 2 * 6 + 24
      fs.foreach { r =>
        val (idx, tsMs, off) = (r.getAs[Long]("frame_idx"),
          r.getAs[Long]("ts_ms"), r.getAs[Long]("byte_off"))
        assert(tsMs == idx * 1000 / fps, "timestamp is frame time")
        val frameBytes = (doc % 64 + 16) * (doc % 48 + 16) * 3
        assert(off == idx * frameBytes, "offset seeks to the frame")
      }
    }
  }

  test("text_entropy is bounded by log2 of the distinct-char count") {
    val rows = graft.operators.TextOps.textEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ent = r.getAs[Double]("entropy")
      val nd = r.getAs[Long]("n_distinct")
      assert(ent >= 0.0, s"doc ${r.get(0)}: negative entropy $ent")
      // +1e-6 slack for the quantization step
      assert(ent <= math.log(nd.toDouble) / math.log(2.0) + 1e-6,
        s"doc ${r.get(0)}: entropy $ent exceeds log2($nd)")
    }
  }

  test("mm_phash_dedup adversarial sweep: localized patches caught, scattered edits and rewrites rejected, identical payloads star-collapse") {
    val spark2 = spark
    import spark2.implicits._
    // 150-byte base payload → 15 blocks of 10 bytes each
    val base = (0 until 15).map(b => f"b$b%02dqwerty0").mkString
    assert(base.length == 150)
    def patch(s: String, at: Int, w: String): String =
      s.substring(0, at) + w + s.substring(at + w.length)
    val docs = Seq(
      (0L, base),                                  // original
      (1L, base),                                  // byte-identical re-upload
      (2L, patch(base, 23, "ZZZ")),                // one block patched (block 2)
      (3L, patch(patch(base, 53, "QQ"), 93, "WW")),// two blocks (5 and 9)
      (4L, Seq(3, 43, 83, 123).foldLeft(base)((s, p) => patch(s, p, "K"))), // four scattered blocks
      (5L, ("r" * 150)))                           // same length, full rewrite
      .toDF("doc_id", "content0")
      .select(col("doc_id"), col("content0").cast("binary").as("content"))
    val pairs = graft.operators.MultiModal.phashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // identical payloads: star pair at distance 0
    assert(pairs.contains((0L, 1L, 0)), s"star pair missing: $pairs")
    // localized patches within the threshold: caught with the true
    // block distance (md5 nibbles of the patched blocks differ here —
    // fixed inputs, so the distances are deterministic)
    assert(pairs.contains((0L, 2L, 1)), s"one-block patch not flagged: $pairs")
    assert(pairs.contains((0L, 3L, 2)), s"two-block patch not flagged: $pairs")
    // beyond the threshold: four scattered edits and a full rewrite
    // must NOT pair with the original (or with each other)
    val flagged = pairs.map(p => (p._1, p._2))
    assert(!flagged.exists(p => p._1 == 4L || p._2 == 4L),
      s"scattered-edit doc paired: $pairs")
    assert(!flagged.exists(p => p._1 == 5L || p._2 == 5L),
      s"rewritten doc paired: $pairs")
    // the doc2/doc3 patches are disjoint: distance 3 > threshold
    assert(!flagged.contains((2L, 3L)), s"distance-3 pair leaked: $pairs")
  }

  test("etl_merge_upsert keeps one live row per key, none delete-marked") {
    val rows = graft.operators.EtlOps2.etlMergeUpsert(spark, sf).collect()
    assert(rows.nonEmpty)
    val custs = rows.map(_.getAs[Long]("cust"))
    assert(custs.distinct.length == custs.length, "duplicate keys after merge")
    // a key whose LAST event is a delete must be absent
    rows.foreach(r => assert(r.getAs[Long]("last_order") % 37 != 0,
      s"cust ${r.get(0)} survived with a delete-marked last event"))
  }
}
