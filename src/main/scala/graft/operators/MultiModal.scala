package graft.operators

import graft.Tables
import graft.functions.Expr
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2C multimodal column plumbing.
  *
  * Models the pattern a 100 TB training-data pipeline uses for
  * image/audio/video: an opaque `binary` payload column + typed
  * metadata, processed by a batched per-partition decode/featurize
  * stage. The Spark-side plumbing — schema, partition-parallel batched
  * execution, feature output shape — is real; only the media decode
  * kernel is STUBBED (no image/audio libs in this container) with a
  * deterministic fake so results are testable.
  */
object MultiModal {
  type Q = (SparkSession, String) => DataFrame

  /** Input record: payload + metadata (what an image table looks like). */
  case class MediaRow(doc_id: Long, content: Array[Byte], width: Int, height: Int, fmt: String)
  /** Output record of the featurize stage. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, fmt: String,
      feat: Array[Float], feat_norm: Double)

  private val BATCH = 32 // rows per decode batch (model-inference shape)

  /** STUB decode/featurize kernel. A real pipeline decodes the bytes
    * (JPEG/PNG/WAV...) and runs a vision/audio encoder per batch; this
    * container has no media libs, so we emit a deterministic fake
    * feature vector derived from the payload bytes. The batching,
    * schema and partition layout are exactly what the real kernel
    * would use.
    */
  private def decodeBatchStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val feat = Array.tabulate(8) { i =>
        // fake "embedding": byte-sum folded per lane — NOT a real decoder
        var acc = i + 1
        var j = i
        while (j < r.content.length) { acc = acc * 31 + r.content(j); j += r.width.max(1) }
        (acc % 1000) / 1000.0f
      }
      val norm = math.sqrt(feat.map(x => x.toDouble * x).sum)
      MediaFeatures(r.doc_id, r.content.length.toLong, r.fmt, feat, norm)
    }

  /** documents → fake media table → batched featurize. */
  val mmPipeline: Q = (s, d) => {
    import s.implicits._
    val fmts = array(lit("png"), lit("jpeg"), lit("wav"))
    val media = Tables.documents(s, d)
      .select(col("doc_id"),
        // a null payload row must not NPE the typed featurize kernel;
        // empty content is the decode-stub's defined degenerate input
        coalesce(col("text"), lit("")).cast("binary").as("content"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        element_at(fmts, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .as[MediaRow]
    media.mapPartitions(_.grouped(BATCH).flatMap(decodeBatchStub))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("fmt"), col("feat_norm"))
      .orderBy(col("doc_id"))
  }

  // --- mm_metadata: the binary-column surface under the hash gate -----
  // Everything around the stubbed decode IS deterministic: payload
  // byte length, payload content hash (dedup key for media), format
  // and dimension metadata. The Spark side runs on a real BINARY
  // column (cast, length, md5 over bytes); the oracle computes the
  // same values from the text the payload was derived from — so the
  // media-table bookkeeping a 100 TB multimodal pipeline relies on
  // (per-format size accounting, payload-level dedup counts, dimension
  // bounds) is verified, and only the decode kernel remains stubbed.
  val mmMetadata: Q = (s, d) => {
    val fmts = array(lit("png"), lit("jpeg"), lit("wav"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        element_at(fmts, (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("content")).cast("long")).as("sum_bytes"),
        countDistinct(md5(col("content"))).as("n_distinct_payloads"),
        min(col("width")).as("min_w"), max(col("width")).as("max_w"),
        min(col("height")).as("min_h"), max(col("height")).as("max_h"))
      .orderBy(col("fmt"))
  }

  val mmMetadataSql: String =
    """WITH media AS (
      |  SELECT doc_id, text,
      |    CAST(doc_id % 64 + 16 AS INT) AS width,
      |    CAST(doc_id % 48 + 16 AS INT) AS height,
      |    ['png', 'jpeg', 'wav'][CAST(doc_id % 3 + 1 AS INT)] AS fmt
      |  FROM documents)
      |SELECT fmt, COUNT(*) AS n,
      |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS sum_bytes,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads,
      |  min(width) AS min_w, max(width) AS max_w,
      |  min(height) AS min_h, max(height) AS max_h
      |FROM media GROUP BY fmt ORDER BY fmt""".stripMargin

  // --- mm_frame_sample: video frame-sampling plumbing ----------------
  // The frame-sample stage of a video ingest: per-video metadata
  // (duration, fps, frame geometry) determines the frame index set —
  // every k-th frame, k sized so ≤8 frames survive per video — and
  // each sampled frame becomes one row carrying its timestamp and the
  // byte offset a real decoder would seek to. Everything here is
  // integer arithmetic over metadata (sequence + explode — no shuffle
  // until the final sort), so the WHOLE sampling plan sits under the
  // hash gate; only the per-frame pixel decode (which would consume
  // content[byte_off : byte_off+frame_bytes]) is the stubbed kernel,
  // same as mm_pipeline's. At 100 TB the explode is the right shape:
  // row count grows 8× per video with zero driver coordination.
  val mmFrameSample: Q = (s, d) => {
    val fps = (pmod(col("doc_id"), lit(2)) * 6 + 24).cast("long")       // 24 or 30
    val durS = (pmod(col("n_chars"), lit(111)) + 10).cast("long")       // 10..120 s
    val meta = Tables.documents(s, d)
      .select(col("doc_id"), fps.as("fps"), durS.as("dur_s"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("long").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("long").as("height"))
      .withColumn("n_frames", col("dur_s") * col("fps"))
      .withColumn("step", greatest(lit(1L), expr("n_frames div 8")))
    meta.select(col("doc_id"), col("fps"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("step"))).as("frame_idx"),
        (col("width") * col("height") * 3L).as("frame_bytes"))
      .select(col("doc_id"), col("frame_idx"),
        expr("frame_idx * 1000 div fps").as("ts_ms"),
        (col("frame_idx") * col("frame_bytes")).as("byte_off"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val mmFrameSampleSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    doc_id % 2 * 6 + 24 AS fps,
      |    n_chars % 111 + 10 AS dur_s,
      |    doc_id % 64 + 16 AS width,
      |    doc_id % 48 + 16 AS height
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, fps, dur_s * fps AS n_frames,
      |    greatest(1, dur_s * fps // 8) AS step,
      |    width * height * 3 AS frame_bytes
      |  FROM meta),
      |x AS (
      |  SELECT doc_id, fps, frame_bytes,
      |    unnest([i FOR i IN range(0, n_frames, CAST(step AS BIGINT))]) AS frame_idx
      |  FROM f)
      |SELECT doc_id, frame_idx,
      |  frame_idx * 1000 // fps AS ts_ms,
      |  frame_idx * frame_bytes AS byte_off
      |FROM x ORDER BY doc_id, frame_idx""".stripMargin

  // --- mm_audio_window: audio windowing plumbing ---------------------
  // The windowing stage of an audio ingest (the audio sibling of
  // mm_frame_sample): per-clip metadata (sample rate, duration)
  // determines overlapping 1-second analysis windows — hop sized so
  // ≤16 windows survive per clip — and each window becomes one row
  // carrying its start sample, timestamp, and the byte offset a
  // 16-bit-mono decoder would seek to. Pure integer metadata
  // arithmetic (sequence + explode, no shuffle until the sort), so
  // the whole plan sits under the hash gate; the sample decode is the
  // stubbed kernel, as in mm_pipeline.
  val mmAudioWindow: Q = (s, d) => {
    val sr = (pmod(col("doc_id"), lit(2)) * 28100 + 16000).cast("long")  // 16 k or 44.1 k
    val durMs = (pmod(col("n_chars"), lit(29001)) + 1000).cast("long")   // 1..30 s
    Tables.documents(s, d)
      .select(col("doc_id"), sr.as("sr"), durMs.as("dur_ms"))
      .withColumn("n_samples", expr("dur_ms * sr div 1000"))
      .withColumn("lim", col("n_samples") - col("sr"))                   // last window start
      .withColumn("hop", greatest(expr("sr div 2"), expr("(lim + 14) div 15")))
      .select(col("doc_id"), col("sr"),
        explode(sequence(lit(0L), col("lim"), col("hop"))).as("start_sample"))
      .select(col("doc_id"), col("start_sample"),
        expr("start_sample * 1000 div sr").as("ts_ms"),
        (col("start_sample") * 2L).as("byte_off"))
      .orderBy(col("doc_id"), col("start_sample"))
  }

  val mmAudioWindowSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    doc_id % 2 * 28100 + 16000 AS sr,
      |    n_chars % 29001 + 1000 AS dur_ms
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, sr,
      |    dur_ms * sr // 1000 - sr AS lim,
      |    greatest(sr // 2, (dur_ms * sr // 1000 - sr + 14) // 15) AS hop
      |  FROM meta),
      |x AS (
      |  SELECT doc_id, sr,
      |    unnest([i FOR i IN range(0, lim + 1, CAST(hop AS BIGINT))]) AS start_sample
      |  FROM w)
      |SELECT doc_id, start_sample,
      |  start_sample * 1000 // sr AS ts_ms,
      |  start_sample * 2 AS byte_off
      |FROM x ORDER BY doc_id, start_sample""".stripMargin

  // --- mm_phash_dedup: perceptual-style payload near-dup --------------
  // mm_metadata dedups media by EXACT payload hash; the dominant image
  // duplicate class in training data is the near-identical payload
  // (re-encode header tweaks, metadata edits, small localized patches).
  // The production form is a pixel-domain pHash (decode → downscale →
  // DCT → sign bits); the decode kernel is stubbed in this container,
  // so this key gates the twin that needs no decoder: a BLOCKED
  // byte-domain fingerprint with the pHash STRUCTURE — fixed grid of
  // per-block features folded to a compact signature, near-dup =
  // few differing grid cells — over the raw BINARY payload.
  //
  //   signature: the payload splits into PHASH_BLOCKS equal byte
  //   ranges; each block contributes one md5 NIBBLE (first hex char
  //   of the block's digest), packed into a 60-bit BIGINT — the
  //   dedup_simhash_exact SIG_BITS discipline (15 nibbles stay inside
  //   a positive int64 in both engines, no sign/shift edge).
  //
  //   candidates: the banded LSH shape shared by the dedup family —
  //   PHASH_BANDS bands of 5 nibbles (20 bits); by pigeonhole a pair
  //   with ≤ PHASH_MAXDIFF differing blocks shares at least one FULL
  //   band, so banding is COMPLETE for the threshold, not heuristic.
  //   Identical-signature groups collapse to rep→member stars (no
  //   clique expansion on boilerplate-heavy corpora) and the
  //   block-distance test runs INSIDE the band join, so only
  //   qualifying pairs reach the distinct's shuffle. Scale: md5
  //   nibbles are uniform, so band-collision volume is
  //   n_distinct²·PHASH_BANDS/2²⁰ — ~3M candidate pairs at 1M
  //   distinct payloads, each a fixed-width int64 compare.
  //
  // ASCII payload note (the mmMetadata convention): the fake media
  // payload is document text cast to binary; the corpus is pure ASCII,
  // so DuckDB's VARCHAR slicing sees the same bytes Spark's BINARY
  // slicing does and the digests agree.
  private[graft] val PHASH_BLOCKS = 15
  private[graft] val PHASH_BANDS = 3 // 5 nibbles each
  private[graft] val PHASH_MAXDIFF = 2 // ≤ 2 of 15 blocks differ

  /** The 60-bit blocked fingerprint of a BINARY payload — ONE codegen
    * kernel call (Kernels.phashSig) instead of 15 md5(substr(...))
    * expressions per row: the declarative chain paid 15 substring
    * copies + 15 digest expressions per row AND a ~0.5 s analysis pass
    * per invocation for the resulting expression tree (graft.Profile:
    * plan-construction 506 ms). Same ceil-division blocks, same substr
    * clamping, same nibble packing — bit-identical signatures (the key
    * is hash-gated).
    */
  private[graft] def phashSig(content: Column): Column =
    Expr.phashSig(content, PHASH_BLOCKS)

  /** Count of differing nibble blocks between two signatures
    * (codegen'd; was a 15-term when-sum inside the band join).
    */
  private def blockDiff(a: Column, b: Column): Column =
    Expr.nibbleDiff(a, b, PHASH_BLOCKS)

  // NO wide() here, deliberately: the signature kernel hashes the FULL
  // payload, so spreading it means shuffling the heavy bytes to
  // parallelize 15 md5 digests — measured LOSS at sf0.1 (0.93-1.44 s
  // unwidened vs 1.35-2.1 s widened; the guide §8 rule: move decisions
  // to lightweight proxies, never move heavy bytes to spread cheap
  // compute). At scale the scan has many splits and the kernel
  // parallelizes for free.
  val mmPhashDedup: Q = (s, d) =>
    phashPairs(Tables.documents(s, d).select(col("doc_id"),
      coalesce(col("text"), lit("")).cast("binary").as("content")))

  /** The banded near-dup plan over any (doc_id, content BINARY) frame
    * — factored so specs can sweep adversarial payload corpora.
    */
  private[graft] def phashPairs(media: DataFrame): DataFrame = {
    // registry caches instead of standalone eager checkpoints: each
    // frame is materialized by the first job that consumes it, so the
    // two plan-construction-time materialization jobs disappear (the
    // pipe_index_maintain discipline; lineage here is two nodes deep,
    // so checkpoint's truncation bought nothing)
    val sigs = graft.Caches.cached(media
      .select(col("doc_id"), phashSig(col("content")).as("sig")))
    val reps = graft.Caches.cached(sigs.groupBy(col("sig"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("cnt")))
    val banded = reps.select(col("sig"),
        posexplode(array((0 until PHASH_BANDS).map(b =>
          shiftrightunsigned(col("sig"), b * 20).bitwiseAND(lit(0xFFFFFL))): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val sigPairs = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.sig") < col("y.sig") &&
          blockDiff(col("x.sig"), col("y.sig")) <= PHASH_MAXDIFF)
      .select(col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct()
      .withColumn("n_diff_blocks", blockDiff(col("sig_a"), col("sig_b")))
    val crossSig = sigPairs
      .join(reps.select(col("sig").as("sig_a"), col("rep").as("rep_a")), "sig_a")
      .join(reps.select(col("sig").as("sig_b"), col("rep").as("rep_b")), "sig_b")
      .select(least(col("rep_a"), col("rep_b")).as("doc_a"),
        greatest(col("rep_a"), col("rep_b")).as("doc_b"), col("n_diff_blocks"))
    val star = sigs.join(reps.filter(col("cnt") > 1), "sig")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
        lit(0).as("n_diff_blocks"))
    crossSig.unionByName(star).orderBy(col("doc_a"), col("doc_b"))
  }

  val mmPhashDedupSql: String = {
    val nibSum = (0 until PHASH_BLOCKS).map(i =>
      s"(CAST(concat('0x', substr(md5(substring(t, $i*blen + 1, greatest(blen, 1))), 1, 1)) AS BIGINT) << ${4 * i})")
      .mkString(" +\n      |    ")
    val diffExpr = (0 until PHASH_BLOCKS).map(i =>
      s"CASE WHEN ((x.sig >> ${4 * i}) & 15) <> ((y.sig >> ${4 * i}) & 15) THEN 1 ELSE 0 END")
      .mkString(" + ")
    val diffAB = (0 until PHASH_BLOCKS).map(i =>
      s"CASE WHEN ((sig_a >> ${4 * i}) & 15) <> ((sig_b >> ${4 * i}) & 15) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH m AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
      |par AS (SELECT doc_id, t,
      |    greatest(1, (length(t) + ${PHASH_BLOCKS - 1}) // $PHASH_BLOCKS) AS blen FROM m),
      |sig AS (SELECT doc_id,
      |    $nibSum AS sig
      |  FROM par),
      |reps AS (SELECT sig, min(doc_id) AS rep, count(*) AS cnt FROM sig GROUP BY sig),
      |bnd AS (SELECT sig, b AS band_idx, (sig >> (b * 20)) & 1048575 AS band_val
      |  FROM reps CROSS JOIN (SELECT unnest([0, 1, 2]) AS b) c),
      |sp AS (SELECT DISTINCT x.sig AS sig_a, y.sig AS sig_b
      |  FROM bnd x JOIN bnd y ON x.band_idx = y.band_idx
      |    AND x.band_val = y.band_val AND x.sig < y.sig
      |  WHERE ($diffExpr) <= $PHASH_MAXDIFF),
      |hp AS (SELECT sig_a, sig_b, CAST($diffAB AS INT) AS n_diff_blocks FROM sp),
      |crossp AS (SELECT least(ra.rep, rb.rep) AS doc_a,
      |    greatest(ra.rep, rb.rep) AS doc_b, hp.n_diff_blocks
      |  FROM hp JOIN reps ra ON hp.sig_a = ra.sig
      |          JOIN reps rb ON hp.sig_b = rb.sig),
      |star AS (SELECT r.rep AS doc_a, s.doc_id AS doc_b, CAST(0 AS INT) AS n_diff_blocks
      |  FROM sig s JOIN reps r ON s.sig = r.sig
      |  WHERE r.cnt > 1 AND s.doc_id <> r.rep)
      |SELECT doc_a, doc_b, n_diff_blocks
      |FROM (SELECT * FROM crossp UNION ALL SELECT * FROM star) u
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "mm_pipeline" -> mmPipeline,
    "mm_metadata" -> mmMetadata,
    "mm_frame_sample" -> mmFrameSample,
    "mm_audio_window" -> mmAudioWindow,
    "mm_phash_dedup" -> mmPhashDedup)

  /** Decode kernel is a stub → mm_pipeline stays rows-only (n_bytes/
    * fmt asserted in MultiModalSpec); mm_metadata gates the
    * deterministic binary-column bookkeeping and mm_frame_sample the
    * frame-selection arithmetic around it.
    */
  val oracles: Map[String, String] = Map(
    "mm_metadata" -> mmMetadataSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_audio_window" -> mmAudioWindowSql,
    "mm_phash_dedup" -> mmPhashDedupSql)
}
