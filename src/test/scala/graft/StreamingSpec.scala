package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def microsOf(h: Int, m: Int): Long =
    (h * 3600L + m * 60L) * 1000000L

  test("windowedCounts aggregates a memory stream with watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedCounts(df, "1 hour", "2 hours")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("wc").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), "click", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0))
      q.processAllAvailable()
      val out = spark.table("wc").collect()
      assert(out.length == 2)
      val clicks = out.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n") == 2L)
      assert(clicks.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("sliding windowedCounts: stream final state equals the batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.5),
      (java.sql.Timestamp.valueOf("2024-01-01 10:35:00"), "click", 2.25),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "view", 4.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:20:00"), "click", 8.0))
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedCounts(df, "1 hour", "2 hours", Some("30 minutes"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("swc").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      def shape(r: org.apache.spark.sql.Row) =
        (r.getAs[org.apache.spark.sql.Row]("window").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
      val streamed = spark.table("swc").collect().map(shape).toSet
      val batch = Streaming.windowedCounts(
          data.toDF("ts", "event_type", "value"), "1 hour", "2 hours", Some("30 minutes"))
        .collect().map(shape).toSet
      assert(streamed == batch, "stream final state must equal the batch twin")
      assert(streamed.size == 6, "each event lands in 2 sliding windows (minus merges)")
    } finally q.stop()
  }

  test("topkPerWindow over the streamed aggregate equals the batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), "view", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:08:00"), "view", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:09:00"), "buy", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "scroll", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:09:00"), "buy", 1.0))
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    // the streaming shape: aggregate in complete mode; rank the
    // materialized state (the rank of an open window isn't final, so
    // it is applied per trigger, not inside the streaming agg)
    val q = Streaming.windowedCounts(df, "1 hour", "2 hours")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("tkw").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      def shape(r: org.apache.spark.sql.Row) =
        (r.getAs[java.sql.Timestamp]("w_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Long]("rank"))
      val streamed = Streaming.topkPerWindow(spark.table("tkw"), 3)
        .collect().map(shape).toSet
      val batch = Streaming.topkPerWindow(
          Streaming.windowedCounts(data.toDF("ts", "event_type", "value"), "1 hour", "2 hours"), 3)
        .collect().map(shape).toSet
      assert(streamed == batch, "ranked stream state must equal the batch twin")
      assert(streamed.count(_._1 == java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) == 3,
        "4 types in the 10:00 window must cut to top-3")
    } finally q.stop()
  }

  test("streamDedup drops duplicate event ids within watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val df = mem.toDF().toDF("ts", "event_id")
    val q = Streaming.streamDedup(df).writeStream
      .outputMode(OutputMode.Append()).format("memory").queryName("dd").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 2L))
      q.processAllAvailable()
      assert(spark.table("dd").count() == 2)
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on gap") {
    import Streaming.Session
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = Streaming.sessionizeStream(mem.toDF().toDF("ts", "user_id", "event_id"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess").start()
    val ts = (h: Int, m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      // two bursts 2h apart → first session closes when second arrives
      mem.addData((ts(10, 0), 7L, 1L), (ts(10, 10), 7L, 2L))
      q.processAllAvailable()
      mem.addData((ts(12, 30), 7L, 3L))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect()
      assert(sessions.length == 1, s"expected 1 closed session, got ${sessions.toSeq}")
      assert(sessions(0).n_events == 2L)
      val us = (h: Int, m: Int) => ts(h, m).getTime * 1000L
      assert(sessions(0).session_start == us(10, 0))
      assert(sessions(0).session_end == us(10, 10))
    } finally q.stop()
  }

  test("sessionizer state rows are EVICTED once the watermark passes the gap") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = Streaming.sessionizeStream(mem.toDF().toDF("ts", "user_id", "event_id"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_evict").start()
    val ts = (h: Int, m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def stateRows: Long = {
      val p = q.lastProgress
      if (p == null || p.stateOperators.isEmpty) -1L else p.stateOperators.head.numRowsTotal
    }
    try {
      mem.addData((ts(10, 0), 7L, 1L))
      q.processAllAvailable()
      assert(stateRows == 1L, s"user 7's open session must hold one state row, saw $stateRows")
      // another USER's event advances the watermark to 12:30 at batch end
      mem.addData((ts(13, 0), 8L, 2L))
      q.processAllAvailable()
      // next batch fires user 7's timeout (10:00 + 30min < 12:30):
      // session emitted AND its state row dropped — only user 8 remains
      mem.addData((ts(13, 1), 8L, 3L))
      q.processAllAvailable()
      assert(stateRows == 1L,
        s"closed session's state must be evicted under the watermark, saw $stateRows rows")
      val closed = spark.table("sess_evict").collect()
      assert(closed.exists(r => r.getAs[Long]("user_id") == 7L &&
        r.getAs[Long]("n_events") == 1L), s"timed-out session must be emitted: ${closed.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with recent clicks") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[(java.sql.Timestamp, Long)]
    val cm = MemoryStream[(java.sql.Timestamp, Long)]
    val q = Streaming.streamStreamJoin(
        pm.toDF().toDF("p_ts", "p_user"), cm.toDF().toDF("c_ts", "c_user"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj").start()
    try {
      val ts = (s: String) => java.sql.Timestamp.valueOf(s)
      cm.addData((ts("2024-01-01 09:30:00"), 1L), (ts("2024-01-01 07:00:00"), 1L))
      pm.addData((ts("2024-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      // only the 09:30 click is within the hour before the purchase
      assert(rows.length == 1)
      assert(rows(0).getAs[java.sql.Timestamp]("c_ts") == ts("2024-01-01 09:30:00"))
    } finally q.stop()
  }

  test("batch sessionize matches stateful semantics on sf0.001") {
    val sessions = Streaming.streamSessionize(spark, sf).collect()
    assert(sessions.nonEmpty)
    // session invariant: end - start within session never exceeds total span,
    // and session ids are 1..n per user
    val byUser = sessions.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("session_id")).sorted
      assert(ids.head == 1L && ids.last == ids.length.toLong)
    }
  }

  test("stream-static near-dup gate flags corpus collisions only") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, sf)
    val index = graft.operators.Dedup.bandedIndex(corpus)
    val someText = corpus.orderBy(col("doc_id")).limit(1)
      .collect()(0).getAs[String]("text")
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.streamDupCandidates(mem.toDF().toDF("doc_id", "text"), index)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dupgate").start()
    try {
      mem.addData(
        (900001L, someText),                      // near-dup of corpus doc
        (900002L, "entirely novel text about nothing that exists in the corpus at all"))
      q.processAllAvailable()
      val flagged = spark.table("dupgate").collect().map(_.getLong(0)).toSet
      assert(flagged.contains(900001L), "copied doc must be flagged")
      assert(!flagged.contains(900002L), "novel doc must pass the gate")
    } finally q.stop()
  }

  test("stream-static exact gate flags fingerprint matches in streaming mode") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, sf)
    val index = corpus.select(
      graft.functions.Expr.md5PolyFingerprint(split(col("text"), " ")).as("f"))
    val someText = corpus.orderBy(col("doc_id")).limit(1)
      .collect()(0).getAs[String]("text")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.Expr.md5PolyFingerprint(split(col("text"), " ")).as("f"))
      .join(index, Seq("f"), "left_semi")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dupgate_exact").start()
    try {
      mem.addData(
        (900001L, someText),                      // exact corpus copy
        (900002L, s"novel $someText"))            // prefix shifts every position
      q.processAllAvailable()
      val flagged = spark.table("dupgate_exact").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(flagged.contains(900001L), "exact copy must be flagged")
      assert(!flagged.contains(900002L), "prefixed variant must pass")
    } finally q.stop()
  }

  test("near-dup gate gives identical candidates in batch mode") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Tables.documents(spark, sf)
    val index = graft.operators.Dedup.bandedIndex(corpus)
    val someText = corpus.orderBy(col("doc_id")).limit(1)
      .collect()(0).getAs[String]("text")
    val batch = Seq((900001L, someText), (900002L, "novel text entirely"))
      .toDF("doc_id", "text")
    val flagged = Streaming.streamDupCandidates(batch, index)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(900001L))
  }

  test("inference stage runs incrementally on a stream with retries intact") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val (replies, usage) = graft.operators.Inference.inferenceStage(
      mem.toDF().toDF("id", "prompt"))
    val q = replies.writeStream
      .outputMode(OutputMode.Append()).format("memory").queryName("inf").start()
    try {
      mem.addData((1L to 30L).map(i => (i, s"prompt $i")): _*)
      q.processAllAvailable()
      mem.addData((31L to 60L).map(i => (i, s"prompt $i")): _*)
      q.processAllAvailable()
      val out = spark.table("inf").collect()
      assert(out.length == 60)
      assert(out.forall(_.getAs[Boolean]("success")))
      // ids with id % 7 == 3 fail attempt 0 and must retry inside the batch
      assert(out.filter(_.getAs[Long]("id") % 7 == 3).forall(_.getAs[Int]("attempts") > 1))
      // batch-level calls: far fewer model calls than rows
      assert(usage.calls.value >= 4L && usage.calls.value < 60L)
    } finally q.stop()
  }

  test("parquet file sink is exactly-once across a query restart (checkpoint recovery)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sink_once").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("event_id", "event_type")
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt).format("parquet").start(out)
    val q1 = start()
    try {
      mem.addData((1L, "click"), (2L, "view"))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the same checkpoint: the sink's commit log must
    // carry over — batch 0 must not be re-emitted, batch 1 must land
    val q2 = start()
    try {
      mem.addData((3L, "purchase"))
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
        .map(_.getAs[Long]("event_id")).sorted
      assert(rows.sameElements(Array(1L, 2L, 3L)),
        s"exactly-once violated: ${rows.mkString(",")}")
    } finally q2.stop()
  }

  test("foreachBatch upsert sink: incremental state equals the one-shot batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.5),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "view", 2.25),
      (2L, 12L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), "click", 4.0),
      (2L, 13L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "purchase", 8.0),
      (3L, 14L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "click", 0.5))
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("user_id", "event_id", "ts", "event_type", "value")
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = df.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // localCheckpoint: the merged state must not keep a lazy
        // dependency on the transient micro-batch plan
        state = Some((state match {
          case None => Streaming.upsertState(batch.toDF())
          case Some(st) => Streaming.upsertMerge(st, batch.toDF())
        }).localCheckpoint(true))
        ()
      }.start()
    try {
      mem.addData(data(0), data(1)); q.processAllAvailable()
      mem.addData(data(2)); q.processAllAvailable()
      mem.addData(data(3), data(4)); q.processAllAvailable()
      def canon(dfx: org.apache.spark.sql.DataFrame) =
        dfx.select(col("user_id"), col("last.event_id").as("le"), col("n_events"),
          col("sum_dec").cast("double").as("sv"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val folded = canon(state.get)
      assert(folded == canon(Streaming.upsertState(
        data.toDF("user_id", "event_id", "ts", "event_type", "value"))))
      // `last` is by EVENT time: user 2's event 13 arrived last but is
      // older than event 12, so 12 must win
      assert(folded.map(t => t._1 -> t._2).toMap == Map(1L -> 11L, 2L -> 12L, 3L -> 14L))
    } finally q.stop()
  }

  test("upsert merge is trigger-partitioning-invariant under adversarial replay") {
    // The associativity claim tested adversarially: the SAME events
    // folded through three hostile trigger partitionings — late
    // arrival (newest-ts batch first, oldest last), a skewed split
    // with an EMPTY middle batch, and a fine-grained 7-way residue
    // split in reversed order — must each equal the one-shot
    // aggregation bit-for-bit. This is the property that lets an
    // incremental 100 TB sink be re-derived (and oracle-gated) no
    // matter how the stream happened to be chopped into micro-batches.
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    def canon(dfx: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      dfx.select(col("user_id"), col("last.event_id").as("le"), col("n_events"),
        col("sum_dec").cast("double").as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val oneShot = canon(Streaming.upsertState(ev))
    val day = dayofmonth(col("ts"))
    val partitionings: Seq[(String, Seq[org.apache.spark.sql.DataFrame])] = Seq(
      // late data: whole days arrive newest-first, so every batch after
      // the first is entirely OLDER than the state it merges into
      "late-arrival day order" -> (1 to 31).reverse.map(d => ev.filter(day === d)),
      // skew + an empty batch mid-stream (residue 17 of 16 never fires)
      "skewed with empty batch" -> Seq(
        ev.filter(pmod(col("event_id"), lit(16)) < 14),
        ev.filter(pmod(col("event_id"), lit(16)) === 17),
        ev.filter(pmod(col("event_id"), lit(16)) === 14),
        ev.filter(pmod(col("event_id"), lit(16)) === 15)),
      // reversed fine-grained residues
      "reversed 7-way residues" -> (0 until 7).reverse.map(i =>
        ev.filter(pmod(col("event_id"), lit(7)) === i)))
    partitionings.foreach { case (name, batches) =>
      val folded = canon(
        batches.tail.foldLeft(Streaming.upsertState(batches.head))(Streaming.upsertMerge))
      assert(folded == oneShot, s"fold under '$name' diverged from the one-shot aggregation")
    }
  }

  test("sessionizer state survives a mid-stream query restart (checkpoint recovery)") {
    import Streaming.Session
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sess_restart").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val ts = (h: Int, m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // the memory sink cannot recover from a checkpoint; the parquet
    // file sink is the fault-tolerant one (same as the exactly-once
    // test above), so the restart goes through it
    def start() =
      Streaming.sessionizeStream(mem.toDF().toDF("ts", "user_id", "event_id"))
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt).format("parquet").start(out)
    def sessions(): Seq[Session] = spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[Session]].schema)
      .parquet(out).as[Session].collect().toSeq
    // phase 1: an OPEN session (two events, no gap yet), then stop —
    // the burst lives only in the flatMapGroupsWithState state store
    val q1 = start()
    try {
      mem.addData((ts(10, 0), 7L, 1L), (ts(10, 10), 7L, 2L))
      q1.processAllAvailable()
      assert(sessions().isEmpty, "session must still be open at stop")
    } finally q1.stop()
    // phase 2: restart from the checkpoint; a later event from the
    // same user must close the PRE-RESTART burst with both its events —
    // possible only if the state store recovered across the restart
    val q2 = start()
    try {
      mem.addData((ts(13, 0), 7L, 3L))
      q2.processAllAvailable()
      val got = sessions()
      assert(got.length == 1, s"expected the recovered session, got $got")
      assert(got.head.n_events == 2L,
        s"pre-restart events lost from recovered state: ${got.head}")
      val us = (h: Int, m: Int) => ts(h, m).getTime * 1000L
      assert(got.head.session_start == us(10, 0))
      assert(got.head.session_end == us(10, 10))
    } finally q2.stop()
  }

  test("upsert merge is invariant under RANDOMIZED trigger partitionings (ScalaCheck)") {
    // The three hand-picked adversarial partitionings above pin known
    // failure shapes; this sweeps the space they were picked from. A
    // generated case is (batch count m, salt, batch order): events are
    // split into m disjoint batches by a salted hash of event_id and
    // folded in a random batch order — every case must reproduce the
    // one-shot aggregation bit-for-bit. 12 cases from a fixed seed.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .cache()
    def canon(dfx: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      dfx.select(col("user_id"), col("last.event_id").as("le"), col("n_events"),
        col("sum_dec").cast("double").as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val oneShot = canon(Streaming.upsertState(ev))
    val genCase: Gen[(Int, Long, Seq[Int])] = for {
      m <- Gen.choose(2, 9)
      salt <- Gen.choose(0L, 1L << 40)
      order <- Gen.const(new scala.util.Random(salt).shuffle((0 until m).toVector))
    } yield (m, salt, order)
    val prop = Prop.forAll(genCase) { case (m, salt, order) =>
      val batches = order.map(i =>
        ev.filter(pmod(xxhash64(col("event_id"), lit(salt)), lit(m)) === i))
      val folded = canon(
        batches.tail.foldLeft(Streaming.upsertState(batches.head))(Streaming.upsertMerge))
      folded == oneShot
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, prop)
    try assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
    finally ev.unpersist()
  }

  test("foreachBatch upsert sink survives a kill between batches (idempotent per-batchId merge)") {
    // The production shape of stream_upsert_sink: a checkpointed FILE
    // source, foreachBatch persisting the merged state keyed by
    // batchId (state b(id) = merge(b(id-1), batch id), written with
    // overwrite). Kill the query between batches, add more data,
    // restart from the same checkpoint: the overwrite-by-batchId write
    // makes any replayed batch idempotent, so the final persisted
    // state must equal the one-shot aggregation over ALL events — the
    // exactly-once contract a MERGE-INTO sink needs on a real cluster.
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("upsert_restart").toString
    val (srcDir, ckpt, stateDir) = (s"$base/src", s"$base/ckpt", s"$base/state")
    val all = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", 1.5),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "view", 2.25),
      (2L, 12L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), "click", 4.0),
      (2L, 13L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "purchase", 8.0),
      (3L, 14L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), "click", 0.5))
    def toDf(rows: Seq[(Long, Long, java.sql.Timestamp, String, Double)]) =
      rows.toDF("user_id", "event_id", "ts", "event_type", "value")
    val schema = toDf(all).schema
    @volatile var lastBatch = -1L
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val merged =
          if (id == 0L) Streaming.upsertState(batch.toDF())
          else Streaming.upsertMerge(spark.read.parquet(s"$stateDir/b${id - 1}"), batch.toDF())
        // overwrite => replaying batch `id` after a crash rewrites the
        // same content from the same predecessor state: idempotent
        merged.write.mode("overwrite").parquet(s"$stateDir/b$id")
        lastBatch = math.max(lastBatch, id)
        ()
      }.start()
    // phase 1: two files -> two batches, then KILL the query
    toDf(all.take(2)).coalesce(1).write.mode("append").parquet(srcDir)
    toDf(all.slice(2, 3)).coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(lastBatch >= 1L, s"expected >=2 batches before the kill, got ${lastBatch + 1}")
    // phase 2: more data lands while the query is down; restart
    toDf(all.drop(3)).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    def canon(dfx: org.apache.spark.sql.DataFrame) =
      dfx.select(col("user_id"), col("last.event_id").as("le"), col("n_events"),
        col("sum_dec").cast("double").as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val finalState = canon(spark.read.parquet(s"$stateDir/b$lastBatch"))
    assert(finalState == canon(Streaming.upsertState(toDf(all))),
      "post-restart folded state diverged from the one-shot aggregation")
    // `last` is by EVENT time: user 2's later-arriving event 13 is older
    assert(finalState.map(t => t._1 -> t._2).toMap == Map(1L -> 11L, 2L -> 12L, 3L -> 14L))
  }

  test("bm25 gate scores each trigger against the static index; union over triggers equals the batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // indexed corpus (the already-ingested side, persisted once)
    val corpus = Seq(
      (0L, "solar inverter efficiency curve under partial shading"),
      (1L, "thermal derating of the output stage at high ambient"),
      (2L, "gate driver timing margins for the half bridge"),
      (3L, "electrolytic capacitor ripple current lifetime model"))
    val idxPath = java.nio.file.Files.createTempDirectory("bm25g").toString + "/index"
    graft.operators.TrainOps5.buildBm25Index(corpus.toDF("doc_id", "text"), idxPath)
    val incoming = Seq(
      (100L, "solar inverter efficiency curve under partial shading"), // verbatim re-ingest
      (101L, "zebra xylophone quux entirely novel tokens"),            // nothing indexed
      (102L, "the output"))                                            // weak common overlap
    val mem = MemoryStream[(Long, String)]
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = Streaming.bm25GateBatch(batch.toDF(), idxPath).collect()
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      mem.addData(incoming.take(1): _*); q.processAllAvailable()
      mem.addData(incoming.drop(1): _*); q.processAllAvailable()
    } finally q.stop()
    def canon(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    val streamed = canon(buf.toSeq)
    val batchTwin = canon(
      Streaming.bm25GateBatch(incoming.toDF("doc_id", "text"), idxPath).collect().toSeq)
    assert(streamed == batchTwin,
      s"\nstream: $streamed\nbatch:  $batchTwin")
    val verdicts = streamed.map(t => t._1 -> t._5).toMap
    assert(verdicts(100L) == "dup_suspect", "a verbatim re-ingest must be flagged")
    assert(verdicts(101L) == "pass" && verdicts(102L) == "pass")
    val matches = streamed.map(t => t._1 -> t._2).toMap
    assert(matches(100L) == 0L, "the copy's best match is its indexed original")
    assert(matches(101L) == -1L, "no indexed term -> sentinel match")
  }

  test("bm25 ingest stream: each trigger is an atomic version bump; final serve equals a one-shot build; replayed epochs are no-ops") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (0L, "solar inverter efficiency curve under partial shading"),
      (1L, "thermal derating of the output stage at high ambient"),
      (2L, "gate driver timing margins for the half bridge"),
      (3L, "electrolytic capacitor ripple current lifetime model"),
      (4L, "inverter output stage timing under ripple current"),
      (5L, "ambient thermal model of the gate driver bridge"))
    val base = java.nio.file.Files.createTempDirectory("bm25si").toString
    val idxPath = s"$base/index"
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.bm25IngestStream(mem.toDF().toDF("doc_id", "text"), idxPath)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      docs.grouped(2).foreach { g =>
        mem.addData(g: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // three triggers -> versions 0..2, each carrying its epoch marker
    assert(graft.operators.TrainOps5.committedVersion(idxPath).contains(2))
    (0 to 2).foreach { v =>
      assert(new java.io.File(s"$idxPath/stats_v$v/_EPOCH_$v").exists(),
        s"version $v missing its epoch stamp")
    }
    // the streamed index serves exactly what a one-shot build serves
    val ref = s"$base/ref"
    graft.operators.TrainOps5.buildBm25Index(docs.toDF("doc_id", "text"), ref)
    val streamed = graft.operators.TrainOps5.queryBm25Index(spark, idxPath).collect().toSeq
    assert(streamed == graft.operators.TrainOps5.queryBm25Index(spark, ref).collect().toSeq,
      "streamed ingest chain diverged from the one-shot build")
    // exactly-once: replaying a committed-but-unacked epoch must not
    // double-ingest (the failure window between commit and checkpoint)
    Streaming.bm25IngestBatch(docs.takeRight(2).toDF("doc_id", "text"), idxPath, epochId = 2L)
    assert(graft.operators.TrainOps5.committedVersion(idxPath).contains(2),
      "replayed epoch bumped the version — double-ingest")
    assert(graft.operators.TrainOps5.queryBm25Index(spark, idxPath).collect().toSeq == streamed)
    // a genuinely new epoch still appends
    Streaming.bm25IngestBatch(Seq((6L, "novel capacitor lifetime analysis"))
      .toDF("doc_id", "text"), idxPath, epochId = 3L)
    assert(graft.operators.TrainOps5.committedVersion(idxPath).contains(3))
    // the cumulative _EPOCHS ledger: reusing an OLD epoch id against the
    // longer chain is also a no-op (not just the latest epoch — beyond
    // Structured Streaming's own replay contract)
    val afterNew = graft.operators.TrainOps5.queryBm25Index(spark, idxPath).collect().toSeq
    Streaming.bm25IngestBatch(docs.take(2).toDF("doc_id", "text"), idxPath, epochId = 0L)
    assert(graft.operators.TrainOps5.committedVersion(idxPath).contains(3),
      "old-epoch reuse bumped the version — double-ingest")
    // ...and the ledger survives compaction + vacuum, which retire the
    // old stats versions together with their per-version markers
    graft.operators.TrainOps5.compactBm25Index(spark, idxPath)
    graft.operators.TrainOps5.vacuumBm25Index(idxPath, 0L)
    assert(!new java.io.File(s"$idxPath/stats_v1").exists(),
      "precondition: compaction retired the old stats version")
    Streaming.bm25IngestBatch(docs.take(2).toDF("doc_id", "text"), idxPath, epochId = 1L)
    assert(graft.operators.TrainOps5.committedVersion(idxPath).contains(3),
      "old-epoch reuse after compaction double-ingested")
    assert(graft.operators.TrainOps5.queryBm25Index(spark, idxPath).collect().toSeq == afterNew)
  }

  test("epoch ledger commits atomically with the version: no annotation file is load-bearing") {
    // the interleaving the old side-file design could not survive: a
    // writer dies after the version's _SUCCESS but before any
    // post-commit file lands. With the ledger INSIDE the stats row
    // there is nothing after the commit point to lose — simulate the
    // worst case by deleting every _EPOCH_* annotation and replaying.
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("bm25at").toString
    val idx = s"$base/index"
    Streaming.bm25IngestBatch(Seq((0L, "alpha beta"), (1L, "gamma delta"))
      .toDF("doc_id", "text"), idx, epochId = 0L)
    Streaming.bm25IngestBatch(Seq((2L, "epsilon zeta"))
      .toDF("doc_id", "text"), idx, epochId = 1L)
    assert(graft.operators.TrainOps5.committedVersion(idx).contains(1))
    // kill every post-commit annotation (and prove no legacy side-file
    // is being written at all — the torn-write hazard is gone by
    // construction, not by careful writing)
    (0 to 1).foreach { v =>
      assert(!new java.io.File(s"$idx/stats_v$v/_EPOCHS").exists(),
        "atomic design must not write the legacy side-file ledger")
      new java.io.File(s"$idx/stats_v$v").listFiles()
        .filter(_.getName.startsWith("_EPOCH_")).foreach(f => assert(f.delete()))
    }
    Streaming.bm25IngestBatch(Seq((0L, "alpha beta"), (1L, "gamma delta"))
      .toDF("doc_id", "text"), idx, epochId = 0L)
    Streaming.bm25IngestBatch(Seq((2L, "epsilon zeta"))
      .toDF("doc_id", "text"), idx, epochId = 1L)
    assert(graft.operators.TrainOps5.committedVersion(idx).contains(1),
      "replay after annotation loss double-ingested — ledger was not atomic")
  }

  test("legacy side-file ledgers: honored when valid, loud when torn, walked past when a version is ledger-less") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("bm25lg").toString
    val idx = s"$base/index"
    // a pre-migration chain: stats row has no epochs column, history
    // lives in the _EPOCHS side-file
    graft.operators.TrainOps5.buildBm25Index(
      Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text"), idx)
    Seq((2L, 4L)).toDF("n_docs", "t_tokens")
      .write.mode("overwrite").parquet(s"$idx/stats_v0")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$idx/stats_v0/_EPOCHS"), "5\n6\n".getBytes("UTF-8"))
    Streaming.bm25IngestBatch(Seq((9L, "eta theta"))
      .toDF("doc_id", "text"), idx, epochId = 5L)
    assert(graft.operators.TrainOps5.committedVersion(idx).contains(0),
      "valid legacy ledger was ignored — replayed epoch re-ingested")
    // a genuinely new epoch appends AND migrates the ledger into the
    // committed stats row (5, 6 carried forward)
    Streaming.bm25IngestBatch(Seq((9L, "eta theta"))
      .toDF("doc_id", "text"), idx, epochId = 7L)
    assert(graft.operators.TrainOps5.committedVersion(idx).contains(1))
    assert(graft.operators.TrainOps5.committedEpochs(spark, idx) == Set(5L, 6L, 7L))
    // a ledger-less newest version (legacy append that carried nothing)
    // must fall back to the older version's ledger, not re-open history
    Seq((3L, 6L)).toDF("n_docs", "t_tokens")
      .write.mode("overwrite").parquet(s"$idx/stats_v2")
    assert(graft.operators.TrainOps5.committedVersion(idx).contains(2))
    assert(graft.operators.TrainOps5.committedEpochs(spark, idx) == Set(5L, 6L, 7L),
      "ledger-less newest version re-opened the ingest history")
    // a torn legacy ledger fails loudly with a descriptive error, never
    // parses a truncated id as a different epoch
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$idx/stats_v2/_EPOCHS"), "12x4\n".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      graft.operators.TrainOps5.committedEpochs(spark, idx)
    }
    assert(ex.getMessage.contains("corrupt epoch ledger"))
  }

  test("stream_bm25_ingest survives registry invalidation: re-invocation after clearIndexState rebuilds, never re-appends") {
    // the failure mode: clearIndexState drops the ingest memo while the
    // index files persist at the pid-keyed path; a naive re-invocation
    // would append the four trigger slices AGAIN onto the committed
    // chain (postings doubled, ~2x scores). The re-entry must rebuild
    // from scratch instead.
    val a = Streaming.queries("stream_bm25_ingest")(spark, sf).collect().toSeq
    graft.operators.TrainOps5.clearIndexState()
    val b = Streaming.queries("stream_bm25_ingest")(spark, sf).collect().toSeq
    assert(a == b, "re-ingest after registry invalidation diverged (double-ingest)")
  }

  test("gate dictionary cache: one frame per committed version, invalidated by append and clearIndexState") {
    val spark2 = spark
    import spark2.implicits._
    val idxPath = java.nio.file.Files.createTempDirectory("bm25gd").toString + "/index"
    graft.operators.TrainOps5.buildBm25Index(
      Seq((0L, "alpha beta"), (1L, "beta gamma")).toDF("doc_id", "text"), idxPath)
    def view = graft.operators.TrainOps5.openBm25View(spark, idxPath)
    val d0 = Streaming.gateDictionary(spark, idxPath, view)
    // a second trigger at the same committed version reuses the SAME
    // persisted frame — zero dictionary IO in steady state
    assert(Streaming.gateDictionary(spark, idxPath, view) eq d0)
    assert(d0.storageLevel.useMemory, "the steady-state frame is persisted")
    // an append commits a new version -> new frame, old one unpersisted
    graft.operators.TrainOps5.appendBm25Index(
      Seq((2L, "gamma delta")).toDF("doc_id", "text"), idxPath)
    val v1 = view
    assert(v1.version == 1)
    val d1 = Streaming.gateDictionary(spark, idxPath, v1)
    assert(!(d1 eq d0))
    assert(!d0.storageLevel.useMemory, "superseded dictionary must be unpersisted")
    assert(d1.collect().map(_.getString(0)).toSet ==
      Set("alpha", "beta", "gamma", "delta"))
    // the in-place-rewrite contract drops the cache entirely
    graft.operators.TrainOps5.clearIndexState()
    assert(!d1.storageLevel.useMemory)
    assert(!(Streaming.gateDictionary(spark, idxPath, view) eq d1))
  }

  test("gate dictionary LRU: beyond GATE_DICT_MAX paths the eldest frame is evicted and unpersisted") {
    val spark2 = spark
    import spark2.implicits._
    graft.operators.TrainOps5.clearIndexState()
    // gateDictionary only touches view.dfreq, so synthetic views with
    // tiny frames exercise the cache without building real indexes
    def mkView = graft.operators.TrainOps5.Bm25View(
      null, null, Seq(("t", 1L)).toDF("token", "df"), 0)
    val first = Streaming.gateDictionary(spark, "/lru_spec/p0", mkView)
    assert(first.storageLevel.useMemory)
    (1 to Streaming.GATE_DICT_MAX).foreach { i =>
      Streaming.gateDictionary(spark, s"/lru_spec/p$i", mkView)
    }
    assert(!first.storageLevel.useMemory,
      "eldest frame must be unpersisted when the LRU bound evicts it")
    graft.operators.TrainOps5.clearIndexState()
  }

  test("qualityGate runs UNCHANGED on a stream; per-trigger union equals the batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "a b"),                                    // too_short
      (3L, "x x x x x x x x x x"),                    // degenerate repetition
      (4L, ""),                                       // empty -> too_short
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    // stateless projection: append mode, no watermark, no state store
    val q = Streaming.qualityGate(df)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("qg").start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      def canon(dfx: org.apache.spark.sql.DataFrame) = dfx
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val streamed = canon(spark.table("qg"))
      val batch = canon(Streaming.qualityGate(docs.toDF("doc_id", "text")))
      assert(streamed == batch, s"\nstream: $streamed\nbatch:  $batch")
      val verdicts = streamed.map(t => t._1 -> t._4).toMap
      assert(verdicts(2L) == "too_short" && verdicts(4L) == "too_short")
      assert(verdicts(1L) == "pass" || verdicts(1L) == "low_score") // model decides
      assert(streamed.size == 5)
    } finally q.stop()
  }
  test("ivf ingest stream: atomic version bumps; streamed chain equals one-shot; epochs exactly-once; orphan deltas invisible") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    // deterministic 24-vector corpus, 16 dims, three 8-vector triggers
    val vecs = (0L until 24L).map { i =>
      (i, Seq.tabulate(16)(j => math.sin(i * 7.0 + j * 3.0).toFloat))
    }
    def qsOf(rows: Seq[(Long, Seq[Float])]) = rows.take(3).toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    val base = java.nio.file.Files.createTempDirectory("ivfsi").toString
    val idx = s"$base/index"
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.ivfIngestStream(mem.toDF().toDF("vec_id", "embedding"), idx)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      vecs.grouped(8).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    } finally q.stop()
    // three triggers -> versions 0..2, cumulative ledger atomic with v2
    assert(Similarity.committedIngestVersion(spark, idx).contains(2))
    assert(Similarity.committedIngestEpochs(spark, idx) == Set(0L, 1L, 2L))
    // the streamed chain serves exactly what a one-shot ingest under
    // the same (trigger-0-sampled) quantizer serves
    val ref = s"$base/ref"
    Similarity.buildIvfStreamQuantizer(
      vecs.take(8).toDF("vec_id", "embedding"), ref)
    Similarity.ivfIngestCommit(vecs.toDF("vec_id", "embedding"), ref, 0, Seq(0L))
    def serve(path: String) = Similarity.queryIvfStreamedIndex(spark, path, qsOf(vecs))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val streamed = serve(idx)
    assert(streamed.nonEmpty)
    assert(streamed == serve(ref),
      "streamed ingest chain diverged from the one-shot assignment")
    // exactly-once: replaying a committed-but-unacked epoch is a no-op
    Streaming.ivfIngestBatch(
      vecs.takeRight(8).toDF("vec_id", "embedding"), idx, epochId = 2L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(2),
      "replayed epoch bumped the version - double-ingest")
    // ...and so is reusing an OLD epoch id against the longer chain
    Streaming.ivfIngestBatch(
      vecs.take(8).toDF("vec_id", "embedding"), idx, epochId = 0L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(2))
    assert(serve(idx) == streamed)
    // an orphan vdelta with no vstats (writer died between the two) is
    // invisible to readers and the next genuine epoch overwrites it
    Seq((999L, Seq.fill(16)(9.9f))).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("cv"),
        lit(0L).as("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$idx/vdelta_3")
    assert(Similarity.committedIngestVersion(spark, idx).contains(2),
      "orphan vdelta became visible without its vstats commit")
    assert(serve(idx) == streamed)
    val extra = (100L until 104L).map { i =>
      (i, Seq.tabulate(16)(j => math.cos(i * 5.0 + j * 11.0).toFloat))
    }
    Streaming.ivfIngestBatch(extra.toDF("vec_id", "embedding"), idx, epochId = 3L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(3))
    assert(Similarity.committedIngestEpochs(spark, idx) == Set(0L, 1L, 2L, 3L))
    val after = spark.read.schema(Similarity.ivfxCorpusSchema)
      .parquet(s"$idx/vdelta_3")
    assert(after.filter(col("vec_id") === 999L).count() == 0,
      "retry did not overwrite the orphan delta")
    assert(after.count() == 4)
  }
  test("ivf ingest compaction: fold + retire + vacuum invisible to serve; ledger survives; appends continue") {
    val spark2 = spark
    import spark2.implicits._
    import graft.operators.Similarity
    val vecs = (0L until 24L).map { i =>
      (i, Seq.tabulate(16)(j => math.sin(i * 13.0 + j * 5.0).toFloat))
    }
    val qs = vecs.take(3).toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    val idx = java.nio.file.Files.createTempDirectory("ivfsc").toString + "/index"
    vecs.grouped(6).zipWithIndex.foreach { case (g, i) =>
      Streaming.ivfIngestBatch(g.toDF("vec_id", "embedding"), idx, i.toLong)
    }
    assert(Similarity.committedIngestVersion(spark, idx).contains(3))
    def serve() = Similarity.queryIvfStreamedIndex(spark, idx, qs)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val before = serve()
    // grace-marked compaction: folded sources retired, NOT deleted —
    // an in-flight reader that resolved roots pre-compaction finishes
    Similarity.compactIvfIngest(spark, idx, graceMs = 60000L)
    assert(new java.io.File(s"$idx/vcompact_3/_SUCCESS").exists())
    (0 to 3).foreach { k =>
      assert(new java.io.File(s"$idx/vdelta_$k/_RETIRED").exists(),
        s"vdelta_$k not grace-retired") }
    assert(serve() == before, "compaction changed served rows")
    // vacuum honors the retirement-time grace even when asked for 0
    Similarity.vacuumIvfIngest(spark, idx, 0L)
    assert(new java.io.File(s"$idx/vdelta_0").exists(),
      "vacuum deleted inside the grace the compactor promised")
    // the ledger rides in vstats (untouched by compaction): replays
    // and old-epoch reuse stay no-ops after the fold
    assert(Similarity.committedIngestEpochs(spark, idx) == Set(0L, 1L, 2L, 3L))
    Streaming.ivfIngestBatch(vecs.take(6).toDF("vec_id", "embedding"), idx, epochId = 1L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(3))
    assert(serve() == before)
    // a genuinely new epoch appends on top of the compacted base
    val extra = (200L until 204L).map { i =>
      (i, Seq.tabulate(16)(j => math.cos(i * 3.0 + j * 7.0).toFloat))
    }
    Streaming.ivfIngestBatch(extra.toDF("vec_id", "embedding"), idx, epochId = 4L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(4))
    assert(Similarity.ingestReadRoots(spark, idx, 4) ==
      Seq(s"$idx/vcompact_3", s"$idx/vdelta_4"),
      "reader must substitute the compacted base for the folded deltas")
  }

  test("ivf ingest: an EMPTY first trigger never freezes an empty quantizer; bootstrap defers to the first data") {
    val spark2 = spark
    import spark2.implicits._
    import graft.operators.Similarity
    val idx = java.nio.file.Files.createTempDirectory("ivfeb").toString + "/index"
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    // batch 0 arrives empty (the standard batch-0-before-data and
    // restart cases): nothing may be committed and ABOVE ALL no
    // quantizer may be frozen from zero points
    Streaming.ivfIngestBatch(empty, idx, epochId = 0L)
    assert(Similarity.committedIngestVersion(spark, idx).isEmpty,
      "empty trigger committed a version")
    assert(!new java.io.File(s"$idx/centroids").exists(),
      "empty trigger froze a zero-centroid quantizer")
    // the first NON-empty trigger bootstraps; a later empty one is a
    // harmless skip; data after that is still absorbed
    val vecs = (0L until 16L).map { i =>
      (i, Seq.tabulate(16)(j => math.sin(i * 11.0 + j * 3.0).toFloat))
    }
    Streaming.ivfIngestBatch(vecs.take(8).toDF("vec_id", "embedding"), idx, 1L)
    Streaming.ivfIngestBatch(empty, idx, epochId = 2L)
    Streaming.ivfIngestBatch(vecs.drop(8).toDF("vec_id", "embedding"), idx, 3L)
    assert(Similarity.committedIngestEpochs(spark, idx) == Set(1L, 3L))
    val qs = vecs.take(2).toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    val served = Similarity.queryIvfStreamedIndex(spark, idx, qs).collect()
    assert(served.nonEmpty, "vectors ingested after the empty trigger were dropped")
  }

  test("ivf compaction crash in the commit->retire window: the next maintenance pass re-retires the folded sources") {
    val spark2 = spark
    import spark2.implicits._
    import graft.operators.Similarity
    val vecs = (0L until 24L).map { i =>
      (i, Seq.tabulate(16)(j => math.sin(i * 17.0 + j * 5.0).toFloat))
    }
    val idx = java.nio.file.Files.createTempDirectory("ivfcw").toString + "/index"
    vecs.grouped(6).zipWithIndex.foreach { case (g, i) =>
      Streaming.ivfIngestBatch(g.toDF("vec_id", "embedding"), idx, i.toLong)
    }
    Similarity.compactIvfIngest(spark, idx, graceMs = 60000L)
    // simulate the compactor dying AFTER committing vcompact_3 but
    // BEFORE retiring the folded sources: strip the markers
    (0 to 3).foreach { k =>
      new java.io.File(s"$idx/vdelta_$k/_RETIRED").delete()
    }
    // a repeat compaction finds nothing to fold but must still sweep
    Similarity.compactIvfIngest(spark, idx, graceMs = 60000L)
    (0 to 3).foreach { k =>
      assert(new java.io.File(s"$idx/vdelta_$k/_RETIRED").exists(),
        s"vdelta_$k leaked after a commit-window crash (compact pass)") }
    // ...and so must vacuum, the other maintenance face
    (0 to 3).foreach { k =>
      new java.io.File(s"$idx/vdelta_$k/_RETIRED").delete()
    }
    Similarity.vacuumIvfIngest(spark, idx, graceMs = 60000L)
    (0 to 3).foreach { k =>
      assert(new java.io.File(s"$idx/vdelta_$k/_RETIRED").exists(),
        s"vdelta_$k leaked after a commit-window crash (vacuum pass)") }
    // a superseded OLDER vcompact (dead fold's leftovers) is swept too
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    spark.read.schema(Similarity.ivfxCorpusSchema).parquet(s"$idx/vcompact_3")
      .limit(1).write.partitionBy("cent_id").parquet(s"$idx/vcompact_1")
    Similarity.vacuumIvfIngest(spark, idx, graceMs = 60000L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$idx/vcompact_1/_RETIRED")),
      "superseded older vcompact not retired")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/vcompact_3/_RETIRED")),
      "the LIVE vcompact must never be retired")
    // zero-grace vacuum (after the promised grace is also stripped for
    // the test) physically deletes what it re-retired
    (0 to 3).foreach { k =>
      new java.io.File(s"$idx/vdelta_$k/_RETIRED").delete()
    }
    Similarity.vacuumIvfIngest(spark, idx, graceMs = 0L)
    (0 to 3).foreach { k =>
      assert(!new java.io.File(s"$idx/vdelta_$k").exists(),
        s"vdelta_$k survived a zero-grace sweep") }
    // serve still answers from the compacted base alone
    val qs = vecs.take(2).toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    assert(Similarity.queryIvfStreamedIndex(spark, idx, qs).collect().nonEmpty)
  }

  test("ivf gate scores each trigger against the static index; union over triggers equals the batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    // indexed corpus: 20 UNIT-NORM vectors (the embeddings-table
    // contract; self-dot is then the strict maximum, so a verbatim
    // copy's best match is deterministic) ingested once through the
    // streamed protocol (the gate probes the committed chain)
    val corpus = (0L until 20L).map { i =>
      val raw = Array.tabulate(16)(j => math.sin(i * 7.0 + j * 3.0))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i, raw.map(x => (x / norm).toFloat).toSeq)
    }
    val idx = java.nio.file.Files.createTempDirectory("ivfg").toString + "/index"
    Streaming.ivfIngestBatch(corpus.toDF("vec_id", "embedding"), idx, 0L)
    val incoming = Seq(
      (100L, corpus(5)._2),                                  // verbatim re-ingest
      // near-zero magnitude: every int64 dot is ≤ 16·10³·10⁶ — five
      // orders below the threshold, so "pass" is deterministic
      (101L, Seq.fill(16)(1e-3f)),
      (102L, corpus(11)._2.map(x => x + 1e-4f)))             // near-dup
    val mem = MemoryStream[(Long, Seq[Float])]
    val buf = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = Streaming.ivfGateBatch(batch.toDF(), idx).collect()
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      mem.addData(incoming.take(1): _*); q.processAllAvailable()
      mem.addData(incoming.drop(1): _*); q.processAllAvailable()
    } finally q.stop()
    def canon(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val streamed = canon(buf.toSeq)
    val batchTwin = canon(
      Streaming.ivfGateBatch(incoming.toDF("vec_id", "embedding"), idx).collect().toSeq)
    assert(streamed == batchTwin, s"\nstream: $streamed\nbatch:  $batchTwin")
    val verdicts = streamed.map(t => t._1 -> t._4).toMap
    assert(verdicts(100L) == "dup_suspect", "a verbatim re-ingest must be flagged")
    assert(verdicts(102L) == "dup_suspect", "a near-identical vector must be flagged")
    assert(verdicts(101L) == "pass")
    val matches = streamed.map(t => t._1 -> t._2).toMap
    assert(matches(100L) == 5L, "the copy's best match is its indexed original")
    assert(matches(102L) == 11L)
  }

  test("ivf ingest torn-ledger read: a vstats dir without _SUCCESS is invisible and the genuine retry lands cleanly") {
    val spark2 = spark
    import spark2.implicits._
    import graft.operators.Similarity
    val vecs = (0L until 18L).map { i =>
      (i, Seq.tabulate(16)(j => math.sin(i * 23.0 + j * 7.0).toFloat))
    }
    val idx = java.nio.file.Files.createTempDirectory("ivftl").toString + "/index"
    vecs.grouped(6).zipWithIndex.foreach { case (g, i) =>
      Streaming.ivfIngestBatch(g.toDF("vec_id", "embedding"), idx, i.toLong)
    }
    assert(Similarity.committedIngestVersion(spark, idx).contains(2))
    val qs = vecs.take(2).toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("qv"))
    def serve() = Similarity.queryIvfStreamedIndex(spark, idx, qs)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val before = serve()
    // writer died INSIDE the vstats_3 write: delta present, stats
    // parquet present, _SUCCESS missing — a torn ledger. Readers must
    // resolve version 2 and the old epoch set; the serve is unchanged.
    Seq((300L, Seq.fill(16)(1.5f))).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.functions.Expr.quantVec(col("embedding")).as("cv"),
        lit(0L).as("cent_id"))
      .write.mode("overwrite").partitionBy("cent_id").parquet(s"$idx/vdelta_3")
    Seq((1L, Seq(0L, 1L, 2L, 3L))).toDF("n_vecs", "epochs")
      .write.mode("overwrite").parquet(s"$idx/vstats_3")
    new java.io.File(s"$idx/vstats_3/_SUCCESS").delete()
    assert(Similarity.committedIngestVersion(spark, idx).contains(2),
      "torn vstats became the committed version")
    assert(Similarity.committedIngestEpochs(spark, idx) == Set(0L, 1L, 2L),
      "epochs read from a torn ledger")
    assert(serve() == before)
    // the genuine retry of epoch 3 overwrites BOTH torn halves and
    // commits atomically; a replay after that is a no-op
    val extra = (400L until 404L).map { i =>
      (i, Seq.tabulate(16)(j => math.cos(i * 3.0 + j * 13.0).toFloat))
    }
    Streaming.ivfIngestBatch(extra.toDF("vec_id", "embedding"), idx, epochId = 3L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(3))
    assert(Similarity.committedIngestEpochs(spark, idx) == Set(0L, 1L, 2L, 3L))
    val d3 = spark.read.schema(Similarity.ivfxCorpusSchema).parquet(s"$idx/vdelta_3")
    assert(d3.filter(col("vec_id") === 300L).count() == 0,
      "retry did not overwrite the torn delta")
    assert(d3.count() == 4)
    Streaming.ivfIngestBatch(extra.toDF("vec_id", "embedding"), idx, epochId = 3L)
    assert(Similarity.committedIngestVersion(spark, idx).contains(3),
      "replayed epoch re-ingested after the torn-ledger recovery")
  }
}
