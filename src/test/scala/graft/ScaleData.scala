package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-corpus generator (test scope, not shipped).
  *
  * Rebuilds the two synthetic corpora the scale checks use, so
  * StressSpec and the BASELINE 10× numbers are reproducible in a
  * fresh checkout:
  *
  *   Test/runMain graft.ScaleData scale10 /tmp/scale10   (from sf0.1)
  *   Test/runMain graft.ScaleData stress  /tmp/stress
  *
  * scale10 — every table at 10× via key-offset copies. Copied
  * documents get alternate tokens salted with the copy index so
  * cross-copy Jaccard stays far below near-dup thresholds (pair ops
  * must scale ~linearly in the copy count, not quadratically);
  * copied embeddings are circularly shifted so copies decorrelate
  * while preserving norms and the per-label distribution.
  *
  * stress — the 20×/40× near-dup corpus StressSpec expects:
  * documents 0..9999 mutually distinct, doc N+10000 a near-identical
  * copy of doc N (one appended token); embeddings: 20 000 64-dim
  * vectors where vec N+1000 = vec N + 1e-3 deterministic noise for
  * N < 1000, the rest decorrelated shifts. All noise is hash-derived
  * from ids — no RNG state, same bytes on every run.
  */
object ScaleData {
  private val COPIES = 10

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val outDir = args(1)
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "scale10"   => scale10(spark, srcDir, outDir)
      case "scale100"  => scale100(spark, srcDir, outDir)
      case "corpus100" => corpus100(spark, srcDir, outDir)
      case "stress"    => stress(spark, srcDir, outDir)
      case "clustered" =>
        // args: clustered <outDir> <nClusters> <members>
        clustered(spark, outDir, args(2).toInt, args(3).toInt)
    }
    spark.stop()
  }

  /** Union of `copies` key-offset copies of `df`. Each key column
    * shifts by the offset of its key DOMAIN — computed once from the
    * domain's owning table and shared by every table that references
    * it — so cross-copy referential integrity survives dimensions
    * with unreferenced tail keys (standard TPC-H leaves ~1/3 of
    * customers orderless; per-table maxes would desynchronize the
    * shifts and distort copy-join selectivities).
    */
  private def copied(df: DataFrame, offsets: Map[String, Long], copies: Int)
      (tweak: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map { i =>
      val shifted = offsets.foldLeft(df) { case (acc, (k, off)) =>
        acc.withColumn(k, col(k) + lit(i * off))
      }
      tweak(shifted, i)
    }.reduce(_ unionByName _)

  /** max(key)+1 over the domain's owning table. */
  private def keyDomain(df: DataFrame, k: String): Long =
    df.agg(max(col(k))).first().getLong(0) + 1L

  private def noTweak(df: DataFrame, i: Int): DataFrame = df

  def scale10(s: SparkSession, src: String, out: String): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.repartition(8).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // one offset per key domain, from the owning table
    val custOff = keyDomain(Tables.customer(s, src), "c_custkey")
    val suppOff = keyDomain(Tables.supplier(s, src), "s_suppkey")
    val partOff = keyDomain(Tables.part(s, src), "p_partkey")
    val ordOff = keyDomain(Tables.orders(s, src), "o_orderkey")

    w(Tables.region(s, src), "region")
    w(Tables.nation(s, src), "nation")
    w(copied(Tables.customer(s, src), Map("c_custkey" -> custOff), COPIES)(noTweak),
      "customer")
    w(copied(Tables.supplier(s, src), Map("s_suppkey" -> suppOff), COPIES)(noTweak),
      "supplier")
    w(copied(Tables.part(s, src), Map("p_partkey" -> partOff), COPIES)(noTweak), "part")
    w(copied(Tables.orders(s, src),
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff), COPIES)(noTweak), "orders")
    w(copied(Tables.lineitem(s, src),
      Map("l_orderkey" -> ordOff, "l_partkey" -> partOff, "l_suppkey" -> suppOff),
      COPIES)(noTweak), "lineitem")
    val ev = Tables.events(s, src)
    w(copied(ev, Map("event_id" -> keyDomain(ev, "event_id"),
      "user_id" -> keyDomain(ev, "user_id")), COPIES)(noTweak), "events")
    // Salt alternate tokens with the copy index: copies stay ~0 Jaccard
    // to each other, so near-dup pair counts scale with the data, not
    // quadratically with the copy count.
    val docs = Tables.documents(s, src)
    w(copied(docs, Map("doc_id" -> keyDomain(docs, "doc_id")), COPIES) { (df, i) =>
      if (i == 0) df
      else df.withColumn("text", array_join(
        expr(s"transform(split(text, ' '), (t, p) -> IF(p % 2 = 0, concat(t, 'x$i'), t))"),
        " "))
    }, "documents")
    // Circular shift per copy: same norms/labels, decorrelated copies.
    val emb = Tables.embeddings(s, src)
    w(copied(emb, Map("vec_id" -> keyDomain(emb, "vec_id")), COPIES) { (df, i) =>
      if (i == 0) df
      else {
        val k = i % 64
        df.withColumn("embedding",
          expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), slice(embedding, 1, $k))"))
      }
    }, "embeddings")
    // These writers overwrite corpora in place; drop any geometry
    // counts this JVM memoized for the old contents (Dedup contract).
    operators.Dedup.invalidateCorpusSizes()
    operators.Similarity.clearTrainedState()
    operators.TrainOps5.clearIndexState()
    println(s"[scaledata] scale10 written to $out")
  }

  /** ~sf10 relational corpus: 100 key-offset copies of sf0.1's TPC-H
    * tables ONLY (60M-row lineitem) — the third join-surface scale
    * point (1x, 10x battery, 100x headline) for BASELINE.md. Corpus
    * tables are omitted: the dedup/ANN ops have their own 40x
    * adversarial stress corpus.
    */
  def scale100(s: SparkSession, src: String, out: String): Unit = {
    val copies = 100
    def w(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
    val custOff = keyDomain(Tables.customer(s, src), "c_custkey")
    val suppOff = keyDomain(Tables.supplier(s, src), "s_suppkey")
    val partOff = keyDomain(Tables.part(s, src), "p_partkey")
    val ordOff = keyDomain(Tables.orders(s, src), "o_orderkey")
    w(Tables.region(s, src), "region")
    w(Tables.nation(s, src), "nation")
    w(copied(Tables.customer(s, src), Map("c_custkey" -> custOff), copies)(noTweak),
      "customer")
    w(copied(Tables.supplier(s, src), Map("s_suppkey" -> suppOff), copies)(noTweak),
      "supplier")
    w(copied(Tables.part(s, src), Map("p_partkey" -> partOff), copies)(noTweak), "part")
    w(copied(Tables.orders(s, src),
      Map("o_orderkey" -> ordOff, "o_custkey" -> custOff), copies)(noTweak), "orders")
    w(copied(Tables.lineitem(s, src),
      Map("l_orderkey" -> ordOff, "l_partkey" -> partOff, "l_suppkey" -> suppOff),
      copies)(noTweak), "lineitem")
    // These writers overwrite corpora in place; drop any geometry
    // counts this JVM memoized for the old contents (Dedup contract).
    operators.Dedup.invalidateCorpusSizes()
    operators.Similarity.clearTrainedState()
    operators.TrainOps5.clearIndexState()
    println(s"[scaledata] scale100 written to $out")
  }

  /** 100× corpus tables ONLY (500k docs / 200k vectors from sf0.1's
    * 5k/2k) — the third scale point for the capped dedup/ANN families
    * (1× = sf0.1 battery, 10× = scale10, 100× = here). Documents use
    * the same alternate-token copy salt as scale10 (cross-copy Jaccard
    * ≈ 0, so near-dup pair work scales linearly in the copy count).
    * Embeddings: a circular shift only yields 64 distinct transforms
    * for 64 dims, so copies ≥ 64 would alias copy i−64 bit-for-bit and
    * plant 72k spurious identical-vector groups; past 63 the copy also
    * negates even dims (norm-preserving, decorrelating), giving 128
    * distinct transforms for 100 copies. All deterministic — no RNG.
    */
  def corpus100(s: SparkSession, src: String, out: String): Unit = {
    val copies = 100
    def w(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
    val docs = Tables.documents(s, src)
    w(copied(docs, Map("doc_id" -> keyDomain(docs, "doc_id")), copies) { (df, i) =>
      if (i == 0) df
      else df.withColumn("text", array_join(
        expr(s"transform(split(text, ' '), (t, p) -> IF(p % 2 = 0, concat(t, 'x$i'), t))"),
        " "))
    }, "documents")
    val emb = Tables.embeddings(s, src)
    w(copied(emb, Map("vec_id" -> keyDomain(emb, "vec_id")), copies) { (df, i) =>
      if (i == 0) df
      else {
        val k = i % 64
        val shifted =
          if (k == 0) col("embedding")
          else concat(slice(col("embedding"), k + 1, 64 - k), slice(col("embedding"), 1, k))
        val decorrelated =
          if (i < 64) shifted
          else transform(shifted, (x, j) => when(j % 2 === 0, -x).otherwise(x))
        df.withColumn("embedding", decorrelated)
      }
    }, "embeddings")
    // Events at 100x traffic: key-offset copies over the SAME 30-day
    // span — per-user volume stays constant (user_id is offset with
    // its domain) while per-window density grows 100x, which is the
    // hard direction for the window/funnel/sessionize/streaming-twin
    // surface (more traffic, not longer retention). Timestamps are
    // untouched so window counts stay comparable across scale points.
    val ev = Tables.events(s, src)
    w(copied(ev, Map("event_id" -> keyDomain(ev, "event_id"),
      "user_id" -> keyDomain(ev, "user_id")), copies)(noTweak), "events")
    // These writers overwrite corpora in place; drop any geometry
    // counts this JVM memoized for the old contents (Dedup contract).
    operators.Dedup.invalidateCorpusSizes()
    operators.Similarity.clearTrainedState()
    operators.TrainOps5.clearIndexState()
    println(s"[scaledata] corpus100 written to $out")
  }

  /** Clustered embeddings corpus (nClusters × members unit vectors,
    * 0.1-σ-scale deterministic noise around shared centers) — the case
    * IVF indexing exists for, written as a standard embeddings.parquet
    * so BenchIvf can measure the build/serve split on data where probe
    * calibration lands at a low cell fraction (the driver corpus is
    * near-isotropic, where calibration honestly climbs and serve is
    * information-theoretically linear). Same geometry family as
    * IndexSpec.clusteredCase, scaled by the arguments.
    */
  def clustered(s: SparkSession, out: String, nClusters: Int, members: Int): Unit = {
    import s.implicits._
    val rnd = new java.util.Random(42L)
    val dim = 64
    val centers = Seq.tabulate(nClusters) { c =>
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (c.toLong, v.map(x => x / n).toSeq)
    }
    val cdf = centers.toDF("cluster", "center")
    val emb = s.range(0L, nClusters.toLong * members).toDF("vec_id")
      .withColumn("cluster", col("vec_id") / lit(members.toLong) cast "long")
      .join(broadcast(cdf), "cluster")
      // deterministic bounded noise (no RNG state): sin of a per-(row,
      // dim) integer lattice, amplitude 0.1 — enough spread to make
      // cells non-trivial, small enough that members stay in-cluster
      .withColumn("noisy", expr(
        "transform(center, (x, j) -> x + 0.1d * sin(cast(vec_id * 7919 + j * 104729 as double)))"))
      .withColumn("__norm", expr("sqrt(aggregate(noisy, 0d, (a, x) -> a + x * x))"))
      .select(col("vec_id"),
        expr("transform(noisy, x -> cast(x / __norm as float))").as("embedding"),
        (col("cluster") % 16).cast("int").as("label"))
    emb.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // These writers overwrite corpora in place; drop any geometry
    // counts this JVM memoized for the old contents (Dedup contract).
    operators.Dedup.invalidateCorpusSizes()
    operators.Similarity.clearTrainedState()
    operators.TrainOps5.clearIndexState()
    println(s"[scaledata] clustered ($nClusters x $members) written to $out")
  }

  def stress(s: SparkSession, src: String, out: String): Unit = {
    // documents: 10 000 mutually-distinct base docs (20× sf0.01 via the
    // salted-copy scheme over sf0.1's 5 000), then near-identical
    // +10000 twins (one appended token keeps Jaccard ≈ n/(n+1)).
    val srcDocs = Tables.documents(s, src)
    val baseDocs = copied(srcDocs, Map("doc_id" -> keyDomain(srcDocs, "doc_id")), 2) { (df, i) =>
      if (i == 0) df
      else df.withColumn("text", array_join(
        expr(s"transform(split(text, ' '), (t, p) -> IF(p % 2 = 0, concat(t, 'x$i'), t))"),
        " "))
    }.filter(col("doc_id") < 10000)
    val twins = baseDocs
      .withColumn("doc_id", col("doc_id") + 10000L)
      .withColumn("text", concat(col("text"), lit(" twintoken")))
    baseDocs.unionByName(twins)
      .repartition(8).write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: 20 000 vectors. Base 0..999 from the source corpus;
    // 1000..1999 = base + 1e-3 hash-noise (planted near-identicals);
    // 2000..19999 decorrelated circular shifts of the source.
    val e = Tables.embeddings(s, src)
    val base1k = e.filter(col("vec_id") < 1000)
    val planted = base1k.withColumn("vec_id", col("vec_id") + 1000L)
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> CAST(x + (pmod(xxhash64(vec_id, i), 2000) - 1000) / 1e6 AS FLOAT))"))
    val rest = (1 to 9).map { i =>
      val k = (i * 7) % 64
      e.withColumn("vec_id", col("vec_id") + lit(i * 2000L))
        .withColumn("embedding",
          expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), slice(embedding, 1, $k))"))
    }.reduce(_ unionByName _).filter(col("vec_id") >= 2000)
    base1k.unionByName(planted).unionByName(rest)
      .repartition(8).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    // These writers overwrite corpora in place; drop any geometry
    // counts this JVM memoized for the old contents (Dedup contract).
    operators.Dedup.invalidateCorpusSizes()
    operators.Similarity.clearTrainedState()
    operators.TrainOps5.clearIndexState()
    println(s"[scaledata] stress written to $out")
  }
}
