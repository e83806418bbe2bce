package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** ann_pq_exact beyond the oracle gate: structural invariants of the
  * encoding, ADC self-consistency (the score IS the dot against the
  * reconstruction), and cluster-level serving quality on a corpus
  * with real structure (fine ranking is what PQ trades away; finding
  * the right REGION is what it must keep).
  */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  test("pq codes: one code per (vector, subspace); code ids come from the sampled donors") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.Expr.quantVec(col("embedding")).as("cv"))
    val n = e.count()
    val m = Similarity.pqModulus(n)
    val (cb, codes) = Similarity.pqEncode(e, m)
    assert(codes.count() == n * Similarity.PQ_M)
    assert(codes.groupBy("vec_id", "s").count().filter(col("count") > 1).count() == 0)
    val donors = cb.select("code_id").distinct().collect().map(_.getLong(0)).toSet
    val used = codes.select("code_id").distinct().collect().map(_.getLong(0)).toSet
    assert(used.subsetOf(donors))
    // codebooks are metadata-sized: PQ_M entries per donor
    assert(cb.count() == donors.size.toLong * Similarity.PQ_M)
  }

  test("ADC score equals the exact dot against the PQ reconstruction") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.Expr.quantVec(col("embedding")).as("cv"))
    val m = Similarity.pqModulus(e.count())
    val (cb, codes) = Similarity.pqEncode(e, m)
    val cwMap = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val codeMap = codes.collect()
      .groupBy(_.getLong(0))
      .map { case (v, rs) =>
        v -> rs.sortBy(_.getInt(1)).flatMap(r => cwMap((r.getInt(1), r.getLong(2))))
      }
    val queries = e.filter(col("vec_id") < 5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = Similarity.queries("ann_pq_exact")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case ((q, v), score) =>
      val recon = codeMap(v)
      val dot = queries(q).zip(recon).map { case (a, b) => a * b }.sum
      assert(score == dot, s"ADC($q,$v)=$score != dot vs reconstruction $dot")
    }
  }

  test("eval_retrieval_pq recomputes from the two heads it composes") {
    val got = Similarity.queries("eval_retrieval_pq")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == (0L until 5L).toSet)
    val truth = Similarity.queries("ann_quantized")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val cand = Similarity.queries("ann_pq_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    truth.groupBy(_._1).foreach { case (q, ts) =>
      val rel = cand.filter(c => c._1 == q && truth((c._1, c._2)))
      val rr = if (rel.isEmpty) 0L else 1000000L / rel.map(_._3).min
      assert(got(q) == ((ts.size.toLong, rel.size.toLong,
        rel.size.toLong * 1000000L / ts.size, rr)), s"query $q metric mismatch")
    }
  }

  test("ann_pq_trained: Lloyd-trained codebooks beat the sampled bootstrap on quantization error") {
    import graft.operators.IvfPq
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.DecimalType
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.Expr.quantVec(col("embedding")).as("cv"))
      .localCheckpoint(true)
    val m = Similarity.pqModulus(e.count())
    val sub = IvfPq.pqtSubvectors(e).localCheckpoint(true)
    val seeds = sub.filter(Similarity.md5Mod(col("vec_id"), m) === 0)
      .select(col("s"), col("vec_id").as("code_id"), col("sv").as("cw"))
    // total quantization error Σ min |sv − cw|² — the objective Lloyd
    // descends (cost + |sv|² restores the constant term)
    def inertia(cb: DataFrame): java.math.BigDecimal = {
      val cost = graft.functions.Expr.longDot(col("cw"), col("cw")) -
        lit(2L) * graft.functions.Expr.longDot(col("sv"), col("cw"))
      val best = graft.plans.TopK.topKPerGroup(
        sub.join(broadcast(cb), Seq("s"))
          .select(col("vec_id"), col("s"), col("code_id"),
            graft.functions.Expr.longDot(col("sv"), col("sv")).as("vv"),
            cost.as("cost")),
        Seq("vec_id", "s"), Seq(("cost", false), ("code_id", false)), 1)
      best.agg(sum((col("vv") + col("cost")).cast(DecimalType(38, 0))).as("i"))
        .collect()(0).getDecimal(0)
    }
    val sampled = inertia(seeds)
    val trained = inertia(IvfPq.pqTrain(sub, seeds))
    assert(trained.compareTo(sampled) < 0,
      s"trained codebooks must reduce quantization error: trained=$trained vs sampled=$sampled")
  }

  test("residual PQ beats raw PQ on reconstruction error over a clustered corpus") {
    import spark.implicits._
    import graft.operators.IvfPq
    // a corpus with real cluster structure, persisted so the full
    // ensureIvfx* index path (build, assign, PQ layers) is exercised
    val rnd = new java.util.Random(11L)
    val dim = 64
    val nClusters = 40
    val members = 50
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat)
    }
    val rows = for { c <- centers.indices; k <- 0 until members } yield {
      val v = centers(c).map(x => x + 0.1 * rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      ((c.toLong * members + k), v.map(x => (x / norm).toFloat).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_pqr_corpus").toString
    rows.toDF("vec_id", "embedding").repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val path = IvfPq.ensureIvfxPqResIndex(spark, dir)
    IvfPq.ensureIvfxPqIndex(spark, dir)
    val corpus = spark.read.schema(Similarity.ivfxCorpusSchema)
      .parquet(Similarity.liveCorpusPath(spark, path)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    val cents = spark.read.schema(Similarity.ivfxCentSchema)
      .parquet(s"$path/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def layer(sub: String): Map[Long, Array[Long]] = {
      val cw = spark.read.parquet(s"$path/$sub/codebook").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2).toArray).toMap
      spark.read.parquet(s"$path/$sub/codes").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("s"), r.getAs[Long]("code_id")))
        .groupBy(_._1)
        .map { case (v, cs) => v -> cs.sortBy(_._2).flatMap(c => cw((c._2, c._3))) }
    }
    val raw = layer("pq")
    val res = layer("pqr")
    def sq(x: Long): BigInt = BigInt(x) * BigInt(x)
    var rawErr = BigInt(0)
    var resErr = BigInt(0)
    corpus.foreach { case (v, cv, cent) =>
      val cvec = cents(cent)
      rawErr += cv.zip(raw(v)).map { case (a, b) => sq(a - b) }.sum
      resErr += cv.indices.map(i => sq(cv(i) - (cvec(i) + res(v)(i)))).sum
    }
    assert(resErr < rawErr,
      s"residual encoding must reconstruct strictly better inside cells: " +
        s"residual=$resErr vs raw=$rawErr")
    // and the served head keeps the region structure: top-10 of the
    // five standard queries (all cluster-0 members) stays in-cluster
    val top = IvfPq.queries("ann_ivfpq_residual")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(top.nonEmpty)
    val rate = top.count { case (q, v) => q / members == v / members }
      .toDouble / top.length
    assert(rate >= 0.9,
      s"residual IVFADC same-cluster rate $rate below 0.9")
  }

  test("clustered corpus: PQ top-10 lands in the query's own cluster") {
    import spark.implicits._
    val rnd = new java.util.Random(7L)
    val dim = 64
    val nClusters = 40
    val members = 50
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat)
    }
    val rows = for { c <- centers.indices; k <- 0 until members } yield {
      val v = centers(c).map(x => x + 0.1 * rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      ((c.toLong * members + k), v.map(x => (x / norm).toFloat).toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), graft.functions.Expr.quantVec(col("embedding")).as("cv"))
      .localCheckpoint(true)
    val m = Similarity.pqModulus(e.count())
    val (cb, codes) = Similarity.pqEncode(e, m)
    val qs = e.filter(col("vec_id") % (members * 4) === 0)
      .select(col("vec_id").as("query_id"), col("cv"),
        explode(sequence(lit(0), lit(Similarity.PQ_M - 1))).as("s"))
      .select(col("query_id"), col("s"),
        expr(s"slice(cv, s * ${Similarity.PQ_SUBD} + 1, ${Similarity.PQ_SUBD})").as("qv"))
    val lut = qs.join(broadcast(cb), Seq("s"))
      .select(col("query_id"), col("s"), col("code_id"),
        graft.functions.Expr.longDot(col("qv"), col("cw")).as("qdot"))
    val scored = codes.join(broadcast(lut), Seq("s", "code_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id")).agg(sum(col("qdot")).as("score"))
    val top = graft.plans.TopK.topKPerGroup(scored, Seq("query_id"),
      Seq(("score", true), ("vec_id", false)), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hit = top.count { case (q, v) => q / members == v / members }
    val rate = hit.toDouble / top.length
    assert(rate >= 0.9,
      s"PQ top-10 same-cluster rate $rate below 0.9 — compression lost the region structure")
  }
}
