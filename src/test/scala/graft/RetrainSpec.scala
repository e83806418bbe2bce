package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Retrain, Similarity}

class RetrainSpec extends AnyFunSuite {
  import TestSpark._

  test("kmeans_train: Lloyd trajectory — mass conserved, inertia non-increasing, deterministic") {
    val rows = Retrain.queries("kmeans_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val n = Tables.embeddings(spark, sf).count()
    val byIter = rows.groupBy(_._1)
    assert(byIter.keySet == (1L to Retrain.KM_ITERS.toLong).toSet)
    byIter.foreach { case (i, rs) =>
      assert(rs.map(_._3).sum == n, s"iter $i lost vectors")
      assert(rs.forall(_._4 >= 0), "squared distances are non-negative")
    }
    // Lloyd's invariant: total inertia (measured against the ENTERING
    // centroids) never increases round over round — assignment and
    // update each minimize it
    val totals = (1L to Retrain.KM_ITERS.toLong)
      .map(i => byIter(i).map(_._4).sum)
    totals.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * (1 + 1e-12), s"inertia increased: $totals")
    }
    // clusters only ever drop (empty cells vanish, none appear)
    val cells = (1L to Retrain.KM_ITERS.toLong)
      .map(i => byIter(i).map(_._2).toSet)
    cells.sliding(2).foreach { case Seq(a, b) => assert(b.subsetOf(a)) }
    // the whole trajectory is deterministic across invocations
    val again = Retrain.queries("kmeans_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq == rows.toSeq)
  }

  test("ivf_skew_report: measures the persisted exact-IVF index; policy arithmetic is integer-exact") {
    val rows = Retrain.queries("ivf_skew_report")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val n = Tables.embeddings(spark, sf).count()
    val total = rows.map(_._2).sum
    assert(total == n, "every corpus vector is in exactly one cell")
    // the report's cells ARE the persisted quantizer's cells
    val path = Similarity.ensureIvfxIndex(spark, sf)
    val centIds = spark.read.schema(Similarity.ivfxCentSchema)
      .parquet(s"$path/centroids").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == centIds)
    val k = rows.length.toLong
    val mx = rows.map(_._2).max
    rows.foreach { case (_, nv, share, rebuild) =>
      assert(share == nv * 1000000L / total)
      assert(rebuild == (mx * k > 8L * total), "verdict must be the global 8x-mean policy")
    }
  }

  test("quality_perceptron_train: epoch 1 sees every doc misclassified; training cuts errors; deterministic") {
    val rows = Retrain.queries("quality_perceptron_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (2 to 6).map(r.getLong).toVector))
    assert(rows.map(_._1).toSeq == (1L to Retrain.PCT_EPOCHS.toLong))
    val n = Tables.documents(spark, sf).count()
    assert(rows.head._2 == n, "w=0 gives margin 0 everywhere — epoch 1 updates on all docs")
    // training must find real signal: best epoch ≤ 30% of the corpus
    // misclassified (batch perceptron oscillates — asserted on the min,
    // not monotonicity, which it does not guarantee)
    assert(rows.map(_._2).min <= n * 3 / 10,
      s"perceptron never got below 30% errors: ${rows.map(_._2).toSeq}")
    // weights change across epochs (the loop is actually training)
    assert(rows.map(_._3).distinct.size > 1)
    val again = Retrain.queries("quality_perceptron_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), (2 to 6).map(r.getLong).toVector))
    assert(again.toSeq == rows.toSeq)
  }

  test("skew trigger fires on a collapsed corpus (the drifted-quantizer failure the policy exists for)") {
    val dir = java.nio.file.Files.createTempDirectory("skewemb").toString
    val s2 = spark
    import s2.implicits._
    // 360 near-identical vectors (one hot cell) + 40 scattered seeds
    val rows = (0 until 400).map { i =>
      val v = Array.fill(64)(0f)
      if (i < 360) { v(0) = 1f; v(1) = i * 1e-5f }
      else v(i % 64) = 1f
      (i.toLong, v.toSeq, "synth")
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rep = Retrain.queries("ivf_skew_report")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getBoolean(3)))
    assert(rep.map(_._1).max >= 360L, "the hot cell holds the collapsed mass")
    assert(rep.forall(_._2), "8x-mean policy must fire on the collapsed corpus")
  }
}
