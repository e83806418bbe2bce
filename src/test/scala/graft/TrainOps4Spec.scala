package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrainOps4

class TrainOps4Spec extends AnyFunSuite {
  import TestSpark._

  test("shuffle_epoch: permutation per epoch, different across epochs, contiguous shard positions") {
    val rows = TrainOps4.shuffleEpoch(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L))
    val nDocs = byEpoch(0L).length
    // every doc exactly once per epoch
    byEpoch.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
    }
    // positions are 1..n within each (epoch, shard)
    rows.groupBy(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard"))).foreach {
      case (_, rs) =>
        assert(rs.map(_.getAs[Long]("pos")).sorted.sameElements(1L to rs.length.toLong))
    }
    // the two epochs must produce different orders (md5 re-keys docs)
    def order(e: Long) = byEpoch(e).sortBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).map(_.getAs[Long]("doc_id")).toSeq
    assert(order(0L) != order(1L), "epochs must shuffle differently")
  }

  test("corpus_report: one row per source, ppm stats within bounds") {
    val rows = TrainOps4.corpusReport(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("source")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("total_tokens") > 0)
      val mean = r.getAs[Long]("mean_chars_ppm")
      assert(mean >= r.getAs[Long]("min_chars") * 1000000L)
      assert(mean <= r.getAs[Long]("max_chars") * 1000000L)
      val dup = r.getAs[Long]("dup_rate_ppm")
      assert(dup >= 0L && dup < 1000000L)
    }
  }

  test("sketch_cms_exact: CMS never undercounts, top-20 emitted in truth order") {
    val rows = TrainOps4.sketchCmsExact(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val truths = rows.map(_.getAs[Long]("true_cnt"))
    assert(truths.sameElements(truths.sorted(Ordering[Long].reverse)))
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("true_cnt"),
        s"CMS undercounted ${r.getAs[String]("w")}")
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("cms_est") - r.getAs[Long]("true_cnt"))
    }
  }

  test("sketch_bloom_exact: no false negatives; members always in bloom") {
    val rows = TrainOps4.sketchBloomExact(spark, sf).collect()
    assert(rows.length == 200, "100 copies + 100 novels")
    rows.foreach { r =>
      val (inB, isM, fp) = (r.getAs[Boolean]("in_bloom"),
        r.getAs[Boolean]("is_member"), r.getAs[Boolean]("false_positive"))
      if (isM) assert(inB, s"false NEGATIVE on ${r.getAs[Long]("doc_id")} — bloom broken")
      assert(fp == (inB && !isM))
    }
    // the 100 exact copies are members; the 100 novels are not
    assert(rows.count(_.getAs[Boolean]("is_member")) == 100)
  }

  test("sketch_quantile_exact: estimates within one bin of the exact order statistic") {
    import org.apache.spark.sql.functions._
    val rows = TrainOps4.sketchQuantileExact(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("q_pct")).toSeq == Seq(1L, 5L, 25L, 50L, 75L, 95L, 99L))
    val cents = graft.Tables.lineitem(spark, sf)
      .select((col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("c")).collect().map(_.getLong(0)).sorted
    val n = cents.length
    val binW = (cents.last - cents.head + 1024) / 1024 + 1
    rows.foreach { r =>
      val k = ((r.getAs[Long]("q_pct") * n + 99) / 100).toInt
      val exact = cents(k - 1)
      val est = r.getAs[Long]("est_cents")
      assert(math.abs(est - exact) <= binW,
        s"q${r.getAs[Long]("q_pct")}: est $est vs exact $exact (bin width $binW)")
    }
  }

  test("sketch_kmv_exact: estimate within the k=64 error band of the true cardinality") {
    val r = TrainOps4.sketchKmvExact(spark, sf).collect()(0)
    val (kk, truth, est) = (r.getAs[Long]("kk"),
      r.getAs[Long]("true_distinct"), r.getAs[Long]("est_distinct"))
    assert(kk <= 64)
    if (kk < 64) assert(est == truth, "below k the sketch IS the exact set")
    else {
      // KMV relative sigma ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
      assert(math.abs(est - truth).toDouble / truth <= 0.5,
        s"estimate $est too far from $truth")
    }
  }

  test("budget_select: greedy per-source selection never exceeds the budget, ranks contiguous") {
    val rows = TrainOps4.budgetSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).sameElements(1L to rs.length.toLong),
        s"$src: selected ranks must be a prefix")
      val cums = byRank.map(_.getAs[Long]("cum_tok"))
      assert(cums.last <= TrainOps4.TOKEN_BUDGET)
      // cum_tok really is the running sum of tok
      assert(cums.sameElements(byRank.map(_.getAs[Long]("tok")).scanLeft(0L)(_ + _).tail))
    }
  }

  test("corpus_diff: dispositions partition the union of snapshots and recompute from the slices") {
    val rows = TrainOps4.corpusDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Long]("old_len"), r.getAs[Long]("new_len"))))
      .toMap
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = ids.filter(id => id % 7 != 3 || id % 13 != 5)
    assert(rows.keySet == expected, "one row per doc in either snapshot")
    rows.foreach { case (id, (status, ol, nl)) =>
      val inOld = id % 7 != 3
      val inNew = id % 13 != 5
      val revised = id % 11 == 0
      if (!inOld) assert(status == "added" && ol == -1L && nl >= 0)
      else if (!inNew) assert(status == "removed" && nl == -1L && ol >= 0)
      else if (revised) assert(status == "changed" || status == "unchanged",
        s"doc $id: upper() may be identity on already-uppercase text")
      else assert(status == "unchanged" && ol == nl)
    }
    // all four dispositions occur at this scale — the diff is non-vacuous
    val statuses = rows.values.map(_._1).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"))
  }
}
