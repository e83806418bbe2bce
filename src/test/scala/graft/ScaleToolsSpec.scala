package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.Sources

class ScaleToolsSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedJoin result equals plain join") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", 8).count()
    assert(salted == plain)
  }

  test("saltedJoin shuffles on (key, salt)") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    // disable broadcast so the hash-partitioned path shows
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(li, o, "l_orderkey", 8).queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt column missing from shuffle:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("topKeys finds the heaviest key") {
    val top = Skew.topKeys(Tables.lineitem(spark, sf), "l_suppkey", 1).collect()(0)
    val counts = Tables.lineitem(spark, sf).groupBy("l_suppkey").count()
      .collect().map(_.getAs[Long]("count"))
    assert(top.getAs[Long]("count") == counts.max)
  }

  test("q_bucket_join plans exactly one exchange (the post-join groupBy)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.operators.ScaleOps.qBucketJoin(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected 1 exchange (groupBy), found $exchanges:\n$plan")
      // the gate proves value equality vs the plain join; here just rows
      assert(q.count() == 5L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucket tables: regeneration rebuilds, stale tags reaped, warehouse bounded") {
    import graft.operators.ScaleOps
    val dir = java.nio.file.Files.createTempDirectory("bjreap").toString
    def copyCorpus(): Unit = Seq("orders", "lineitem").foreach { t =>
      val src = spark.read.parquet(s"$sf/$t.parquet")
      src.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    def whTags: Set[String] = {
      val wh = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      val pat = "^(?:orders|lineitem)_bj_([0-9a-f]{16})$".r
      Option(wh.listFiles()).getOrElse(Array.empty).toSet[java.io.File]
        .flatMap(f => pat.findFirstMatchIn(f.getName).map(_.group(1)))
    }
    copyCorpus()
    val (lt1, _) = ScaleOps.ensureBucketTables(spark, dir)
    val tag1 = lt1.split("_bj_")(1)
    assert(spark.catalog.tableExists(lt1))
    // memoized: same corpus, same tag
    assert(ScaleOps.ensureBucketTables(spark, dir)._1 == lt1)
    Thread.sleep(1100) // mtime resolution guard
    copyCorpus()       // regenerate in place -> new fingerprint
    val (lt2, ot2) = ScaleOps.ensureBucketTables(spark, dir)
    val tag2 = lt2.split("_bj_")(1)
    assert(tag2 != tag1, "regenerated corpus must get a fresh bucket tag")
    assert(spark.catalog.tableExists(lt2) && spark.catalog.tableExists(ot2))
    // the rebuild reaps the stale tag: catalog AND warehouse
    assert(!spark.catalog.tableExists(s"lineitem_bj_$tag1"))
    assert(!whTags.contains(tag1), "stale warehouse dirs must be deleted")
    // bounded: at most one live tag (= 2 tables) per corpus dir
    assert(whTags.contains(tag2))
  }

  test("bucketed tables join without an exchange") {
    // warehouse dir is a static conf; the default ./spark-warehouse is
    // used and the tables are dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Sources.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 4)
      Sources.writeBucketed(
        Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b", "o_orderkey", 4)
      val j = spark.table("lineitem_b").join(spark.table("orders_b"), Seq("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(j.count() == Tables.lineitem(spark, sf).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("src_zorder_layout: both single-dimension slices stay tile-local") {
    import graft.operators.ScaleOps
    val rows = ScaleOps.srcZorderLayout(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getAs[String]("predicate") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("tiles_touched"))).toMap
    val (allN, allT) = rows("all_rows")
    assert(allN > 0 && allT >= 8, s"tile granularity degenerate: $allT tiles")
    // the z-interleave must localize BOTH predicates: each slice
    // touches at most half the existing tiles (a lexicographic sort
    // localizes only its leading key)
    for (p <- Seq("custkey_100_200", "q1_1996")) {
      val (n, t) = rows(p)
      assert(n > 0, s"$p matched nothing — slice out of data range")
      assert(t * 2 <= allT, s"$p touches $t of $allT tiles — no locality")
    }
  }
}
