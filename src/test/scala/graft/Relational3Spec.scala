package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Registry
import graft.operators.Relational3

class Relational3Spec extends AnyFunSuite {
  import TestSpark._

  test("mpn prefix inference is first-match-wins in reference order") {
    val spark2 = spark
    import spark2.implicits._
    // MCP before MC and LT before LTC are order-sensitive cases; a
    // sorted or reversed walk would flip MCP→onsemi
    val got = Seq("MCP999A", "MC999A", "LMR77", "LTC5", "INA210", "XYZ1")
      .toDF("mpn")
      .select(col("mpn"), Relational3.inferManufacturer(col("mpn")).as("mfr"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("MCP999A") == "Microchip")
    assert(got("MC999A") == "onsemi")
    assert(got("LMR77") == "Texas Instruments")
    assert(got("LTC5") == "Analog Devices")
    assert(got("INA210") == "Texas Instruments")
    assert(got("XYZ1") == "")
  }

  test("q_approx sketches land within tolerance of exact") {
    import org.apache.spark.sql.functions.{col, expr}
    val exactMed = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Relational3.qApprox(spark, sf).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"HLL error too large: $approx vs $exact")
      // log-bucket median: the bucket lower bound sits within one
      // γ-step (0.1%) BELOW the true median's bucket, and the lower
      // median of an even count can sit below the interpolated exact
      // percentile — allow a 1% band
      val med = r.getAs[Double]("approx_med_price")
      val em = exactMed(r.getString(0))
      assert(math.abs(med - em) / em < 0.01,
        s"quantile sketch error too large: $med vs $em")
    }
  }

  test("q_approx fused distinct pass bit-matches the naive two-scan formulation") {
    // r15 optimization: ONE distinct (flag, partkey) exchange feeds
    // both cardinality heads. HLL registers are set-semantic, so the
    // sketch over the deduped frame must equal the sketch over the raw
    // stream EXACTLY (not within tolerance), and count(*) of the
    // distinct frame must equal countDistinct of the raw one.
    val li = Tables.lineitem(spark, sf)
    val naive = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Relational3.qApprox(spark, sf).collect().foreach { r =>
      val (a, e) = naive(r.getString(0))
      assert(r.getAs[Long]("approx_parts") == a,
        s"fused HLL diverged from raw-stream HLL for ${r.getString(0)}")
      assert(r.getAs[Long]("exact_parts") == e)
    }
  }

  test("custom functions are callable from SQL after registration") {
    Registry.registerAll(spark)
    val row = spark.sql(
      """SELECT simhash64(split('a b c', ' ')) AS s,
        |  hamming64(7L, 1L) AS h,
        |  dot_product(array(cast(1.0 as float), cast(2.0 as float)),
        |              array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |  size(minhash_signature(split('a b c', ' '), 16)) AS m
        |""".stripMargin).collect()(0)
    assert(row.getAs[Int]("h") == 2)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Int]("m") == 16)
  }

  test("SqlFrontend exposes tables + custom functions to pure SQL") {
    SqlFrontend.register(spark, sf)
    val row = spark.sql(
      """SELECT count(*) AS n,
        |  (SELECT simhash64(split(min(text), ' ')) FROM documents) AS fp
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin).collect()(0)
    assert(row.getAs[Long]("n") > 0)
  }

  test("range join bins never miss pairs at bin boundaries") {
    val spark2 = spark
    import spark2.implicits._
    // two events 59.9s apart straddling a 60s bin boundary
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:59"), 1L, 0.0),
      (1L, ts("2024-01-01 10:01:58"), 2L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("rj").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Relational3.qRangeJoin(spark, dir).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_pairs") == 1L,
      s"boundary pair missed: ${out.mkString}")
  }
}
