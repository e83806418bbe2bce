package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOf, Relational2}

class Relational2Spec extends AnyFunSuite {
  import TestSpark._

  test("q14_promo share is a percentage") {
    val v = Relational2.q14Promo(spark, sf).collect()(0).getAs[Double]("promo_revenue_pct")
    assert(v > 0 && v < 100)
  }

  test("q18_large only returns orders above the quantity threshold") {
    Relational2.q18Large(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 250)
    }
  }

  test("q_cube contains grand total row matching table count") {
    val rows = Relational2.qCube(spark, sf).collect()
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n") == Tables.orders(spark, sf).count())
  }

  test("asof join picks the latest click at-or-before each purchase") {
    val spark2 = spark
    import spark2.implicits._
    val mkTs = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, mkTs("2024-01-01 10:00:00"), 100L, 9.99),
      (1L, mkTs("2024-01-01 12:00:00"), 101L, 5.00),
      (2L, mkTs("2024-01-01 09:00:00"), 102L, 1.00) // no click before
    ).toDF("user_id", "ts", "event_id", "value")
    val right = Seq(
      (1L, mkTs("2024-01-01 09:30:00"), 200L, 0.1),
      (1L, mkTs("2024-01-01 11:00:00"), 201L, 0.2),
      (2L, mkTs("2024-01-01 09:30:00"), 202L, 0.3) // after purchase
    ).toDF("user_id", "ts", "click_id", "click_value")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", "click_id",
        Seq("click_id", "click_value"))
      .orderBy(col("event_id")).collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("right_click_id") == 200L)
    assert(out(1).getAs[Long]("right_click_id") == 201L)
    assert(out(2).isNullAt(out(2).fieldIndex("right_click_id")))
  }

  test("asof join includes a right row at exactly the left timestamp") {
    val spark2 = spark
    import spark2.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val left = Seq((1L, t, 1L, 0.0)).toDF("user_id", "ts", "event_id", "value")
    val right = Seq((1L, t, 9L, 0.5)).toDF("user_id", "ts", "click_id", "click_value")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", "click_id",
      Seq("click_id", "click_value")).collect()
    assert(out(0).getAs[Long]("right_click_id") == 9L)
  }

  test("asof join breaks right-side timestamp ties by greatest tieBreak") {
    val spark2 = spark
    import spark2.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val right = Seq((1L, t, 7L, 0.1), (1L, t, 9L, 0.2), (1L, t, 8L, 0.3))
      .toDF("user_id", "ts", "click_id", "click_value")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", "click_id",
      Seq("click_id", "click_value")).collect()
    assert(out(0).getAs[Long]("right_click_id") == 9L)
    assert(out(0).getAs[Double]("right_click_value") == 0.2)
  }

  test("asof join carries a match atomically when a right value column is NULL") {
    val spark2 = spark
    import spark2.implicits._
    val mkTs = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, mkTs("2024-01-01 12:00:00"), 1L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    // latest right row has NULL click_value: the result must keep that
    // NULL, not backfill it from the older row 200
    val right = Seq(
      (1L, mkTs("2024-01-01 10:00:00"), 200L, Some(0.5)),
      (1L, mkTs("2024-01-01 11:00:00"), 201L, None: Option[Double])
    ).toDF("user_id", "ts", "click_id", "click_value")
    val out = AsOf.asofJoin(left, right, "user_id", "ts", "click_id",
      Seq("click_id", "click_value")).collect()
    assert(out(0).getAs[Long]("right_click_id") == 201L)
    assert(out(0).isNullAt(out(0).fieldIndex("right_click_value")))
  }
}
