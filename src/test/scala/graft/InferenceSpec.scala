package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Inference

class InferenceSpec extends AnyFunSuite {
  import TestSpark._

  private def requests(n: Int) = {
    val spark2 = spark
    import spark2.implicits._
    (1L to n.toLong).map(i => (i, s"prompt $i")).toDF("id", "prompt")
  }

  private val schema = StructType(Seq(
    StructField("mpn", StringType),
    StructField("voltage", DoubleType),
    StructField("pages", LongType)))

  test("transient failures are retried and eventually succeed") {
    val (replies, usage) = Inference.inferenceStage(requests(100))
    val rows = replies.collect()
    assert(rows.forall(_.getAs[Boolean]("success")), "all rows succeed within maxRetries")
    // kernel fails attempt 0 when id % 7 == 3 → those rows need >1 attempt
    val retried = rows.filter(r => r.getAs[Long]("id") % 7 == 3)
    assert(retried.nonEmpty && retried.forall(_.getAs[Int]("attempts") > 1))
    assert(usage.retries.value == retried.length)
    // calls are per (batch, attempt), NOT per row — far fewer calls
    // than rows even with every batch retrying once (batch boundaries
    // fall per partition, so the exact count depends on partitioning)
    assert(usage.calls.value >= math.ceil(100.0 / 16).toLong && usage.calls.value < 50,
      s"${usage.calls.value} batch calls for 100 rows")
  }

  test("exhausted retries surface as failures, not exceptions") {
    // maxRetries=1 → ids with id % 7 == 3 never get their retry
    val (replies, usage) = Inference.inferenceStage(
      requests(50), Inference.Config(maxRetries = 1))
    val failed = replies.filter(!col("success")).collect()
    assert(failed.nonEmpty && failed.forall(_.getAs[String]("error").contains("transient")))
    assert(usage.failures.value == failed.length)
  }

  test("malformed and fenced JSON are validated correctly") {
    val (replies, _) = Inference.inferenceStage(requests(93))
    val v = Inference.validated(replies, schema, Seq("mpn", "voltage")).collect()
    v.foreach { r =>
      val id = r.getAs[Long]("id")
      if (id % 31 == 0) assert(!r.getAs[Boolean]("valid"), s"id $id truncated json must be invalid")
      else if (id % 5 == 0) {
        assert(r.getAs[Boolean]("valid"), s"id $id fenced json must validate")
        assert(r.getAs[org.apache.spark.sql.Row]("parsed").getAs[String]("mpn") == s"MPN-$id")
      } else assert(r.getAs[Boolean]("valid"), s"id $id plain json must validate")
    }
  }

  test("per-partition budget share stops calls and reports exceeded") {
    val (replies, usage) = Inference.inferenceStage(
      requests(2000).repartition(2), Inference.Config(budgetUsd = 1e-4))
    val rows = replies.collect()
    val exceeded = rows.filter(_.getAs[String]("error").contains("budget exceeded"))
    assert(exceeded.nonEmpty, "tiny budget must trip")
    assert(exceeded.forall(_.getAs[Int]("attempts") == 0), "no model calls after budget trip")
    // budget is a pre-call check at batch granularity (as in the
    // reference): overshoot is at most one batch's cost per partition
    assert(usage.costUsd.value <= 1e-4 + 2 * 16 * 2.5e-5,
      s"spend ${usage.costUsd.value} beyond budget + one batch per partition")
  }

  test("accumulators reconcile with per-row accounting") {
    val (replies, usage) = Inference.inferenceStage(requests(200))
    val agg = replies.agg(
      sum("tokens_in").as("ti"), sum("tokens_out").as("to"), sum("cost_usd").as("c")).collect()(0)
    assert(usage.tokensIn.value == agg.getAs[Long]("ti"))
    assert(usage.tokensOut.value == agg.getAs[Long]("to"))
    assert(math.abs(usage.costUsd.value - agg.getAs[Double]("c")) < 1e-12)
  }

  test("infer_extract registered query returns validated rows") {
    val out = Inference.inferExtract(spark, sf)
    assert(out.count() > 0)
    val sample = out.filter(col("valid")).limit(5).collect()
    assert(sample.forall(_.getAs[String]("mpn").startsWith("MPN-")))
  }
}
