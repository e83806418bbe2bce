package graft

import org.apache.spark.sql.functions.rand
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-determinism sweep: every registered query must produce
  * the SAME result when its input tables are randomly permuted and
  * re-partitioned. On a 1000-executor cluster nothing controls file
  * order, split boundaries, or partition count — an operator whose
  * output depends on input layout (a limit without a total-order
  * tiebreak, a first()/head over an unordered frame, an id assigned
  * before a sort) is nondeterministic at scale even though it looks
  * stable on a single local file. The oracle gate can't catch this
  * class (it always reads the same file layout); this sweep does.
  *
  * Floating-point columns are snapped to 9 significant digits before
  * comparison: re-ordering a distributed sum legitimately moves the
  * last ulp, and the gated queries already snap/DECIMAL their visible
  * aggregates — the tolerance only shields genuinely layout-neutral
  * FP noise, not value changes.
  */
class PermutationInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val shuffledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_perm").toString
    SqlFrontend.tableNames.foreach { t =>
      // events: write through Tables.events (micros timestamps) — the
      // reread hits the TimestampType branch and yields identical
      // values; every other table round-trips its raw schema
      val df = if (t == "events") Tables.events(spark, sf) else Tables.load(spark, sf, t)
      df.orderBy(rand(7)).repartition(3)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  import RowCanon.canon

  test("every registered query is invariant under input permutation + repartitioning") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val base = canon(fn(spark, sf).collect())
        val perm = canon(fn(spark, shuffledDir).collect())
        if (base == perm) None
        else {
          val firstDiff = base.zipAll(perm, "<missing>", "<missing>")
            .find { case (a, b) => a != b }
          Some(s"$name: ${base.size} vs ${perm.size} rows; first diff: $firstDiff")
        }
      } catch { case e: Throwable =>
        Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries change output under permuted/repartitioned input:\n" +
        failures.mkString("\n"))
  }
}
