package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input sweep: every registered query must plan and execute
  * on ZERO-ROW tables without throwing (returning 0 rows — or a
  * well-defined aggregate row — is fine; an exception is a latent
  * production crash on an empty partition/snapshot, the bug class the
  * round-3 advice caught in text_repetition's sequence(0,-1)).
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    SqlFrontend.tableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sf) else Tables.load(spark, sf, t)
      df.limit(0).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query survives zero-row inputs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, emptyDir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries crash on empty input:\n" +
      failures.mkString("\n"))
  }

  test("every SQL-surface text survives zero-row inputs") {
    // The same degenerate sweep over the SQL-only surface: each
    // sqlFor text (verbatim oracle or SqlPort port) must plan and
    // execute over empty temp views — the sequence()/aggregate()/
    // element_at idioms the ports use are exactly where an empty
    // partition turns into a runtime error.
    SqlFrontend.register(spark, emptyDir)
    val failures = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      try { spark.sql(SqlFrontend.sqlFor(name).get).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} SQL texts crash on empty input:\n" +
      failures.mkString("\n"))
  }
}
