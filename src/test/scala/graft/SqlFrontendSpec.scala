package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-only surface: every key listed here is replayed as PURE SQL
  * TEXT — `SqlFrontend.register` builds the temp views + functions,
  * `spark.sql(SparkEntry.oracleSql(key))` runs the SAME ANSI oracle
  * text the DuckDB gate executes — and the result must row-for-row
  * match the Scala-API plan. This closes the "downstream consumers
  * speak SQL" story: a user who never touches the Scala API gets the
  * gated semantics from SQL text alone, and the oracle corpus doubles
  * as the engine's SQL conformance suite.
  */
class SqlFrontendSpec extends AnyFunSuite {
  import TestSpark._

  /** The keys whose oracle text is dialect-portable ANSI and replays
    * on Spark unchanged — the list lives in SqlPort.portableOracle so
    * SqlFrontend.sqlFor can serve it to SQL-only consumers; the
    * remaining gated keys are replayed through their SqlPort
    * Spark-dialect ports below.
    */
  private val replayKeys = SqlPort.portableOracle.toSeq.sorted

  /** Column-name-sorted, row-sorted, type-normalized frame image — the
    * same canonicalization idea as the driver's gate (sort columns by
    * name, rows by all values), with DECIMAL scale normalized so
    * decimal(38,2) and decimal(25,2) images of the same value agree.
    */
  private def canon(df: DataFrame): (Seq[String], Seq[String]) = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
      case d: BigDecimal => d.underlying.stripTrailingZeros.toPlainString
      case s: Seq[_] => s.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq
    (cols, rows)
  }

  SqlFrontend.register(spark, sf)

  private def assertReplay(key: String, sqlText: String): Unit = {
    val (apiCols, apiRows) = canon(SparkEntry.queries(key)(spark, sf))
    val (sqlCols, sqlRows) = canon(spark.sql(sqlText))
    assert(apiCols == sqlCols, s"column sets differ: api=$apiCols sql=$sqlCols")
    assert(apiRows.length == sqlRows.length,
      s"row counts differ: api=${apiRows.length} sql=${sqlRows.length}")
    val mismatch = apiRows.zip(sqlRows).indexWhere { case (a, b) => a != b }
    if (mismatch >= 0) fail(
      s"first mismatch at sorted row $mismatch:\n  api=${apiRows(mismatch)}\n  sql=${sqlRows(mismatch)}")
  }

  replayKeys.foreach { key =>
    test(s"pure-SQL replay matches the Scala API: $key") {
      assertReplay(key, SqlFrontend.sqlFor(key).get)
    }
  }

  // Keys whose oracle text is DuckDB-specific get a hand-written
  // Spark-dialect equivalent in SqlPort — replayed under the same
  // row-for-row bar, so the SQL-only surface is conformance-tested
  // dialect text, not best-effort documentation. Resolution goes
  // through SqlFrontend.sqlFor, the same entry point a SQL-only
  // consumer uses.
  SqlPort.sparkSql.keys.toSeq.sorted.foreach { key =>
    test(s"Spark-dialect SQL port matches the Scala API: $key") {
      assertReplay(key, SqlFrontend.sqlFor(key).get)
    }
  }

  test("SQL surface accounting: EVERY oracle-gated key is replayable as SQL text") {
    // Full closure: every key with a DuckDB oracle must be coverable
    // SQL-only — either the oracle text runs on Spark unchanged
    // (replayKeys) or SqlPort carries a Spark-dialect port. The 14
    // declared rows-only keys (xxhash64/RNG kernels, stubbed external
    // kernels) have no oracle and are exercised by their exact twins.
    val sqlCovered = replayKeys.toSet ++ SqlPort.sparkSql.keySet
    val missing = SparkEntry.oracleSql.keys.toSeq.sorted.filterNot(sqlCovered)
    assert(missing.isEmpty,
      s"oracle-gated keys with no SQL-text path (oracle replay or SqlPort): $missing")
    val stale = SqlPort.sparkSql.keySet.filterNot(SparkEntry.oracleSql.keySet)
    assert(stale.isEmpty, s"SqlPort entries with no gated key: $stale")
    val overlap = SqlPort.sparkSql.keySet.intersect(replayKeys.toSet)
    assert(overlap.isEmpty,
      s"keys both replayed verbatim and ported (drop one): $overlap")
  }
}
