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

  /** The 57 keys whose oracle text is dialect-portable ANSI (runs
    * on both DuckDB and Spark unchanged): 43 of the 54 §2A relational
    * keys plus 14 ETL/scale/streaming keys. The §2A exclusions each use a
    * DuckDB-only construct — q_percentiles (quantile_cont),
    * q_json_extract (json_extract_string), q_string_funcs (bare
    * VARCHAR cast), q_array_agg (array_to_string/list ordering),
    * q_sliding_window + q_datetime_funcs (DuckDB date/epoch forms),
    * q_explode (unnest form), q_window_frames (frame/func variants),
    * q_hierarchy + graph_pagerank (DuckDB recursive-CTE/`//` forms),
    * q_asof_join (ASOF JOIN) — their semantics stay covered by the
    * DuckDB gate itself, which is the cross-engine check.
    */
  private val replayKeys = Seq(
    "q1_agg", "q3_shipping", "q5_local_supplier", "q6_filter_agg",
    "q_window_rank", "q_window_running", "q_distinct", "q_semi_join",
    "q_anti_join", "q_rollup", "q_pivot", "q_union_dedup", "q_topk_order",
    "q_date_bucket", "q_cross_small",
    "q7_volume", "q10_returns", "q14_promo", "q18_large", "q22_balance",
    "q_stats_agg", "q_cube",
    "q_range_join", "q_null_handling", "q_outer_join",
    "q_set_ops", "q_weighted_avg", "q_math_funcs",
    "q_conditional_agg", "q_grouping_sets",
    "q_correlated", "q_multi_distinct",
    "q4_priority", "q8_market_share", "q9_profit", "q13_order_dist",
    "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty",
    "q19_disjunctive", "q21_waiting", "event_funnel",
    "q_running_distinct",
    // §2B/D/E keys whose oracle text also runs on Spark unchanged
    // (found by SqlPortProbe; the ~95 remaining keys each use a
    // DuckDB-only construct — unnest/string_split/quantile_cont/
    // epoch_us/list ops — and stay covered by the DuckDB gate):
    "etl_batch_stats", "etl_confidence", "etl_double_verify",
    "etl_infer_category", "etl_merge_upsert", "etl_review_queue",
    "etl_scd2", "etl_schema_evolve",
    "q_bucket_join", "q_skew_join", "q_topk_group",
    "src_partitioned_scan", "stream_interval_join", "stream_upsert_sink")

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
      assertReplay(key, SparkEntry.oracleSql(key))
    }
  }

  // Keys whose oracle text is DuckDB-specific get a hand-written
  // Spark-dialect equivalent in SqlPort — replayed under the same
  // row-for-row bar, so the SQL-only surface is conformance-tested
  // dialect text, not best-effort documentation.
  SqlPort.sparkSql.keys.toSeq.sorted.foreach { key =>
    test(s"Spark-dialect SQL port matches the Scala API: $key") {
      assertReplay(key, SqlPort.sparkSql(key))
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
