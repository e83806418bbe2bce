package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2A extension 2: window frame specifications and multi-distinct
  * aggregation — the remaining window/agg surface a SQL user expects.
  * Same parity discipline as Relational (decimal-exact money math,
  * exact-rational window statistics, total deterministic ordering).
  */
object Relational5 {
  type Q = (SparkSession, String) => DataFrame

  // --- q_window_frames: frame-spec battery ----------------------------
  // Every major frame shape in one query, per customer order history:
  // whole-partition frames (first/last/nth value), rank-family
  // statistics (ntile/percent_rank/cume_dist — exact small rationals,
  // bit-identical in both engines), offset functions with defaults
  // (lag/lead), and a RANGE frame over a day-number key (trailing
  // 30-day spend). Windows are partitioned by customer — fully
  // parallel, no global window anywhere.
  val qWindowFrames: Q = (s, d) => {
    val o = Tables.orders(s, d).filter(col("o_custkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"),
        datediff(col("o_orderdate"), lit("1990-01-01").cast("date")).cast("long").as("day_no"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val whole = byDate.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val trail30 = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-30, 0)
    o.select(col("o_custkey"), col("o_orderkey"), col("day_no"),
        first(col("price")).over(whole).cast("double").as("first_price"),
        last(col("price")).over(whole).cast("double").as("last_price"),
        nth_value(col("price"), 2).over(whole).cast("double").as("second_price"),
        ntile(4).over(byDate).cast("long").as("quartile"),
        percent_rank().over(byDate).as("pct_rank"),
        cume_dist().over(byDate).as("cume"),
        lag(col("price"), 1, 0).over(byDate).cast("double").as("prev_price"),
        lead(col("price"), 1, 0).over(byDate).cast("double").as("next_price"),
        sum(col("price")).over(trail30).cast("double").as("trail30_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // DuckDB default frame for ORDER BY windows is RANGE UNBOUNDED
  // PRECEDING..CURRENT ROW — spell ROWS frames explicitly where the
  // function is frame-sensitive (first/last/nth). lag/lead defaults
  // must be typed to the decimal column.
  val qWindowFramesSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate,
      |         CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS day_no,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_custkey % 10 = 0)
      |SELECT o_custkey, o_orderkey, day_no,
      |  CAST(first_value(price) OVER w_whole AS DOUBLE) AS first_price,
      |  CAST(last_value(price)  OVER w_whole AS DOUBLE) AS last_price,
      |  CAST(nth_value(price, 2) OVER w_whole AS DOUBLE) AS second_price,
      |  CAST(ntile(4) OVER w_ord AS BIGINT) AS quartile,
      |  percent_rank() OVER w_ord AS pct_rank,
      |  cume_dist() OVER w_ord AS cume,
      |  CAST(lag(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS DOUBLE) AS prev_price,
      |  CAST(lead(price, 1, CAST(0 AS DECIMAL(18,2))) OVER w_ord AS DOUBLE) AS next_price,
      |  CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY day_no
      |       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30_spend
      |FROM o
      |WINDOW
      |  w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  w_whole AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --- q_multi_distinct: several exact count-distincts in one agg -----
  // Multiple DISTINCT aggregates force Catalyst's Expand-based
  // rewrite (one row replicated per distinct group, then two-phase
  // aggregation) — the scalable plan for multi-distinct at any SF
  // (never a per-group set collection). Mixed with a plain sum to
  // exercise the non-distinct branch of the same Expand.
  val qMultiDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_lines"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))

  val qMultiDistinctSql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
      |  CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- q_hierarchy: recursive hierarchy resolution (BOM explosion) ---
  // The recursive-query surface: every part points at a synthetic
  // parent (p_partkey / 7 — a forest of 7-ary trees rooted at keys
  // 1..6), and the query resolves each node's ROOT and DEPTH. Spark
  // has no recursive CTE, so this is POINTER DOUBLING: each round
  // self-joins the state on ancestor = id, composing ancestor links
  // and summing depths — covered depth grows 2^rounds. The round
  // count comes from the DATA: max key K bounds the forest depth at
  // floor(log7 K)+1, so ceil(log2 depth) rounds provably resolve
  // everything (3 rounds at sf0.1; even a 4.7-trillion-part catalog
  // needs only 4). Roots self-loop with depth 0, making the fixpoint
  // stable — converged rows pass through unchanged. Each round is
  // lazily checkpointed: the single final action materializes the
  // rounds in sequence, each computed ONCE even though the next
  // round's self-join references it twice — the only driver-side
  // scalar is the max-key bound. The DuckDB oracle is an independent
  // top-down recursive CTE over the same parent links.
  val qHierarchy: Q = (s, d) => {
    val p = Tables.part(s, d)
      .select(col("p_partkey").as("id"),
        floor(col("p_partkey") / 7).cast("long").as("parent"))
    // max over an empty table is NULL — degenerate inputs resolve in
    // one round over zero rows
    val maxRow = p.agg(max(col("id"))).first()
    val maxPk = if (maxRow.isNullAt(0)) 1L else math.max(1L, maxRow.getLong(0))
    val maxDepth = math.floor(math.log(maxPk.toDouble) / math.log(7.0)).toInt + 1
    val rounds = math.max(1, math.ceil(math.log(maxDepth.toDouble) / math.log(2.0)).toInt)
    var st = p.select(col("id"),
        when(col("parent") < 1, col("id")).otherwise(col("parent")).as("anc"),
        when(col("parent") < 1, lit(0L)).otherwise(lit(1L)).as("depth"))
      .localCheckpoint(false)
    for (_ <- 0 until rounds) {
      st = st.as("a").join(st.as("b"), col("a.anc") === col("b.id"))
        .select(col("a.id").as("id"), col("b.anc").as("anc"),
          (col("a.depth") + col("b.depth")).as("depth"))
        .localCheckpoint(false)
    }
    st.select(col("id"), col("anc").as("root"), col("depth"))
      .orderBy(col("id"))
  }

  val qHierarchySql: String =
    """WITH RECURSIVE pr AS (
      |  SELECT p_partkey AS id, CAST(p_partkey // 7 AS BIGINT) AS parent
      |  FROM part),
      |cc(id, anc, depth) AS (
      |  SELECT id, id, 0 FROM pr WHERE parent < 1
      |  UNION ALL
      |  SELECT pr.id, cc.anc, cc.depth + 1
      |  FROM pr JOIN cc ON pr.parent = cc.id
      |  WHERE pr.parent >= 1)
      |SELECT id, anc AS root, CAST(depth AS BIGINT) AS depth
      |FROM cc ORDER BY id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_window_frames" -> qWindowFrames,
    "q_multi_distinct" -> qMultiDistinct,
    "q_hierarchy" -> qHierarchy)

  val oracles: Map[String, String] = Map(
    "q_window_frames" -> qWindowFramesSql,
    "q_multi_distinct" -> qMultiDistinctSql,
    "q_hierarchy" -> qHierarchySql)
}
