package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third coverage batch: sliding event-time windows, banded range
  * join, null-handling battery, and the reference's entity-extraction
  * regexes (extractor_v03.py:427,441) as distributed operators.
  */
object Relational3 {
  type Q = (SparkSession, String) => DataFrame

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  // --- q_sliding_window: 1h windows sliding 30min --------------------
  // Spark's window() assigns each event to 2 overlapping windows; the
  // oracle reproduces the epoch-aligned starts by unnesting both.
  val qSlidingWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(d2(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  val qSlidingWindowSql: String =
    """SELECT wstart, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT unnest([
      |      make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
      |      make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)]) AS wstart,
      |    event_type, value
      |  FROM events) t
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- q_range_join: banded time-range self join ---------------------
  // Pairs of events of the same user within (0, 1min]. The Spark plan
  // is the scale-correct banded range join: bucket time into
  // slide-sized bins, explode the probe side into the two candidate
  // bins, equi-join on (user, bin), then apply the exact range filter
  // — shuffle keys stay equi, no CartesianProduct, no range explosion.
  val qRangeJoin: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("unix_micros(ts) div 60000000").as("bin"))
    val probe = e.select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("a_id"),
        explode(array(col("bin"), col("bin") + 1)).as("jbin"))
    probe.join(e,
        col("a_user") === col("user_id") && col("jbin") === col("bin") &&
          col("ts") > col("a_ts") &&
          col("ts") <= col("a_ts") + expr("INTERVAL 1 MINUTE"))
      .groupBy(col("a_user").as("user_id_out"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("user_id_out").as("user_id"), col("n_pairs"))
      .orderBy(col("user_id"))
  }

  val qRangeJoinSql: String =
    """SELECT a.user_id, COUNT(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
      |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin

  // --- q_null_handling: coalesce/nullif battery ----------------------
  val qNullHandling: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        coalesce(nullif(col("event_type"), lit("error")), lit("recovered")).as("type_or_recovered"),
        when(col("value") > 100, col("value")).otherwise(lit(null)).as("big_value"),
        coalesce(when(col("value") > 100, col("value")), lit(-1.0)).as("big_or_default"),
        isnull(nullif(col("event_type"), lit("click"))).as("is_click"))
      .orderBy(col("event_id"))

  val qNullHandlingSql: String =
    """SELECT event_id,
      |  coalesce(nullif(event_type, 'error'), 'recovered') AS type_or_recovered,
      |  CASE WHEN value > 100 THEN value ELSE NULL END AS big_value,
      |  coalesce(CASE WHEN value > 100 THEN value END, -1.0) AS big_or_default,
      |  nullif(event_type, 'click') IS NULL AS is_click
      |FROM events ORDER BY event_id""".stripMargin

  // --- etl_extract_mpn: the reference's entity extraction ------------
  // extractor_v03._extract_mpn tries LMR/TPS/LM prefixes in order;
  // _extract_manufacturer keyword-matches. Applied over synthetic page
  // text built from part rows so every branch is exercised.
  val etlExtractMpn: Q = (s, d) => {
    val page = concat(
      element_at(array(lit("datasheet LMR"), lit("spec TPS"), lit("ref LM"), lit("misc X")),
        (pmod(col("p_partkey"), lit(4)) + 1).cast("int")),
      col("p_partkey").cast("string"), lit("A "),
      element_at(array(lit("by Texas Instruments"), lit("by Analog Devices"),
        lit("by onsemi"), lit("no vendor")),
        (pmod(col("p_partkey"), lit(4)) + 1).cast("int")))
    val mpn = coalesce(
      nullif(regexp_extract(page, "LMR[0-9]+[A-Z]*", 0), lit("")),
      nullif(regexp_extract(page, "TPS[0-9]+[A-Z]*", 0), lit("")),
      nullif(regexp_extract(page, "LM[0-9]+[A-Z]*", 0), lit("")),
      lit("Unknown"))
    val mfr = when(lower(page).contains("texas instruments"), "Texas Instruments")
      .when(lower(page).contains("analog devices"), "Analog Devices")
      .when(lower(page).contains("onsemi"), "onsemi")
      .otherwise("Unknown")
    Tables.part(s, d)
      .select(col("p_partkey"), mpn.as("mpn"), mfr.as("manufacturer"))
      .orderBy(col("p_partkey"))
  }

  val etlExtractMpnSql: String =
    """WITH pages AS (
      |  SELECT p_partkey,
      |    (['datasheet LMR', 'spec TPS', 'ref LM', 'misc X'])[(p_partkey % 4) + 1]
      |      || CAST(p_partkey AS VARCHAR) || 'A '
      |      || (['by Texas Instruments', 'by Analog Devices', 'by onsemi', 'no vendor'])[(p_partkey % 4) + 1]
      |    AS page
      |  FROM part)
      |SELECT p_partkey,
      |  coalesce(
      |    nullif(regexp_extract(page, 'LMR[0-9]+[A-Z]*', 0), ''),
      |    nullif(regexp_extract(page, 'TPS[0-9]+[A-Z]*', 0), ''),
      |    nullif(regexp_extract(page, 'LM[0-9]+[A-Z]*', 0), ''),
      |    'Unknown') AS mpn,
      |  CASE WHEN lower(page) LIKE '%texas instruments%' THEN 'Texas Instruments'
      |       WHEN lower(page) LIKE '%analog devices%' THEN 'Analog Devices'
      |       WHEN lower(page) LIKE '%onsemi%' THEN 'onsemi'
      |       ELSE 'Unknown' END AS manufacturer
      |FROM pages ORDER BY p_partkey""".stripMargin

  // --- etl_mfr_infer: MPN-prefix manufacturer fallback ---------------
  // review_adapter.py:176-206 _infer_manufacturer: when text-level
  // manufacturer extraction comes back empty, the review adapter falls
  // back to a first-match-wins walk over a public prefix→manufacturer
  // map. Dict insertion order is semantic: MCP is tried before MC, so
  // MCP1234 is Microchip while MC1234 is onsemi; the CASE chain below
  // preserves exactly that order, and the oracle SQL is generated from
  // the SAME Seq so the two engines cannot drift.
  private val mpnPrefixes: Seq[(String, String)] = Seq(
    "LM" -> "Texas Instruments", "TPS" -> "Texas Instruments",
    "LMR" -> "Texas Instruments", "MAX" -> "Analog Devices",
    "AD" -> "Analog Devices", "LT" -> "Analog Devices",
    "LTC" -> "Analog Devices", "MCP" -> "Microchip",
    "PIC" -> "Microchip", "STM" -> "STMicroelectronics",
    "NCP" -> "onsemi", "MC" -> "onsemi", "ISL" -> "Renesas",
    "IR" -> "Infineon", "INA" -> "Texas Instruments",
    "OPA" -> "Texas Instruments")

  /** First-match-wins prefix inference (reference map order). */
  private[graft] def inferManufacturer(mpn: Column): Column =
    mpnPrefixes.foldRight(lit(""): Column) { case ((p, m), rest) =>
      when(upper(mpn).startsWith(p), m).otherwise(rest)
    }

  // planted MPNs cycle every map prefix plus two non-matching ones, so
  // each CASE arm (and the fall-through) is exercised at any SF
  private val plantPrefixes = mpnPrefixes.map(_._1) ++ Seq("XYZ", "Q")

  val etlMfrInfer: Q = (s, d) => {
    val pfx = element_at(array(plantPrefixes.map(lit): _*),
      (pmod(col("p_partkey"), lit(plantPrefixes.length)) + 1).cast("int"))
    val mpn = concat(pfx, col("p_partkey").cast("string"), lit("A"))
    val textMfr = when(pmod(col("p_partkey"), lit(3)) === 0, lit("Vendor Text Inc"))
      .otherwise(lit(""))
    Tables.part(s, d)
      .select(col("p_partkey"), mpn.as("mpn"),
        when(textMfr =!= "", textMfr).otherwise(inferManufacturer(mpn))
          .as("manufacturer"))
      .orderBy(col("p_partkey"))
  }

  val etlMfrInferSql: String = {
    val pfxArr = plantPrefixes.map(p => s"'$p'").mkString(", ")
    val caseChain = mpnPrefixes.map { case (p, m) =>
      s"WHEN upper(mpn) LIKE '$p%' THEN '$m'"
    }.mkString("\n       ")
    s"""WITH m AS (
      |  SELECT p_partkey,
      |    ([$pfxArr])[CAST(p_partkey % ${plantPrefixes.length} AS INT) + 1]
      |      || CAST(p_partkey AS VARCHAR) || 'A' AS mpn,
      |    CASE WHEN p_partkey % 3 = 0 THEN 'Vendor Text Inc' ELSE '' END AS text_mfr
      |  FROM part)
      |SELECT p_partkey, mpn,
      |  CASE WHEN text_mfr <> '' THEN text_mfr
      |       ELSE CASE $caseChain ELSE '' END END AS manufacturer
      |FROM m ORDER BY p_partkey""".stripMargin
  }

  // --- q_approx: sketch aggregates (HLL + quantile sketch) -----------
  // The constant-memory path for 100 TB cardinality/quantile questions
  // (exact counterparts: q_distinct, q_percentiles). Rows-only gate
  // (engine-specific sketches) + spec bounds. Two scale disciplines:
  //
  //   - the exact countDistinct runs in its OWN two-phase codegen'd
  //     pass and joins back on the flag: combined into one agg,
  //     Catalyst's distinct rewrite keys the partial aggregate on
  //     (flag, partkey), allocating a sketch buffer per distinct PART
  //     instead of per group — measured 5x the wall of the split at
  //     sf0.1, and buffer count would track corpus cardinality.
  //   - the quantile sketch is a DDSketch-style LOG-BUCKET histogram,
  //     not percentile_approx: bucketing is a per-row pure function,
  //     so the sketch is LAYOUT-INVARIANT (QuantileSummaries merges
  //     drift with partition boundaries — nondeterministic on a real
  //     cluster), the bucket count is bounded by the VALUE RANGE
  //     (~6.9k buckets per decade at γ=1.001, whatever the corpus
  //     size), relative error ≤ γ-1, and the whole pass stays in
  //     codegen'd HashAggregate (no ObjectHashAggregate).
  private val QA_GAMMA = 1.001

  val qApprox: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    // ONE distinct pass feeds both cardinality heads: HLL registers are
    // set-semantic (re-adding an element is a no-op), so
    // approx_count_distinct over the deduped (flag, partkey) frame is
    // bit-identical to running it over the raw stream — and the exact
    // count is just count(*) of that frame. This replaces two separate
    // lineitem scans+aggregations (plus their join) with one
    // (flag, partkey) exchange shared by both outputs (guide §2.4).
    // The countDistinct rewrite built this same (flag, partkey)
    // partial aggregate anyway; now the HLL rides it instead of
    // re-scanning.
    val dist = li.select(col("l_returnflag"), col("l_partkey")).distinct()
    val cards = dist.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
      count(lit(1)).as("exact_parts"))
    val b = li.select(col("l_returnflag"),
        floor(log(col("l_extendedprice").cast("double")) / math.log(QA_GAMMA))
          .cast("long").as("bkt"))
      .groupBy(col("l_returnflag"), col("bkt")).agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("bkt"))
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
    val med = b.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wTot))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag")).agg(min(col("bkt")).as("mbkt"))
      .select(col("l_returnflag"),
        pow(lit(QA_GAMMA), col("mbkt")).as("approx_med_price"))
    cards.join(med, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"),
        col("approx_med_price"))
      .orderBy(col("l_returnflag"))
  }

  // --- q_outer_join: full outer with null-side aggregation -----------
  val qOuterJoin: Q = (s, d) => {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        col("c_custkey").isNull.as("customer_missing"))
      .orderBy(col("custkey"))
  }

  val qOuterJoinSql: String =
    """SELECT coalesce(c_custkey, o_custkey) AS custkey,
      |  coalesce(n_big, 0) AS n_big,
      |  c_custkey IS NULL AS customer_missing
      |FROM customer
      |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_big FROM orders
      |                 WHERE o_totalprice > 400000 GROUP BY o_custkey) b
      |  ON c_custkey = o_custkey
      |ORDER BY custkey""".stripMargin

  // --- q_set_ops: INTERSECT / EXCEPT ---------------------------------
  val qSetOps: Q = (s, d) => {
    val buyers = Tables.orders(s, d).select(col("o_custkey").as("custkey")).distinct()
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    val both = buyers.intersect(rich).withColumn("set_op", lit("intersect"))
    val richNoOrders = rich.except(buyers).withColumn("set_op", lit("except"))
    both.unionByName(richNoOrders).orderBy(col("set_op"), col("custkey"))
  }

  val qSetOpsSql: String =
    """SELECT custkey, 'intersect' AS set_op FROM
      |  (SELECT DISTINCT o_custkey AS custkey FROM orders
      |   INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |UNION ALL
      |SELECT custkey, 'except' AS set_op FROM
      |  (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      |   EXCEPT SELECT DISTINCT o_custkey FROM orders)
      |ORDER BY set_op, custkey""".stripMargin

  // --- q_weighted_avg: custom typed Aggregator (udaf path) -----------
  // Discount-weighted average price per return flag through
  // graft.functions.WeightedAvg — exact decimal partials, double
  // division at finish, matching the plain-SQL oracle bit-for-bit.
  val qWeightedAvg: Q = (s, d) => {
    val wavg = udaf(graft.functions.WeightedAvg)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wavg(
        col("l_extendedprice").cast(DecimalType(18, 2)),
        col("l_quantity").cast(DecimalType(18, 2))).as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  // The CASE mirrors WeightedAvg.finish exactly: an all-null or
  // zero-weight group yields 0.0 (not NULL, not a 0-division) — SUM
  // already skips null products/weights on both engines
  val qWeightedAvgSql: String =
    """SELECT l_returnflag,
      |  CASE WHEN COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))), 0) = 0 THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))), 0) AS STRING) AS DOUBLE)
      |      / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |  END AS wavg_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --- q_explode: token frequencies via lateral explode ---------------
  val qExplode: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  val qExplodeSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_weighted_avg" -> qWeightedAvg,
    "q_explode" -> qExplode,
    "q_outer_join" -> qOuterJoin,
    "q_set_ops" -> qSetOps,
    "q_approx" -> qApprox,
    "q_sliding_window" -> qSlidingWindow,
    "q_range_join" -> qRangeJoin,
    "q_null_handling" -> qNullHandling,
    "etl_extract_mpn" -> etlExtractMpn,
    "etl_mfr_infer" -> etlMfrInfer)

  val oracles: Map[String, String] = Map(
    "q_weighted_avg" -> qWeightedAvgSql,
    "q_explode" -> qExplodeSql,
    "q_outer_join" -> qOuterJoinSql,
    "q_set_ops" -> qSetOpsSql,
    "q_sliding_window" -> qSlidingWindowSql,
    "q_range_join" -> qRangeJoinSql,
    "q_null_handling" -> qNullHandlingSql,
    "etl_extract_mpn" -> etlExtractMpnSql,
    "etl_mfr_infer" -> etlMfrInferSql)
}
