package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field-level double verification — the reference's core algorithm
  * (double_verifier.py) as a distributed operator over two extraction
  * tables in long form.
  *
  * Comparator chain per field (double_verifier.py:477 _values_match):
  * numeric-with-tolerance → unit-normalized → normalized text.
  * Conflict classification (:496), severity (:511 — critical param
  * list, then diff-magnitude tiers), SmartArbiter resolution (:220 —
  * unit conflicts: rule wins; everything else: vision wins),
  * confidence scoring (:601 — severity penalties halved when
  * resolved), and status decision (:360 — needs_review on
  * large-difference critical conflicts, conflict below the confidence
  * threshold, else verified).
  *
  * Everything is native Catalyst expressions over a single joined
  * scan — at 100 TB this is one equi-join shuffle on (key, field) and
  * one aggregation, no per-row driver logic.
  */
object FieldVerify {

  /** double_verifier.py:260 DEFAULT_CRITICAL_PARAMS. */
  val DefaultCriticalParams: Seq[String] = Seq(
    "vin", "vout", "iout", "iq", "efficiency",
    "vin_min", "vin_max", "vout_min", "vout_max",
    "iout_max", "power", "frequency")

  /** double_verifier.py:118 UNIT_ALIASES (alias → canonical), the
    * behavioral spec of unit normalization.
    */
  private val unitCanon: Map[String, String] = {
    val aliases = Map(
      "µA" -> Seq("uA", "μA", "microamp", "micro-amp", "ua"),
      "mA" -> Seq("milliamp", "milli-amp", "ma"),
      "A" -> Seq("amp", "amps", "ampere"),
      "µV" -> Seq("uV", "μV", "microvolt"),
      "mV" -> Seq("millivolt", "mv"),
      "V" -> Seq("volt", "volts", "Volt"),
      "kV" -> Seq("kilovolt", "kv"),
      "µW" -> Seq("uW", "μW", "microwatt"),
      "mW" -> Seq("milliwatt", "mw"),
      "W" -> Seq("watt", "watts"),
      "kW" -> Seq("kilowatt", "kw"),
      "µF" -> Seq("uF", "μF", "microfarad"),
      "nF" -> Seq("nanofarad", "nf"),
      "pF" -> Seq("picofarad", "pf"),
      "µH" -> Seq("uH", "μH", "microhenry"),
      "mH" -> Seq("millihenry", "mh"),
      "nH" -> Seq("nanohenry", "nh"),
      "Ω" -> Seq("ohm", "ohms", "R"),
      "kΩ" -> Seq("kohm", "k-ohm", "kR"),
      "MΩ" -> Seq("Mohm", "megohm", "MR"),
      "Hz" -> Seq("hertz", "hz"),
      "kHz" -> Seq("kilohertz", "khz"),
      "MHz" -> Seq("megahertz", "mhz", "Mhz"),
      "GHz" -> Seq("gigahertz", "ghz"),
      "°C" -> Seq("C", "degC", "deg C", "celsius"),
      "°F" -> Seq("F", "degF", "deg F", "fahrenheit"),
      "ns" -> Seq("nanosecond", "nanosec"),
      "µs" -> Seq("us", "μs", "microsecond", "microsec"),
      "ms" -> Seq("millisecond", "millisec"),
      "s" -> Seq("sec", "second", "seconds"))
    aliases.flatMap { case (canon, as) =>
      (canon.toLowerCase -> canon) +: as.map(_.toLowerCase -> canon)
    }
  }

  // --- Column-level comparators --------------------------------------

  /** NumericComparator._extract_number: strip non-numeric, parse. */
  def extractNumber(c: Column): Column =
    nullif(regexp_replace(trim(c), "[^0-9.eE+-]", ""), lit("")).cast("double")

  /** NumericComparator.compare: relative difference ≤ tolerance. */
  def numericMatch(a: Column, b: Column, tolerance: Double = 0.01): Column = {
    val n1 = extractNumber(a); val n2 = extractNumber(b)
    when(n1.isNull || n2.isNull, false)
      .when(n1 === 0.0 && n2 === 0.0, true)
      .otherwise(abs(n1 - n2) / greatest(abs(n1), abs(n2)) <= tolerance)
  }

  /** Relative difference of the numeric parts (null unless both parse). */
  def relDiffPct(a: Column, b: Column): Column = {
    val n1 = extractNumber(a); val n2 = extractNumber(b)
    when(n1.isNull || n2.isNull || greatest(abs(n1), abs(n2)) === 0.0, lit(null))
      .otherwise(abs(n1 - n2) / greatest(abs(n1), abs(n2)))
  }

  /** UnitComparator.normalize as a codegen'd when-chain. */
  def normalizeUnit(c: Column): Column = {
    val cleaned = trim(c)
    val lookup = lower(cleaned)
    unitCanon.foldLeft(when(lit(false), lit(""))) { case (acc, (alias, canon)) =>
      acc.when(lookup === alias, canon)
    }.otherwise(cleaned)
  }

  def unitMatch(a: Column, b: Column): Column =
    normalizeUnit(a) === normalizeUnit(b)

  /** TextComparator._normalize: lower, collapse ws, strip punctuation. */
  def normalizeText(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "\\s+", " "), "[.,;:!?]", "")

  def textMatch(a: Column, b: Column): Column =
    normalizeText(a) === normalizeText(b)

  /** _values_match: empty handling then the comparator chain. */
  def valuesMatch(a: Column, b: Column, tolerance: Double = 0.01): Column = {
    val v1 = coalesce(a, lit("")); val v2 = coalesce(b, lit(""))
    when(v1 === "" && v2 === "", true)
      .when(v1 === "" || v2 === "", false)
      .otherwise(numericMatch(v1, v2, tolerance) || unitMatch(v1, v2) || textMatch(v1, v2))
  }

  private def containsAny(c: Column, needles: Seq[String]): Column =
    needles.map(n => lower(c).contains(n)).reduce(_ || _)

  /** Per-field conflict detail for two long-form extraction tables
    * `(keys..., param, field, value)`. Output: one row per compared
    * field with match flag, conflict type, severity, resolution and
    * resolved value.
    */
  def fieldConflicts(vision: DataFrame, rule: DataFrame, keys: Seq[String],
      tolerance: Double = 0.01,
      criticalParams: Seq[String] = DefaultCriticalParams): DataFrame = {
    val joinCols = keys ++ Seq("param", "field")
    val v = vision.withColumnRenamed("value", "vision_value")
    val r = rule.withColumnRenamed("value", "rule_value")
    conflictsFromPaired(v.join(r, joinCols), keys, tolerance, criticalParams)
  }

  /** The comparator over an ALREADY-PAIRED frame
    * (keys, param, field, vision_value, rule_value) — callers whose
    * two sides derive row-for-row from the SAME source (e.g.
    * etl_field_verify compares a column against its own perturbation)
    * build the pair in one scan instead of paying a self-join on
    * (keys, param, field) (guide §2.4 shuffle removal). fieldConflicts
    * above is unchanged: join, then this.
    */
  private[graft] def conflictsFromPaired(paired: DataFrame, keys: Seq[String],
      tolerance: Double = 0.01,
      criticalParams: Seq[String] = DefaultCriticalParams): DataFrame = {
    val joinCols = keys ++ Seq("param", "field")
    // Materialize every expensive shared subexpression exactly once.
    // Inlining them (the old shape) duplicated the regexp parse ~10x
    // per row, blew whole-stage codegen past the 64 KB method limit and
    // dropped the whole comparator stage to interpreted execution.
    // CollapseProject keeps non-cheap aliases from being re-inlined.
    val staged = paired
      .withColumn("__vv", coalesce(col("vision_value"), lit("")))
      .withColumn("__rv", coalesce(col("rule_value"), lit("")))
      .withColumn("__vnum", extractNumber(col("__vv")))
      .withColumn("__rnum", extractNumber(col("__rv")))
      .withColumn("__unit_eq", normalizeUnit(col("__vv")) === normalizeUnit(col("__rv")))
      .withColumn("__text_eq", normalizeText(col("__vv")) === normalizeText(col("__rv")))
      .withColumn("__fieldl", lower(col("field")))
      .withColumn("__paraml", lower(coalesce(col("param"), lit(""))))
    val vn = col("__vnum"); val rn = col("__rnum")
    val numEq = when(vn.isNull || rn.isNull, false)
      .when(vn === 0.0 && rn === 0.0, true)
      .otherwise(abs(vn - rn) / greatest(abs(vn), abs(rn)) <= tolerance)
    val diff = when(vn.isNull || rn.isNull || greatest(abs(vn), abs(rn)) === 0.0, lit(null))
      .otherwise(abs(vn - rn) / greatest(abs(vn), abs(rn)))
    val matchedExpr = when(col("__vv") === "" && col("__rv") === "", true)
      .when(col("__vv") === "" || col("__rv") === "", false)
      .otherwise(numEq || col("__unit_eq") || col("__text_eq"))
    def lContainsAny(c: Column, needles: Seq[String]): Column =
      needles.map(n => c.contains(n.toLowerCase)).reduce(_ || _)
    val conflictType = when(lContainsAny(col("__fieldl"), Seq("unit")), "unit")
      .when(vn.isNotNull, "numeric")
      .otherwise("text")
    val severity = when(
        lContainsAny(col("__fieldl"), criticalParams) ||
          lContainsAny(col("__paraml"), criticalParams), "critical")
      .when(diff.isNotNull && diff > 0.1, "high")
      .when(diff.isNotNull && diff > 0.05, "medium")
      .otherwise("low")
    val resolution = when(conflictType === "unit", "rule_wins").otherwise("vision_wins")
    val matched = col("__match")
    staged
      .withColumn("__match", matchedExpr)
      .select(joinCols.map(col) ++ Seq(col("vision_value"), col("rule_value"),
        matched.as("is_match"),
        when(!matched, conflictType).as("conflict_type"),
        when(!matched, severity).as("severity"),
        when(!matched, resolution).as("resolution"),
        when(!matched, when(resolution === "rule_wins", col("rule_value"))
          .otherwise(col("vision_value")))
          .otherwise(col("vision_value")).as("resolved_value"),
        diff.as("rel_diff")): _*)
  }

  /** Per-key verification summary: confidence + status, per
    * double_verifier.py:601 and :360.
    */
  def verifySummary(conflicts: DataFrame, keys: Seq[String],
      confidenceThreshold: Double = 0.60): DataFrame = {
    val penalty = when(col("is_match"), lit(BigDecimal("0.000")))
      .otherwise(
        // all conflicts are arbiter-resolved → penalty halved (:624)
        when(col("severity") === "critical", lit(BigDecimal("0.100")))
          .when(col("severity") === "high", lit(BigDecimal("0.050")))
          .when(col("severity") === "medium", lit(BigDecimal("0.025")))
          .otherwise(lit(BigDecimal("0.010"))))
      .cast(DecimalType(6, 3))
    val largeCritical = max(when(!col("is_match") && col("severity") === "critical" &&
      col("rel_diff") > 0.1, 1).otherwise(0))
    conflicts
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_fields"),
        sum(when(!col("is_match"), 1L).otherwise(0L)).as("n_conflicts"),
        greatest(lit(0.0), least(lit(1.0),
          (lit(1).cast(DecimalType(3, 2)) - sum(penalty)).cast("double"))).as("confidence"),
        largeCritical.as("has_large_critical"))
      .withColumn("status",
        when(col("has_large_critical") === 1, "needs_review")
          .when(col("confidence") < confidenceThreshold, "conflict")
          .otherwise("verified"))
      .drop("has_large_critical")
  }
}
