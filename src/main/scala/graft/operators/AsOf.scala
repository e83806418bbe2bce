package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-event) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the builder rules):
  * tag both sides, union, and carry the right side's columns forward
  * with a `last(_, ignoreNulls)` running window ordered by
  * (time, side-tag). One shuffle on the join key, no per-key loops, no
  * range explosion — at 100 TB this is a single sort-shuffle, the same
  * cost as a sort-merge join, and never materializes candidate pairs
  * the way a range-join rewrite would.
  */
object AsOf {
  type Q = (SparkSession, String) => DataFrame

  /** left asof-join right: for each left row, the latest right row
    * with `right.timeCol <= left.timeCol` and equal keys. Right value
    * columns come back `right_`-prefixed (null when no match yet).
    *
    * All carried right columns travel in ONE struct filled by a single
    * `last(_, ignoreNulls)` window, so the chosen match is atomic — a
    * right row with a NULL value column can never yield a result mixing
    * columns from different right rows.
    *
    * @param tieBreak RIGHT-side column; among right rows with equal
    *                 (key, time) the one with the greatest tieBreak
    *                 wins (deterministic "latest" choice).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      tieBreak: String, rightValueCols: Seq[String]): DataFrame = {
    val sideTag = "__asof_side"
    val carried = rightValueCols :+ timeCol
    val leftOwn = left.columns.filterNot(c => c == keyCol || c == timeCol)
    val rightTagged = right.select(
      (Seq(col(keyCol), col(timeCol), lit(0).as(sideTag),
        col(tieBreak).cast("long").as("__tb"),
        struct(carried.map(c => col(c).as(s"right_$c")): _*).as("__match")) ++
        leftOwn.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val matchType = rightTagged.schema("__match").dataType
    val leftTagged = left.select(
      (Seq(col(keyCol), col(timeCol), lit(1).as(sideTag),
        lit(null).cast("long").as("__tb"),
        lit(null).cast(matchType).as("__match")) ++
        leftOwn.map(col)): _*)
    // right rows sort before left rows at the same timestamp → a match
    // at exactly left.time is included (<= semantics, DuckDB ASOF);
    // among tied right rows the greatest __tb sorts last and wins the
    // running `last`.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(sideTag), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.unionByName(leftTagged)
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col(sideTag) === 1)
      .select((Seq(col(keyCol), col(timeCol)) ++ leftOwn.map(col) ++
        carried.map(c => col(s"__match.right_$c").as(s"right_$c"))): _*)
  }

  /** q_asof_join: each purchase event joined to the user's most recent
    * click at-or-before it.
    */
  val qAsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"), col("value").as("click_value"))
    asofJoin(purchases, clicks, "user_id", "ts", "click_id",
        Seq("click_id", "click_value"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("right_ts").as("click_ts"), col("right_click_id").as("click_id"),
        col("right_click_value").as("click_value"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  val qAsofJoinSql: String =
    """SELECT p.event_id, p.user_id, p.ts, p.value,
      |  c.ts AS click_ts, c.click_id, c.click_value
      |FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id, value AS click_value
      |                FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.user_id, p.ts, p.event_id""".stripMargin

  val queries: Map[String, Q] = Map("q_asof_join" -> qAsofJoin)
  val oracles: Map[String, String] = Map("q_asof_join" -> qAsofJoinSql)
}
