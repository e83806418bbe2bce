package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate function (the user-facing Aggregator path):
  * weighted average carried as (Σ v·w, Σ w) in BigDecimal so partial
  * aggregation merges exactly regardless of partitioning; the final
  * division happens in double on the exact sums — the same
  * engine-parity discipline as the decimal sums in Relational
  * (SURVEY.md §6). Use via `functions.udaf(WeightedAvg)`.
  */
object WeightedAvg extends Aggregator[(BigDecimal, BigDecimal), (BigDecimal, BigDecimal), Double] {
  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
  // SQL SUM semantics per side: a NULL decimal decodes to a null
  // BigDecimal here, and the oracle's SUM(v*w) skips rows where the
  // PRODUCT is null while SUM(w) skips only null weights — mirror
  // that exactly instead of NPE-ing on the first null row
  override def reduce(b: (BigDecimal, BigDecimal), a: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (if (a._1 != null && a._2 != null) b._1 + a._1 * a._2 else b._1,
      if (a._2 != null) b._2 + a._2 else b._2)
  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2 == BigDecimal(0)) 0.0 else r._1.toDouble / r._2.toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    ExpressionEncoder[(BigDecimal, BigDecimal)]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
