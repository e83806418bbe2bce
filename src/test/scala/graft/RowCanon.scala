package graft

import org.apache.spark.sql.Row

/** Canonical string form of a result set for cross-run comparison:
  * rows sorted, doubles snapped to 9 significant digits (re-ordering a
  * distributed sum legitimately moves the last ulp; gated queries
  * already snap/DECIMAL their visible aggregates), -0.0 = 0.0,
  * binary as hex, arrays/structs/maps recursed.
  */
object RowCanon {
  def norm(v: Any): String = v match {
    case null => "␀"
    case d: Double => f"${if (d == 0.0) 0.0 else d}%.9e"
    case f: Float => norm(f.toDouble)
    case d: java.math.BigDecimal => // scale-normalize: 1.50 ≡ 1.5
      if (d.signum == 0) "0" else d.stripTrailingZeros.toPlainString
    case d: BigDecimal => norm(d.underlying)
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case r: Row => r.toSeq.map(norm).mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(norm).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => norm(k) + "->" + norm(x) }.sorted.mkString("<", ",", ">")
    case x => String.valueOf(x)
  }

  def canon(rows: Array[Row]): Seq[String] =
    rows.map(r => r.toSeq.map(norm).mkString("|")).toSeq.sorted
}
