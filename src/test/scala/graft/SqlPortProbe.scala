package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scratch probe (not a test): for every oracle key NOT yet in
  * SqlFrontendSpec's replay list, try running the oracle SQL text on
  * Spark and compare to the Scala API result. Prints PORTABLE /
  * MISMATCH / ERROR per key so the replay list can be extended with
  * the keys that genuinely run unchanged.
  */
object SqlPortProbe {
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

  private val already = SqlPort.portableOracle

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = TestSpark.sf
    SqlFrontend.register(spark, sf)
    // "port" mode: probe the hand-written Spark-dialect texts in
    // SqlPort (optionally only the keys listed after "port") instead
    // of the raw oracle texts.
    if (args.headOption.contains("port")) {
      val pick = if (args.length > 1) args.drop(1).toSet else SqlPort.sparkSql.keySet
      SqlPort.sparkSql.keys.toSeq.sorted.filter(pick).foreach { key =>
        try {
          val (sc, sr) = canon(spark.sql(SqlPort.sparkSql(key)))
          val (ac, ar) = canon(SparkEntry.queries(key)(spark, sf))
          if (ac == sc && ar == sr) println(s"PORTABLE $key")
          else if (ac != sc) println(s"MISMATCH $key cols api=$ac sql=$sc")
          else {
            val i = ar.zip(sr).indexWhere { case (a, b) => a != b }
            val detail = if (ar.length != sr.length) s"rows ${ar.length}!=${sr.length}"
              else s"row$i api=${ar(i).take(120)} sql=${sr(i).take(120)}"
            println(s"MISMATCH $key $detail")
          }
        } catch {
          case e: Throwable =>
            println(s"ERROR $key ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(160)}")
        }
      }
      spark.stop(); return
    }
    val keys = SparkEntry.oracleSql.keys.toSeq.sorted.filterNot(already)
    keys.foreach { key =>
      try {
        val (sc, sr) = canon(spark.sql(SparkEntry.oracleSql(key)))
        val (ac, ar) = canon(SparkEntry.queries(key)(spark, sf))
        if (ac == sc && ar == sr) println(s"PORTABLE $key")
        else if (ac != sc) println(s"MISMATCH $key cols api=$ac sql=$sc")
        else {
          val i = ar.zip(sr).indexWhere { case (a, b) => a != b }
          val detail = if (ar.length != sr.length) s"rows ${ar.length}!=${sr.length}"
            else s"row$i api=${ar(i).take(120)} sql=${sr(i).take(120)}"
          println(s"MISMATCH $key $detail")
        }
      } catch {
        case e: Throwable =>
          println(s"ERROR $key ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(160)}")
      }
    }
    spark.stop()
  }
}
