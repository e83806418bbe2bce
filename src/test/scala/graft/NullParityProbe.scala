package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Scratch probe (not a test): reproduce the six-key SQL/API null-text
  * parity drift by running every SQL-surfaced key on a corpus that
  * contains a fully-null document row, printing the per-key diff.
  */
object NullParityProbe {
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq.map {
      case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
      case s: Seq[_] => s.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val S = StringType
    val dir = java.nio.file.Files.createTempDirectory("graft_nullparity").toString
    def write(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")

    // copy the sf0.001 tables except documents
    val src = TestSpark.sf
    SqlFrontend.tableNames.filterNot(_ == "documents").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val docTexts = Seq(
      "doc zero common tokens here plus tok0",
      "",
      "   ",
      ("spark " * 400).trim,
      "doc five common tokens here plus tok5")
    val base = docTexts.zipWithIndex.map { case (t, i) =>
      Row(i.toLong, t, Seq("en", "zh", "es")(i % 3), s"src${i % 2}", t.length.toLong) }
    write("documents", StructType(Seq(StructField("doc_id", LongType),
      StructField("text", S), StructField("lang", S), StructField("source", S),
      StructField("n_chars", LongType))),
      base :+ Row(9L, null, null, null, null))

    SqlFrontend.register(spark, dir)
    val pick: String => Boolean =
      if (args.nonEmpty) args.toSet else (_: String) => true
    SparkEntry.oracleSql.keys.toSeq.sorted.filter(pick).foreach { name =>
      SqlFrontend.sqlFor(name).foreach { sql =>
        try {
          val api = canon(SparkEntry.queries(name)(spark, dir))
          val viaSql = canon(spark.sql(sql))
          if (api != viaSql) {
            println(s"DRIFT $name api=${api.size} sql=${viaSql.size} rows")
            val diffs = api.zipAll(viaSql, "<missing>", "<missing>")
              .filter { case (a, b) => a != b }.take(4)
            diffs.foreach { case (a, b) =>
              println(s"  api: ${a.take(200)}")
              println(s"  sql: ${b.take(200)}")
            }
          }
        } catch { case e: Throwable =>
          println(s"ERROR $name ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(180)}")
        }
      }
    }
    println("probe done")
    spark.stop()
  }
}
