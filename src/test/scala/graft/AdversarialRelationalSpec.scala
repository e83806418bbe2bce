package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pathological-input sweep over the RELATIONAL surface — the TPC-H-
  * shaped tables the generator keeps pristine: real warehouses carry
  * NULLs in measure columns, zero and negative amounts, 100% discount
  * rows, epoch/far-future dates, dangling foreign keys, empty strings,
  * malformed JSON props, and NaN metrics. Every registered query must
  * execute without throwing and produce the SAME result twice.
  * Complements AdversarialTextSpec (corpus surface) and EmptyInputSpec
  * (zero rows): this is the present-but-degenerate case, where ANSI
  * division/overflow and NULL-propagation bugs live.
  */
class AdversarialRelationalSpec extends AnyFunSuite {
  import TestSpark._
  import RowCanon.canon

  private val S = StringType
  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private lazy val advDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_advrel").toString

    def write(name: String, schema: StructType, rows: Seq[Row]): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")

    write("region",
      StructType(Seq(StructField("r_regionkey", IntegerType), StructField("r_name", S))),
      Seq(Row(0, "AMERICA"), Row(1, ""), Row(2, null), Row(3, "ASIA")))

    write("nation", StructType(Seq(StructField("n_nationkey", IntegerType),
      StructField("n_name", S), StructField("n_regionkey", IntegerType))),
      Seq(Row(0, "BRAZIL", 0), Row(1, "", 1), Row(2, null, 3),
        Row(3, "NOWHERE", 99) /* dangling region */))

    write("customer", StructType(Seq(StructField("c_custkey", LongType),
      StructField("c_name", S), StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType), StructField("c_mktsegment", S))),
      Seq(Row(1L, "Customer#1", 0, 100.25, "BUILDING"),
        Row(2L, "", 1, -999.99, "AUTOMOBILE"),      // negative balance
        Row(3L, null, 2, null, ""),                  // null name + balance
        Row(4L, "Customer#4", 99, 0.0, "BUILDING"),  // dangling nation, zero bal
        Row(5L, "Customer#5", 0, 0.01, "MACHINERY")))

    write("supplier", StructType(Seq(StructField("s_suppkey", LongType),
      StructField("s_name", S), StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
      Seq(Row(1L, "Supplier#1", 0, 50.0), Row(2L, "", 1, null),
        Row(3L, "Supplier#3", 3, -1.0), Row(4L, "Supplier#4", 99, 0.0)))

    write("part", StructType(Seq(StructField("p_partkey", LongType),
      StructField("p_name", S), StructField("p_brand", S), StructField("p_type", S),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
      Seq(Row(1L, "green part", "Brand#1", "PROMO BRUSHED", 1, 900.0),
        Row(2L, "", "", "", 0, 0.0),                 // zero price + size
        Row(3L, null, "Brand#3", "STANDARD", -5, null), // negative size, null price
        Row(4L, "part four", "Brand#1", "PROMO ANODIZED", 50, 1500.5)))

    write("orders", StructType(Seq(StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType), StructField("o_orderstatus", S),
      StructField("o_totalprice", DoubleType), StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", S))),
      Seq(Row(1L, 1L, "O", 1000.0, ts("1995-03-15 00:00:00"), "1-URGENT"),
        Row(2L, 2L, "F", 0.0, ts("1970-01-01 00:00:00"), ""),      // zero price, epoch
        Row(3L, 3L, "", null, ts("2099-12-31 23:59:59"), null),    // null price, far future
        Row(4L, 99L, "P", -50.0, ts("1996-01-02 00:00:00"), "5-LOW"), // dangling cust, negative
        Row(5L, 5L, "O", 250000.75, ts("1995-06-17 00:00:00"), "2-HIGH")))

    write("lineitem", StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType), StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType), StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType), StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType), StructField("l_returnflag", S),
      StructField("l_linestatus", S), StructField("l_shipdate", TimestampType))),
      Seq(
        Row(1L, 1L, 1L, 1, 17.0, 17000.0, 0.05, 0.02, "N", "O", ts("1995-03-20 00:00:00")),
        Row(1L, 4L, 3L, 2, 0.0, 0.0, 0.0, 0.0, "R", "F", ts("1970-01-01 00:00:00")), // all-zero line
        Row(2L, 2L, 2L, 1, 1.0, 10.0, 1.0, 0.08, "A", "F", ts("1994-01-01 00:00:00")), // 100% discount
        Row(3L, 3L, 4L, 1, null, null, null, null, "", "", ts("2099-12-31 00:00:00")), // null measures
        Row(4L, 1L, 1L, 1, -3.0, -300.0, 0.02, 0.0, "R", "F", ts("1996-02-10 00:00:00")), // returns-shaped negatives
        Row(5L, 4L, 3L, 1, 30.0, 45000.0, 0.1, 0.06, "N", "O", ts("1995-06-20 00:00:00")),
        Row(5L, 2L, 2L, 2, 5.0, 50.0, 0.0, 0.04, "N", "O", ts("1995-06-21 00:00:00"))))

    write("events", StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", S), StructField("value", DoubleType),
      StructField("props", S))),
      Seq(
        Row(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5, """{"page":"home"}"""),
        Row(2L, ts("1970-01-01 00:00:00"), -1L, "", 0.0, ""),          // epoch, negative user, empty
        Row(3L, ts("2024-01-01 10:00:01"), 1L, "view", Double.NaN, "not json"), // NaN + bad JSON
        Row(4L, ts("2024-01-01 10:00:01"), 1L, "view", -5.0, null),    // duplicate ts, null props
        Row(5L, ts("2024-01-01 11:30:00"), 2L, "purchase", 99.99, """{"page":null}"""),
        Row(6L, ts("2024-01-01 12:00:00"), 2L, "click", 1.0, """{"deep":{"a":[1,2]}}""")))

    // corpus tables with the headline pathologies from
    // AdversarialTextSpec folded in, so the SQL-parity sweep below
    // exercises the guarded texts on degenerate corpus data too
    val docTexts = Seq(
      "doc zero common tokens here plus tok0",
      "",                                  // empty
      "   ",                               // whitespace-only
      "emoji 🎉 and 中文文本 mixed",          // unicode
      ("spark " * 400).trim,               // heavy repetition
      "doc five common tokens here plus tok5")
    write("documents", StructType(Seq(StructField("doc_id", LongType),
      StructField("text", S), StructField("lang", S), StructField("source", S),
      StructField("n_chars", LongType))),
      // Includes a fully-null document row (null text/lang/source/
      // n_chars — the standard crawl shape): the six formerly-drifting
      // SQL ports (etl_category_header, etl_merge_fragments,
      // etl_table_assemble, pack_sequences, pipe_dedup_e2e,
      // text_boilerplate) were adjudicated against reference semantics
      // (_clean_cell None->'', extractor_v03.py:288) and now agree
      // with the API on null text, so the parity sweep covers it.
      docTexts.zipWithIndex.map { case (t, i) =>
        Row(i.toLong, t, Seq("en", "zh", "es")(i % 3), s"src${i % 2}", t.length.toLong) }
        :+ Row(9L, null, null, null, null))
    write("embeddings", StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType))),
      (0L until 6L).map { i =>
        val v: Seq[Float] = i match {
          case 1 => Seq.fill(64)(0.0f)                                    // zero vector
          case 2 => Seq.tabulate(64)(j => if (j == 0) 1e30f else 1.0f)    // huge component
          case _ => Seq.tabulate(64)(j => math.sin(i * 31 + j * 7).toFloat)
        }
        Row(i, v, i.toInt % 2) })
    dir
  }

  test("relational queries survive degenerate rows and stay deterministic") {
    var ran = 0
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val planned =
        try Some(fn(spark, advDir))
        catch { case _: Throwable => None }
      planned.flatMap { df =>
        try {
          ran += 1
          val a = canon(df.collect())
          val b = canon(fn(spark, advDir).collect())
          if (a == b) None else Some(s"$name: nondeterministic on adversarial tables")
        } catch { case e: Throwable =>
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
        }
      }
    }
    assert(ran >= 150, s"only $ran queries ran — the adversarial dir is missing tables")
    assert(failures.isEmpty,
      s"${failures.size} queries fail on degenerate relational data:\n" + failures.mkString("\n"))
  }

  test("SQL-only surface matches the Scala API on degenerate rows") {
    // Not just crash-free: the SQL texts (portable oracles + SqlPort
    // ports) must produce the SAME rows as the Scala-API plans on the
    // degenerate tables — proving the zero-guards and clamps were
    // mirrored with identical semantics, not merely "both survive".
    SqlFrontend.register(spark, advDir)
    val sortedCols = (df: org.apache.spark.sql.DataFrame) =>
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
    val failures = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      SqlFrontend.sqlFor(name).toSeq.flatMap { sql =>
        try {
          val api = canon(sortedCols(SparkEntry.queries(name)(spark, advDir)).collect())
          val viaSql = canon(sortedCols(spark.sql(sql)).collect())
          if (api == viaSql) None
          else {
            val firstDiff = api.zipAll(viaSql, "<missing>", "<missing>")
              .find { case (a, b) => a != b }
            Some(s"$name: ${api.size} vs ${viaSql.size} rows; first diff: $firstDiff")
          }
        } catch { case e: Throwable =>
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(140)}")
        }
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} SQL texts diverge from the API on degenerate data:\n" +
        failures.mkString("\n"))
  }
}
