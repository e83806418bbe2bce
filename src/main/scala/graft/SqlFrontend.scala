package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Registry

/** SQL-only entry point: registers every test-schema table as a temp
  * view plus the custom functions, so a `spark.sql(...)` user gets the
  * engine's full surface without touching the Scala API.
  */
object SqlFrontend {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir) else Tables.load(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
    Registry.registerAll(spark)
  }

  /** Spark-dialect SQL text for a gated key: the oracle text itself
    * when it is dialect-portable, else the hand-written SqlPort port.
    * Every oracle-gated key resolves (SqlFrontendSpec asserts the
    * closure), so `spark.sql(SqlFrontend.sqlFor(k).get)` after
    * [[register]] reproduces the gated semantics from SQL text alone.
    */
  def sqlFor(key: String): Option[String] =
    SqlPort.sparkSql.get(key).orElse(
      if (SqlPort.portableOracle(key)) SparkEntry.oracleSql.get(key) else None)
}
