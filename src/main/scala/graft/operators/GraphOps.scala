package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connectivity (dedup_cluster) and
  * reachability (q_hierarchy): damped mass propagation — PageRank
  * restricted to the catalog's parent forest — in drift-free integer
  * arithmetic.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  // --- graph_pagerank: damped mass propagation up the part forest -----
  // Every part points at parent = ⌊key/7⌋ (the q_hierarchy forest;
  // out-degree 1, roots dangle). Three fixed iterations of
  //   score'(v) = 150000 + Σ_{c: parent(c)=v} (score(c)·85) div 100
  // — PageRank's damping in ppm integers with floor division, so both
  // engines agree bit-for-bit (dangling mass is dropped, the standard
  // simplification). Per iteration: one aggregation by parent + one
  // left join back — fixed rounds, shuffles sized by the edge count,
  // no driver-side state at all. The same loop shape serves any
  // "weight docs by who references them" pass over a citation or
  // link forest at corpus scale.
  val graphPagerank: Q = (s, d) => {
    val nodes = Tables.part(s, d)
      .select(col("p_partkey").as("id"),
        floor(col("p_partkey") / 7).cast("long").as("parent"))
    var r = nodes.withColumn("score", lit(1000000L))
    for (_ <- 1 to 3) {
      val contrib = r.filter(col("parent") >= 1)
        .select(col("parent").as("t"), expr("(score * 85) div 100").as("c"))
        .groupBy(col("t")).agg(sum(col("c")).as("m"))
      r = nodes.join(contrib, nodes("id") === contrib("t"), "left")
        .select(nodes("id"), nodes("parent"),
          (lit(150000L) + coalesce(col("m"), lit(0L))).as("score"))
    }
    r.select(col("id"), col("score")).orderBy(col("id"))
  }

  val graphPagerankSql: String =
    """WITH n AS (SELECT p_partkey AS id, CAST(p_partkey // 7 AS BIGINT) AS parent
      |           FROM part),
      |r0 AS (SELECT id, parent, CAST(1000000 AS BIGINT) AS score FROM n),
      |a1 AS (SELECT parent AS t, CAST(SUM((score * 85) // 100) AS BIGINT) AS m
      |       FROM r0 WHERE parent >= 1 GROUP BY parent),
      |r1 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
      |       FROM n LEFT JOIN a1 ON n.id = a1.t),
      |a2 AS (SELECT parent AS t, CAST(SUM((score * 85) // 100) AS BIGINT) AS m
      |       FROM r1 WHERE parent >= 1 GROUP BY parent),
      |r2 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
      |       FROM n LEFT JOIN a2 ON n.id = a2.t),
      |a3 AS (SELECT parent AS t, CAST(SUM((score * 85) // 100) AS BIGINT) AS m
      |       FROM r2 WHERE parent >= 1 GROUP BY parent),
      |r3 AS (SELECT n.id, n.parent, CAST(150000 + COALESCE(m, 0) AS BIGINT) AS score
      |       FROM n LEFT JOIN a3 ON n.id = a3.t)
      |SELECT id, score FROM r3 ORDER BY id""".stripMargin

  val queries: Map[String, Q] = Map("graph_pagerank" -> graphPagerank)
  val oracles: Map[String, String] = Map("graph_pagerank" -> graphPagerankSql)
}
