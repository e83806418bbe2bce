package graft

import org.apache.spark.sql.SparkSession

/** Prints the AQE-final join/exchange skeleton of named queries at a
  * given corpus dir — the tool behind BASELINE.md's "which join
  * strategy did AQE pick at sf10" table. Mirrors graft.Bench's conf
  * (runtime-only broadcast decisions) so the probed plan is the plan
  * the benchmark actually ran.
  *
  * Usage: Test/runMain graft.PlanProbe <sfDir> <q1,q2,...>
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(SparkEntry.queries.contains)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      // collect() executes THIS queryExecution (count() would plan a
      // separate job and leave this one's adaptive plan unfinalized)
      val n = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"[rows=$n]")
      println(f"=== $name%s (${sec}%.2f s) ===")
      df.queryExecution.executedPlan.toString.split("\n")
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("isFinalPlan"))
        .foreach(l => println(l.replaceAll("#\\d+L?", "").take(160)))
    }
    spark.stop()
  }
}
