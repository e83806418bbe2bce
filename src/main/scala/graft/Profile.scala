package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage profiler: runs selected queries with the bench
  * session settings and prints one line per job (wall ms, #stages,
  * #tasks, shuffle bytes) and a per-stage breakdown — the measurement
  * companion to Bench (`sbt "runMain graft.Profile q7_volume"`).
  * Timing methodology mirrors Bench: one untimed warmup, then a timed
  * run whose jobs are listed.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ad-hoc config experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .foldLeft(b0) { case (b, Array(k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")

    case class StageRow(id: Int, name: String, ms: Long, tasks: Int,
      shufRead: Long, shufWrite: Long)
    val jobs = new scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]() // id, submit, end
    val stages = new scala.collection.mutable.ArrayBuffer[StageRow]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += ((j.jobId, j.time, -1L)) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          val i = jobs.lastIndexWhere(_._1 == j.jobId)
          if (i >= 0) jobs(i) = (j.jobId, jobs(i)._2, j.time)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'), ms,
            si.numTasks, si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // mirror Bench's per-query isolation: clear memoized index/cache
      // state BEFORE the warmup, so the timed run below serves from the
      // same warm memo state the bench's timed samples see
      graft.Caches.release(blocking = true)
      graft.operators.Similarity.clearTrainedState()
      graft.operators.TrainOps5.clearIndexState()
      System.gc()
      fn(spark, sfDir).count() // warmup
      jobs.clear(); stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else df.count()
      val t1 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $name: total ${(t1 - t0) / 1e6}%.0f ms (plan-construction ${(tPlan - t0) / 1e6}%.0f ms, action ${(t1 - tPlan) / 1e6}%.0f ms), ${jobs.size} jobs, ${stages.size} stages =====")
      jobs.foreach { case (id, s0, s1) =>
        println(f"  job $id%3d  ${if (s1 > 0) (s1 - s0).toString else "?"}%6s ms")
      }
      stages.sortBy(-_.ms).take(12).foreach { st =>
        println(f"  stage ${st.id}%4d ${st.ms}%6d ms ${st.tasks}%4d tasks  sr=${st.shufRead / 1024}%8d KB sw=${st.shufWrite / 1024}%8d KB  ${st.name.take(90)}")
      }
    }
    spark.stop()
  }
}
