ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datasheetetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Per-test durations in the report (-oD): the suite must fit the
// driver's verification budget, so slow legs need to be visible.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
run / fork := true

// The serial suite is ~30 min wall (dominated by a handful of
// all-200-query sweep suites), which overruns the driver's
// verification budget. Same tests, same assertions — but suites are
// split into weight-balanced groups, each in its OWN forked JVM (own
// Spark session, own Derby metastore, own warehouse — saveAsTable in
// q_bucket_join would deadlock on a shared Derby), up to four groups
// in flight. Suites never share state across groups: index/tmp paths
// are pid- or suite-scoped, and pids differ per fork.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val baseOpts = (Test / javaOptions).value.toVector
  // measured seconds from a serial -oD run (2026-08-19); unknown
  // suites default to 2 — only the RELATIVE weights matter
  val weight = Map(
    "graft.AdversarialRelationalSpec" -> 400,
    "graft.SqlFrontendSpec" -> 313,
    "graft.PermutationInvarianceSpec" -> 230,
    "graft.AdversarialTextSpec" -> 210,
    "graft.EmptyInputSpec" -> 126,
    "graft.PqSpec" -> 115,
    "graft.TrainOps5Spec" -> 68,
    "graft.StreamingSpec" -> 66,
    "graft.IndexSpec" -> 54,
    "graft.ScaleToolsSpec" -> 38,
    "graft.DedupSpec" -> 17,
    "graft.RetrainSpec" -> 15,
    "graft.TrainOps4Spec" -> 13,
    "graft.TrainOps3Spec" -> 10,
    "graft.PlanAuditSpec" -> 7)
  val nGroups = 6
  val bins = Array.fill(nGroups)(
    scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
  val load = Array.fill(nGroups)(0L)
  // longest-processing-time first: deterministic, near-balanced
  tests.sortBy(t => (-weight.getOrElse(t.name, 2), t.name)).foreach { t =>
    val i = load.indexOf(load.min)
    bins(i) += t
    load(i) += weight.getOrElse(t.name, 2)
  }
  bins.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    val dir = s"${java.lang.System.getProperty("java.io.tmpdir")}/graft_testfork_$i"
    Tests.Group(s"group$i", ts.toVector, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(baseOpts ++ Vector(
        s"-Dderby.system.home=$dir/derby",
        s"-Dspark.sql.warehouse.dir=$dir/warehouse"))))
  }.toSeq
}
// 6 groups in flight: each fork is a local[4] session (~24 cores
// peak on the 32-core sandbox, ~48 GB heap ceiling in 128 GB); the
// wall clock is then bounded by the single heaviest suite
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 6))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
