ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nearindexerforexplorerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run output must reach stdout RAW: sbt's default LoggedOutput
// prefixes every program line with "[info] ", which breaks any driver
// that json-parses bench/verify output lines (a line starting with
// "[info] {" is not JSON). BENCH parsed:null in rounds 1-11 traces to
// exactly this prefix.
run / outputStrategy := Some(StdoutOutput)
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
// ---- Test sharding across forked JVMs (r20 verdict #1) ----
// The single-JVM suite outgrew the round driver's wall-clock window
// (~30-40 min; VERIFY_r20 tests_ok:false was a TRUNCATED run, not a
// failure). Shard the suites into forked JVMs that run CONCURRENTLY:
// each group gets its own SparkSession (the suites share one lazy
// session per JVM), its own stage/fixture roots (env-scoped so groups
// can never race on write-once stages or the oracle fixture mirrors),
// and the same JVM options as before. Suites WITHIN a group still run
// sequentially — only the groups overlap. Wall-clock ≈ the slowest
// group instead of the sum. SPARK_GRAFT_TEST_SHARDS=1 restores the
// old single-JVM run (everything lands in one group).
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val tests = (Test / definedTests).value
  val shardOf: String => String =
    if (sys.env.get("SPARK_GRAFT_TEST_SHARDS").contains("1")) _ => "all"
    else {
      // Measured-heavy suites get their own JVM; the rest pack into
      // two medium groups (durations from the r21 -oD timing run).
      case "graft.PipelineSpec"   => "pipeline"
      case "graft.NearStreamSpec" => "nearstream"
      case "graft.AnalyticsSpec"  => "analytics"
      case n if n.startsWith("graft.Near") => "near"
      case _ => "rest"
    }
  tests.groupBy(t => shardOf(t.name)).map { case (g, ts) =>
    Tests.Group(g, ts.sortBy(_.name), Tests.SubProcess(ForkOptions()
      .withRunJVMOptions(opts)
      .withEnvVars(Map(
        "GRAFT_STAGE_DIR" -> s"/tmp/graft_test_stage_$g",
        "GRAFT_FIXTURE_DIR" -> s"/tmp/graft_test_fixture_$g"))))
  }.toSeq
}
// sbt's default restriction runs ONE forked test group at a time;
// allow the shards to overlap (5 groups × local[4] Spark × 8g heap
// fits the 32-core / 128 GiB box comfortably).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16),
  Tags.limit(Tags.ForkedTestGroup, 5))
// Per-test durations in the output (balancing evidence for the shards).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
