ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetdemospark"
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
// Let the forked run JVM inherit stdout/stderr directly: the driver
// parses Bench's one-line JSON from stdout, and sbt's default
// LoggedOutput decorates every line with "[info] "/"[error] " which
// breaks line-oriented JSON parsing.
run / connectInput := true
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Keep Bench's one-line JSON the LAST stdout line: sbt's trailing
// "[success] Total time: ..." line otherwise follows it and breaks a
// parse-the-last-line driver (BENCH_r02 had parsed:null for exactly this).
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Per-suite JUnit XMLs (sbt's JUnitXmlReportPlugin) survive suite
// deletions — a deleted scratch spec's failing report made round 16's
// XML dir aggregate to 738/1 instead of the true 737/0. Wipe the dir
// before every test/testOnly run so it holds exactly the current run.
val cleanTestReports = taskKey[Unit]("delete stale target/test-reports")
cleanTestReports := sbt.IO.delete(target.value / "test-reports")
Test / test := (Test / test).dependsOn(cleanTestReports).value
Test / testOnly := (Test / testOnly).dependsOn(cleanTestReports).evaluated
