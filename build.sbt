ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "geoparquetpythonspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the tail of
// stdout for the bench's one-line JSON. sbt's default forked-output logger
// prefixes every forked stdout line with "[info] " and appends its own
// "[success] Total time ..." line — BENCH_r01..r18 all came back
// `parsed: null` behind that prefix. StdoutOutput passes the forked JVM's
// stdout through verbatim (column 0, no logger), and showSuccess=false
// drops the trailing [success] line, so the JSON Bench prints after
// spark.stop() is the last stdout line of the whole sbt invocation.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// The test suite gets its OWN fixture scratch: a `sbt test` running
// concurrently with a Verify at a different scale factor must not
// overwrite the fixtures that Verify's oracle SQL points at.
Test / envVars += ("GRAFT_SCRATCH" -> "/tmp/graft_fixtures_test")
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
