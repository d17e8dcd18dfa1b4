ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlbatchspark"
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
// local-cluster[...] (graft.ClusterCheck): the in-process Worker builds
// each executor's launch command via the Spark launcher, whose scala-
// version probe needs this hint when SPARK_HOME is a packaged layout
// without launcher/target build dirs.
run / envVars += "SPARK_SCALA_VERSION" -> "2.13"
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"
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

// Stale-report hygiene: sbt writes one JUnit XML per suite into
// target/test-reports and never removes files for suites that were
// renamed or deleted — a rename leaves the old suite's last green XML
// behind forever, which reads as a passing suite to any harness that
// trusts the directory (it bit round 11: SkewSpec.xml survived the
// rename to SkewJoinSpec). Wipe the directory before `sbt test` so the
// reports always reflect exactly the suites that just ran.
lazy val cleanStaleTestReports = taskKey[Unit](
  "Delete target/test-reports before a test run")
cleanStaleTestReports := sbt.IO.delete(target.value / "test-reports")
Test / test := (Test / test).dependsOn(cleanStaleTestReports).value
