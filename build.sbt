ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simplemergespark"
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
// One suite at a time: the suites share one SparkSession, and parallel
// suites mean parallel heap growth — on hosts where concurrent
// first-touch faulting contends superlinearly (see javaOptions note)
// that turns a 3-minute suite into an hour. Serial is modestly slower
// on healthy hosts and strictly safer everywhere.
Test / parallelExecution := false
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
  // Deliberately no -Xms/-XX:+AlwaysPreTouch: this host demand-faults
  // guest memory through a slow, monotonically-degrading path (measured
  // 2026-08-13: first-touch cost grew 1us -> 550us/page over a few
  // hours; pre-touching an 8 GiB heap then takes minutes of sys time).
  // Touch pages only as the workload actually needs them.
)
