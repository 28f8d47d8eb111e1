ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mvrsdspaspark"
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
// Forward the forked process's stdout verbatim (no "[info] " prefix) so
// Bench's one-line JSON output is machine-parseable from the sbt log.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's trailing "[success] Total time: …" line so the Bench JSON
// line is the LAST line of stdout (a last-line parser must see the JSON).
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
  // 24g default: the 149-query bench sweep holds ~40 cached relations at
  // sf0.1; under the old 8g ceiling the ~2.4 GiB storage pool evicted
  // mid-sweep and GC/rebuild pressure inflated unrelated queries' timed
  // reps by up to 22x (r9 verdict). The machine has 128 GiB; the heap is
  // lazily committed, so tests and small runs are unaffected.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
