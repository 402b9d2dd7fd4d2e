ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "elasticfreightspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Spark specs share one local session per JVM; suites that need their own
// (e.g. GraftExtensionsSpec) stop/recreate it — keep suites sequential.
Test / parallelExecution := false
run / fork := true
// Forked run output goes straight to stdout/stderr — no "[info] " logger
// prefix, so Bench's one-line JSON metric is machine-parseable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: the bench holds per-query checkpoint caches plus 32
  // concurrent tasks' shuffle state; 8g GC-thrashes at sf0.1
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Pre-size the heap to the max: a fresh JVM growing into its first
  // multi-GB working set pays tens of seconds of GC that read as
  // operator cost (measured on the 16M-edge PageRank stress cell:
  // 102 s first-run growing vs 43 s pre-sized, 12-26 s steady) — one
  // source of the end-of-session bench drift that has repeatedly
  // minted false regression flags.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
