ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hivegatewayspark"
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
// Pass the forked JVM's stdout straight through instead of sbt's default
// LoggedOutput, which prefixes every line with "[info] " — that prefix
// kept the driver from parsing Bench's single JSON output line
// (BENCH_r01/r02 both captured the line but recorded parsed:null).
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
  // 32 executor threads in one JVM: 8g left queries GC-bound mid-run
  // (q_math_ops timed 7s in a full Bench pass vs 0.6s standalone); the
  // contract machine has 128 GiB, so give the forked driver headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A full-suite Bench pass JITs thousands of generated classes
  // (236 queries × whole-stage-codegen fragments × 3 reps); the JDK 17
  // default 240 MB reserved code cache silently flushes hot compiled
  // code once full (no warning unless exhausted), which degrades
  // CPU-bound queries late in the suite — the round-7 driver-vs-solo
  // 3–6× gap on the heavy dedup tail. 1 GiB keeps every hot method
  // compiled for the whole pass.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_XOPTS").map(_.split(" ").filter(_.nonEmpty).toSeq)
  .getOrElse(Seq.empty)
