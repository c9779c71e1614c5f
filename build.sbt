ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "planningcenterdatapipelinespark"
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
// No "[success] Total time ..." trailer: the external bench harness
// JSON-parses the LAST line of captured stdout, which must be the one
// JSON line Bench prints (rounds 1-3 all failed to parse on this).
Global / showSuccess := false
// Forked run output goes straight to stdout/stderr — sbt's default
// LoggedOutput would prefix every line with "[info] ", corrupting the
// bench JSON line the harness parses.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
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
// Xms=Xmx (r10 finding, measured with tools/RepDiag): G1 uncommits heap
// pages after Full GC / concurrent-cycle cleanup, and the next query's
// Tungsten allocations re-fault them under 32-thread contention —
// ~150 µs/fault kernel storms that turned 3.5 s bench reps into 25 s
// ones with IDENTICAL user CPU (the source of every historical
// "in-sweep aging" anomaly: q_global_rownum 2× in r9, d4 25.8 s in r7;
// the between-query System.gc() meant to stabilize timings was the
// uncommit TRIGGER). Pinning the heap forbids uncommit; first-touch
// faults are then paid once, absorbed by Bench's untimed warm-up.
// (No AlwaysPreTouch here: pre-zeroing a ~90 GiB harness heap costs
// ~150 s of startup; tools/run.sh uses it for dev sweeps where the
// heap is 32g and the cost is ~5 s.)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
