ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "inferdbspark"
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
// The bench driver parses the LAST stdout lines of `sbt "runMain ..."` as
// bare one-line JSON. sbt's default forked-run output strategy is
// LoggedOutput, which prefixes every forked line with "[info] " — that
// prefix made the machine lines unparseable two rounds running
// (BENCH_r15/BENCH_r16 "parsed": null). StdoutOutput passes the forked
// JVM's stdout through verbatim, so the JSON lines stay bare.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's own trailing "[success] Total time: ..." line so the
// bench's compact summary JSON is the LAST line of stdout.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 24g default (was 8g): a full 206-query Bench sweep in ONE JVM
  // accumulates bounded memo caches, streaming state stores, memory
  // sinks and codegen classes; at 8g the sweep's tail (the x_stream_*
  // rows run last) degraded 3-7x from GC churn — measured r12:
  // x_stream_topk 42 s at 8g vs 6.9 s at 24g, isolated 4.9 s. The
  // machine has 128 GiB; heap is lazily committed.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
