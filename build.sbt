ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskarrayspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// small block size so EVERY spec exercises the multi-block carry/halo
// paths of the windowed operators (production default is 4096)
Test / javaOptions += "-Dgraft.block.size=64"
run / fork := true
// Bench/Verify stdout contract: the driver parses the FINAL unprefixed
// stdout line as the metric JSON. sbt's default LoggedOutput prefixes
// every forked-process line with [info]/[error] and appends its own
// "[success] Total time" line — both break that parse. StdoutOutput
// passes the child's stdout/stderr through verbatim; showSuccess drops
// the trailing [success] line so the JSON stays last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess // consumed by commands, not tasks
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
  // r17: the 307-query bench session fills ~192 MB of the default
  // 240 MB code-cache reserve (bench_detail cc_mb, flat across rounds).
  // Near the ceiling HotSpot starts flushing cold compiled methods and
  // the resulting recompile churn shows up as multi-minute roving stall
  // epochs late in the suite (r16 driver class: jit_ms doubling while
  // cc_mb sits pinned at ~190; reproduced here with s14-s17 at 3-8x
  // their clean steadies and every file op inflated alike). 512 MB
  // gives the full suite 2.5x headroom so compiled code stays compiled.
  "-XX:ReservedCodeCacheSize=512m",
  // ScalaTest suites share one JVM-wide SparkSession via getOrCreate,
  // which IGNORES a late suite's builder configs — session-critical
  // configs therefore ride system properties so the FIRST session (from
  // whichever suite wins the race) already carries them:
  // events.ts is parquet TIMESTAMP(NANOS) → read as epoch-nano INT64
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  // graft_* native expressions registered no matter who builds the session
  "-Dspark.sql.extensions=graft.GraftExtensions",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
