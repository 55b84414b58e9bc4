ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectrekkerspark"
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
// The bench/verify driver keeps the tail of `sbt runMain` output and
// parses the metric JSON line out of it; sbt's default LoggedOutput wraps
// every forked-JVM line as "[info] {...}", which defeats a line-level JSON
// parse (BENCH_r01..r09 all landed parsed:null with the metric line intact
// but prefixed). StdoutOutput passes the forked process's lines through
// unmodified.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 130-query benchmark generates hundreds of whole-stage-codegen classes;
  // the JDK default 240 MB code cache fills mid-run, HotSpot silently stops
  // JIT-compiling, and late CPU-bound queries run interpreted (measured:
  // q68 2.6 s -> 7.6-15.9 s depending on where the cache filled; with 1g,
  // no late-run inflation and the best full-bench total). Reservation is
  // virtual address space, not committed memory.
  "-XX:ReservedCodeCacheSize=1g",
)
