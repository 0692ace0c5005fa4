ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparketltwitterspark"
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
// Pass the forked JVM's stdout through UNPREFIXED: the default logged
// strategy prepends "[info] " to every line, which corrupted the
// one-line bench JSON the driver parses (BENCH_r01/r02 parsed:null).
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
  // 8g thrashes GC under local[32] at sf0.1 (measured: same query
  // 2.2s vs 101s run-to-run near heap capacity); 24g is stable.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Never SHRINK the heap (round 15): G1 uncommits regions back to
  // the OS on every full GC once free space exceeds
  // MaxHeapFreeRatio (default 70) — and the bench harness
  // System.gc()s between queries — while THIS VM (firecracker,
  // lazily-materialized guest pages) re-faults uncommitted pages
  // slowly on the JVM's allocation paths. Measured on the q22 sf1
  // sort: 10-14s with pages resident vs 95-330s re-materializing;
  // this commit/uncommit churn is the root cause of the
  // cross-round "same query 2.2s vs 101s" variance class. At 100
  // the shrink never triggers: the heap grows organically to its
  // high-water mark and every faulted page stays resident for the
  // JVM's lifetime. (An -Xms == -Xmx pin was tried first and
  // REGRESSED the suite ~1.8x uniformly: it hands G1 a 24 GB young
  // gen whose still-cold regions fault mid-GC; organic growth keeps
  // eden inside materialized pages.)
  "-XX:MaxHeapFreeRatio=100",
)
