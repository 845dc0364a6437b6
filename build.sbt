ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jsonschemaspark"
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
  // Heap sized to the WORKING SET, not to the box: this microVM's host
  // overcommits guest memory, and a 48g heap measured 70x slower than 8g
  // on the identical clips scan (134s -> 2.1s; host-level page reclaim
  // stalls every fresh-page touch — the JVM wouldn't even answer jstack).
  // 8g comfortably fits every sf0.1 workload and matches realistic
  // per-executor sizing on a production cluster.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector: the engine's hot paths are allocation-heavy
  // batch loops (per-document value trees); ParallelGC measures ~15-20%
  // faster than the G1 default on the recursive parse+validate probe and
  // matches common production Spark executor tuning. Parameterised for
  // A/B runs. r06 re-measured the trade: G1 looked ~1.2s faster on one
  // clips-suite window but costs the STREAMING kernel 35-40% single-core
  // (CITM 737 -> 454 docs/s in back-to-back probes — G1 write barriers on
  // the per-document value-tree allocation) — the reference-mirror lanes
  // keep ParallelGC.
  sys.env.getOrElse("SPARK_GC", "-XX:+UseParallelGC"),
)
