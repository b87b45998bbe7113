ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icecubespark"
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
// Forked run output must reach stdout RAW (no sbt [info] prefix): the
// driver machine-parses Bench's single JSON line.
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
  // 16g default: at local[32] the 8g heap spent >10% of heavy agg stages
  // in GC (32 concurrent tasks churning UTF8String/agg buffers); the
  // bench/verify host has far more RAM than this.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 141 queries × (warmup + 2 timed runs) of whole-stage-codegen classes
  // overflow the default 240 MB JIT code cache mid-run; when it fills,
  // HotSpot DISABLES the compiler and later (alphabetically) queries run
  // their codegen'd projections INTERPRETED — measured in round 7 as
  // CPU-real ×5-31 inflation on trivial scalar queries (m5/m8/m7/m6/q1)
  // that a fresh-JVM probe could not reproduce on identical plans.
  // 1g sufficed for 141 queries; the round-9 official run compiled 422
  // queries' classes (×3 passes) and late-running retrieval queries
  // showed the same interpreted-execution CPU signature (task-CPU ×14-43
  // on unchanged code), so the cache is sized 2g and Bench now reports a
  // CodeHeap peak-usage gauge + per-query JIT-time deltas in
  // bench_diag.json so a recurrence names itself in the artifact.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
)
