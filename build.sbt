ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "batchprocessingpipelinespark"
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
// Driver bench contract (r16 verdict #2, dead since BENCH_r14): the
// bench's one-line JSON must reach the driver as a RAW final stdout
// line. The default forked-run LoggedOutput strategy prefixed every
// program line with [info]/[error] and sbt appended a "[success] Total
// time" banner after it — the driver's tail capture then never parsed
// the line (parsed:null in BENCH_r12..r16). StdoutOutput passes the
// forked JVM's stdout/stderr through verbatim; showSuccess=false drops
// the trailing banner so the JSON line is the last stdout line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not by a task, so the
// unused-setting lint cannot see the use
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
  // Heap sizing note (r5): 24g/Xms-pinned/PreTouch variants were tried
  // against the roaming +2-4s full-GC pause that lands on ~2 random
  // minhash-family queries per single-run sweep — all were SLOWER on
  // this VM (committing tens of GiB of fresh pages under firecracker
  // costs more than the GC it saves). 8g is the measured optimum; the
  // residual noise is characterized in ROUND5_NOTES.md.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // GC pinning (r7): measured head-to-head on the 12-query heavy subset
  // (2 sweeps each, same tree): ParallelGC 25.7/27.5 s vs default G1
  // 27.8/30.3 s — ParallelGC faster on ~every query (q_pq_refine 3.3/3.5
  // vs 3.9/4.1, q_knn_clusters 3.3/3.6 vs 3.7/3.7) and tighter
  // run-to-run. Expected for a throughput-bound batch workload on a
  // small (8g) heap: G1's concurrent cycles + region management buy
  // pause goals this benchmark doesn't need. Override via SPARK_GC_FLAGS.
) ++ sys.env.getOrElse("SPARK_GC_FLAGS", "-XX:+UseParallelGC")
  .split(" ").filter(_.nonEmpty).toSeq
