package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Writes `.explain("formatted")` output for the given queries — the
  * r16 optimization round's plan evidence (plans/r16/<q>_<suffix>.txt).
  *
  * Run: sbt "Test/runMain graft.tools.FormattedPlan <suffix> <q1,q2,...> [sfDir] [outDir]"
  */
object FormattedPlan {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val qs = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty))
      .getOrElse(Array("q_pipeline"))
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val outDir = Paths.get(args.lift(3).getOrElse("plans/r16"))
    Files.createDirectories(outDir)
    val spark = GraftSession.local("graft-formatted-plan", 8)
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- qs) {
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        // same string explain("formatted") prints
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"${q}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plan] wrote ${q}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plan] $q failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
