package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Breadth plan-shape census (r16 optimization round): for EVERY declared
  * query, count the physical-plan operators that matter for §2/§3 of the
  * optimization guide — Exchange, SortMergeJoin, BroadcastHashJoin,
  * ShuffledHashJoin, CartesianProduct, BroadcastNestedLoopJoin, Window,
  * HashAggregate, SortAggregate — from the INITIAL executed plan (AQE
  * may improve it at runtime; a bad initial shape is still the signal).
  * Streaming gate entries are skipped (their plan is the drained local
  * table, not the stream). Output: one CSV row per query.
  *
  * Run: sbt "Test/runMain graft.tools.PlanScan [outFile] [sfDir]"
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/plan_scan.csv")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("graft-plan-scan", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val ops = Seq("Exchange", "SortMergeJoin", "BroadcastHashJoin",
      "ShuffledHashJoin", "CartesianProduct", "BroadcastNestedLoopJoin",
      "Window", "HashAggregate", "SortAggregate", "Generate", "Sort ")
    val sb = new StringBuilder
    sb.append("query," + ops.map(_.trim).mkString(",") + ",error\n")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream"))
    for (n <- names) {
      val row = try {
        val plan = SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan.toString
        ops.map(op => plan.sliding(op.length).count(_ == op)).mkString(",") +
          ","
      } catch {
        case e: Throwable =>
          ops.map(_ => "").mkString(",") + "," +
            e.getClass.getSimpleName
      }
      sb.append(s"$n,$row\n")
      System.err.println(s"[scan] $n")
    }
    Files.write(Paths.get(out),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
