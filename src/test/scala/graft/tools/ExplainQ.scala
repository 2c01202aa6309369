package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan dump helper: sbt "Test/runMain graft.tools.ExplainQ <query> [sfDir]" */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_pipeline")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-explain", 4)
    spark.sparkContext.setLogLevel("WARN")
    println(SparkEntry.queries(q)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
