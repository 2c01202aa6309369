package graft.tools

import graft.GraftSession

/** One-off: statePartitions sensitivity of the stream-stream interval
  * join drains (4 state stores per partition per trigger).
  */
object SsjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-ssj-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    graft.queries.StreamStaging.prebuild(spark, dir)
    t("warmup ssj sp=8") {
      graft.streaming.StreamingPipeline.streamIntervalJoin(spark, dir).count()
    }
    for (sp <- Seq(16, 8, 4, 2)) {
      t(s"ssj sp=$sp") {
        graft.streaming.StreamingPipeline.streamIntervalJoin(spark, dir, sp).count()
      }
      t(s"ssjo sp=$sp") {
        graft.streaming.StreamingPipeline.streamIntervalJoinOuter(spark, dir, sp).count()
      }
    }
    spark.stop()
  }
}
