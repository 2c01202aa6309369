package graft.tools

import graft.GraftSession

/** Measures the micro-batch constant-overhead hypothesis (r10 verdict
  * #7): the stateful drains pay per-trigger costs proportional to the
  * state-store instance count (= spark.sql.shuffle.partitions at plan
  * time), not to data. Run: sbt "Test/runMain graft.tools.StreamProbe".
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-stream-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.queries.StreamStaging.prebuild(spark, dir)
    // warm
    t("warmup window_update sp=32") {
      graft.streaming.StreamingPipeline.streamWindowUpdate(spark, dir).count()
    }
    for (sp <- Seq(32, 16, 8, 4)) {
      spark.conf.set("spark.sql.shuffle.partitions", sp.toString)
      t(s"window_update sp=$sp") {
        graft.streaming.StreamingPipeline.streamWindowUpdate(spark, dir)
          .count()
      }
      t(s"dedup_update sp=$sp") {
        graft.streaming.StreamingPipeline.streamDedupUpdate(spark, dir)
          .count()
      }
    }
    spark.stop()
  }
}
