package graft.tools

import graft.GraftSession

/** One-off A/B probe for the remaining streaming-drain floor: wall time
  * of a representative update-merge drain under candidate session knobs
  * (state partition count, changelog checkpointing, RocksDB compression),
  * 3 runs each after a JIT warm. Run:
  *   sbt "Test/runMain graft.tools.StreamKnobProbe [sfDir]"
  */
object StreamKnobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-stream-knobs", 32)
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.StreamStaging.prebuild(spark, dir)
    def run(parts: Int): Double = {
      val t0 = System.nanoTime()
      graft.streaming.StreamingPipeline.streamWindowUpdate(spark, dir,
        statePartitions = parts).count()
      (System.nanoTime() - t0) / 1e9
    }
    // warm
    run(8); run(8)
    def trial(label: String, parts: Int = 8)(setup: => Unit)(
        teardown: => Unit): Unit = {
      setup
      val ts = (1 to 5).map(_ => run(parts))
      teardown
      println(f"[knob] $label%-40s ${ts.map(t => f"$t%.2f").mkString(" ")}" +
        f"  min=${ts.min}%.2f med=${ts.sorted.apply(2)}%.2f")
    }
    // teardown restores the PRE-TRIAL conf value (r15 ADVICE), not a
    // hardcoded default — a drifted session default would otherwise skew
    // every later trial
    def confTrial(label: String, key: String, value: String): Unit = {
      val before = spark.conf.getOption(key)
      trial(label) { spark.conf.set(key, value) } {
        before match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
    trial("baseline (8 parts, changelog, lz4)") {} {}
    trial("parts=4", parts = 4) {} {}
    trial("parts=2", parts = 2) {} {}
    confTrial("changelog OFF",
      "spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled", "false")
    confTrial("hdfs-backed provider",
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider")
    trial("baseline again (drift check)") {} {}
    println("[knob] done")
    spark.stop()
  }
}
