package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.llm.Dedup

/** Phase-timing probe for the connected-components tail:
  * sbt "Test/runMain graft.tools.CcProbe [sfDir]"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-cc-probe",
      Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    docs.count()
    val pairs = Dedup.minhashDedup(docs, "doc_id", "text")
    val pinned = t("mine+checkpoint pairs") {
      val p = pairs.select("a", "b").localCheckpoint(true)
      println(s"[ccprobe] pairs = ${p.count()}")
      p
    }
    t("cc on pinned pairs") {
      println(s"[ccprobe] labels = ${
        Dedup.connectedComponents(pinned).count()}")
    }
    t("cc end-to-end (as declared)") {
      Dedup.connectedComponents(
        Dedup.minhashDedup(docs, "doc_id", "text")).count()
    }
    spark.stop()
  }
}
