package graft.tools

import graft.GraftSession

/** Checks bloom_filter_agg / might_contain availability in this Spark:
  * sbt "Test/runMain graft.tools.BloomProbe"
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-bloom-probe", 4)
    spark.sparkContext.setLogLevel("WARN")
    val out = spark.sql(
      """SELECT sum(CASE WHEN graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(id), 100L, 800L)
        |     FROM range(100)),
        |    xxhash64(t.id)) THEN 1 ELSE 0 END) hits
        |FROM range(200) t(id)""".stripMargin).collect()
    println(s"[bloomprobe] hits=${out.head.getLong(0)} (expect >=100, <200)")
    spark.stop()
  }
}
