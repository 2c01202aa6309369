package graft.io

import java.util.Properties

import graft.SparkSpec

/** S2/S3 (SURVEY §2.1): JDBC source + sink round-trip against an embedded
  * Derby database (the driver ships with Spark) — the closest local stand-in
  * for the reference's MySQL tables, covering the previously-untested JDBC
  * paths end-to-end: overwrite sink, plain scan, and the partitioned
  * parallel scan.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc sink overwrite + source scan round-trip") {
    val df = Seq(("ab", "abc", 3L), ("cd", "cde", 1L))
      .toDF("prefix", "query", "frequency")
    Sinks.jdbc(df, url, "freq_roundtrip", props)
    val back = Sources.jdbc(spark, url, "freq_roundtrip", props)
      .as[(String, String, Long)].collect().toSet
    assert(back == Set(("ab", "abc", 3L), ("cd", "cde", 1L)))

    // overwrite replaces, not appends (the reference's S3 semantics)
    Sinks.jdbc(df.limit(1), url, "freq_roundtrip", props)
    assert(Sources.jdbc(spark, url, "freq_roundtrip", props).count() == 1)
  }

  test("partitioned jdbc scan reads the full table in parallel") {
    val df = (1L to 100L).map(i => (i, s"q$i")).toDF("id", "query")
    Sinks.jdbc(df, url, "freq_part", props)
    val scan = Sources.jdbc(spark, url, "freq_part", props,
      partitionColumn = Some(("id", 1L, 100L, 4)))
    assert(scan.rdd.getNumPartitions == 4)
    assert(scan.count() == 100)
    assert(scan.agg(org.apache.spark.sql.functions.sum("id"))
      .as[Long].head() == 5050L)
  }
}
