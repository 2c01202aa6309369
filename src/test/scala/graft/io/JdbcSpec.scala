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

  test("MySQL-DDL-shaped round-trip pins the INT narrowing cast (§2.6)") {
    // The reference's MySQL tables declare `frequency INT` and
    // `prefix VARCHAR(60)`; Spark's sum() yields LongType, so the
    // reference implicitly narrows on JDBC write. Here the narrowing is
    // EXPLICIT (cast to int before the sink) and the DDL shape is
    // imposed via createTableColumnTypes — write with the MySQL column
    // types, read back, and the values plus the narrowed catalog types
    // must survive unchanged (no H2/MySQL engine ships in this sandbox;
    // Derby enforces the same VARCHAR(60)/INTEGER DDL semantics).
    val agg = Seq(("ab", "abc", 2147483000L), ("cd", "cde", 1L))
      .toDF("prefix", "query", "frequency")
      .selectExpr("prefix", "query", "cast(frequency as int) as frequency")
    agg.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("createTableColumnTypes",
        "prefix VARCHAR(60), query VARCHAR(255), frequency INT")
      .jdbc(url, "freq_mysql_ddl", props)
    val back = Sources.jdbc(spark, url, "freq_mysql_ddl", props)
    // catalog type round-trips as INTEGER, not BIGINT
    assert(back.schema("frequency").dataType ==
      org.apache.spark.sql.types.IntegerType,
      s"INT column must read back as IntegerType: ${back.schema}")
    assert(back.as[(String, String, Int)].collect().toSet ==
      Set(("ab", "abc", 2147483000), ("cd", "cde", 1)))
    // VARCHAR(60) is enforced by the engine: a 61-char prefix must be
    // rejected, proving the DDL shape actually took effect
    val tooLong = Seq(("x" * 61, "q", 1)).toDF("prefix", "query", "frequency")
    val e = intercept[Exception] {
      tooLong.write.mode(org.apache.spark.sql.SaveMode.Append)
        .jdbc(url, "freq_mysql_ddl", props)
    }
    assert(e.toString.toLowerCase.contains("truncation") ||
      e.getCause != null, s"expected a VARCHAR(60) overflow: $e")
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
