package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet star-schema loaders for the driver testdata (TESTDATA.md) plus
  * the schema constants of the rebuilt pipeline (reference:
  * `IncrementalAutocomplete.java:81-84`, DDL in
  * `approach 4 cli insturctions.txt:42-56`).
  */
object Tables {

  /** Load one testdata table: `<sfDir>/<name>.parquet`.
    *
    * `events.parquet` stores ns-precision timestamps, surfaced as LongType
    * ns-since-epoch via `spark.sql.legacy.parquet.nanosAsLong` — set once
    * in GraftSession.builder (a per-load `spark.conf.set` would mutate
    * session state as a side effect and race under concurrent query
    * construction). The flag only affects NANOS columns (every other
    * testdata timestamp is µs); queries that need a real timestamp convert
    * with `timestamp_micros(ts div 1000)`.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // -- Pipeline schemas (declared explicitly; no inference at runtime) ------

  /** Mid-pipeline (prefix, query, count) rows — reference builds this schema
    * by hand at `IncrementalAutocomplete.java:81-84`.
    */
  val prefixPair: StructType = StructType(Seq(
    StructField("prefix", StringType, nullable = false),
    StructField("query", StringType, nullable = false),
    StructField("count", IntegerType, nullable = false)))

  /** Cumulative state table `prefix_query_frequency`
    * (`approach 4 cli insturctions.txt:42-49`). `frequency` is declared long:
    * Spark's `sum` widens int→long and we keep the widening explicit instead
    * of silently narrowing on write like the reference JDBC path does.
    */
  val freqTable: StructType = StructType(Seq(
    StructField("prefix", StringType, nullable = false),
    StructField("query", StringType, nullable = false),
    StructField("frequency", LongType, nullable = false)))

  /** Final `prefix_suggestions` shape (`approach 4 cli insturctions.txt:51-56`):
    * completions is a JSON array of query strings in rank order.
    */
  val topKTable: StructType = StructType(Seq(
    StructField("prefix", StringType, nullable = false),
    StructField("completions", StringType, nullable = false)))
}
