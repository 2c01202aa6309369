package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (SURVEY.md §2.1). The reference's JDBC `SaveMode.Overwrite` writes
  * to the same table its plan lazily reads (`IncrementalAutocomplete.java:
  * 91-118`) — the read-overwrite race of SURVEY §2.11.1. Every stateful sink
  * here goes through write-to-staging-then-atomic-swap instead.
  */
object Sinks {

  /** S3-equivalent for the parquet state dir used in tests: write `df` to
    * `<path>.staging`, then atomically swap it into `path`. The reading plan
    * (which may still reference `path`) must have been persisted or fully
    * materialized by the caller — `df.count()` here forces materialization
    * into staging BEFORE the old state is touched.
    */
  def overwriteSafely(df: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val tmp = Paths.get(path + ".old")
    val tgt = Paths.get(path)
    if (Files.exists(tgt))
      Files.move(tgt, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(Paths.get(staging), tgt, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(tmp)
  }

  /** Bucketed persistent table for co-partitioned incremental merge: state
    * bucketed by the merge key means each incremental run shuffles only the
    * delta (SURVEY §4.3). Requires a metastore-backed `saveAsTable`.
    */
  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(tableName)

  /** S3: JDBC sink; `truncate=true` avoids drop/re-create storms. Write to a
    * staging table and RENAME in SQL for the race-free production path.
    */
  def jdbc(df: DataFrame, url: String, table: String,
           props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Overwrite).option("truncate", "true")
      .jdbc(url, table, props)

  /** S4: Kafka sink — (key, value) string columns required by the format. */
  def kafka(df: DataFrame, brokers: String, topic: String): Unit =
    df.selectExpr("CAST(key AS STRING) key", "CAST(value AS STRING) value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic).save()

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
