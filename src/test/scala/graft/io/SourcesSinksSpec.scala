package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Format round-trips plus the partition-pruning property that makes the
  * partitioned layout worth it at scale.
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    graft.TempDirs.create(prefix) + "/t"

  test("partitioned parquet: filter on the partition column prunes files") {
    val dir = tmp("graft-part")
    val df = Seq((1L, "click", 10L), (2L, "view", 20L), (3L, "click", 30L),
      (4L, "buy", 40L)).toDF("event_id", "event_type", "v")
    Sinks.parquetPartitioned(df, dir, Seq("event_type"))

    val back = Sources.parquet(spark, dir)
    val filtered = back.filter(col("event_type") === "click")
    assert(filtered.collect().length == 2)

    // pruning: the executed scan must read only the click partition's
    // files (2 of 4 — the writer produced one file per input partition)
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == 2, s"expected 2 pruned files, read $filesRead")
    // and the physical scan carries it as a PartitionFilter, not a
    // post-scan predicate
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition filter in:\n$plan")
  }

  test("partition overwrite replaces one partition, not the table") {
    val dir = tmp("graft-dynpart")
    Sinks.parquetPartitioned(
      Seq((1L, "click"), (2L, "view")).toDF("id", "t"), dir, Seq("t"))
    // the helper scopes dynamic mode to the write: re-writing only a
    // click row must leave the view partition intact (static mode would
    // truncate the whole table)
    Sinks.parquetPartitioned(Seq((9L, "click")).toDF("id", "t"),
      dir, Seq("t"))
    val back = Sources.parquet(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(back == Set((9L, "click"), (2L, "view")), s"got $back")
  }

  test("orc round-trip preserves rows and pushes filters") {
    val dir = tmp("graft-orc")
    val df = (1L to 100L).map(i => (i, s"doc$i")).toDF("id", "name")
    Sinks.orc(df, dir)
    val back = Sources.orc(spark, dir).filter(col("id") <= 10)
    assert(back.count() == 10)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), LessThanOrEqual(id,10)]"),
      s"filter must reach the ORC scan:\n$plan")
  }

  test("csv and json round-trip with explicit schemas") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")

    val csvDir = tmp("graft-csv")
    df.write.option("header", "true").csv(csvDir)
    assert(Sources.csv(spark, csvDir, schema).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))

    val jsonDir = tmp("graft-json")
    df.write.json(jsonDir)
    assert(Sources.jsonLines(spark, jsonDir, schema).as[(Long, String)]
      .collect().toSet == Set((1L, "a"), (2L, "b")))
  }
}
