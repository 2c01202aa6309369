package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming tier: AvailableNow incremental pipeline processes each log
  * file exactly once across restarts; windowed aggregation buckets an
  * event stream by tumbling window + type.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drains new files exactly once across invocations") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val logs = s"$dir/logs"; Files.createDirectories(Paths.get(logs))
    Files.writeString(Paths.get(s"$logs/h1.txt"), "abc\nabc\nxyz\n")

    val n1 = StreamingPipeline.runAvailableNow(spark, logs,
      s"$dir/state", s"$dir/topk", 5, s"$dir/ckpt")
    val state1 = spark.read.parquet(s"$dir/state")
      .as[(String, String, Long)].collect().toMap2
    assert(n1 >= 1)
    assert(state1(("ab", "abc")) == 2L && state1(("xy", "xyz")) == 1L)

    // second invocation with one NEW file: old file must not re-count
    Files.writeString(Paths.get(s"$logs/h2.txt"), "abc\n")
    StreamingPipeline.runAvailableNow(spark, logs,
      s"$dir/state", s"$dir/topk", 5, s"$dir/ckpt")
    val state2 = spark.read.parquet(s"$dir/state")
      .as[(String, String, Long)].collect().toMap2
    assert(state2(("ab", "abc")) == 3L, s"got $state2")
    assert(state2(("xy", "xyz")) == 1L)

    // third invocation with nothing new: state unchanged
    StreamingPipeline.runAvailableNow(spark, logs,
      s"$dir/state", s"$dir/topk", 5, s"$dir/ckpt")
    val state3 = spark.read.parquet(s"$dir/state")
      .as[(String, String, Long)].collect().toMap2
    assert(state3 == state2)
  }

  test("windowed event counts bucket by 5-minute tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val t0 = Timestamp.valueOf("2025-06-10 12:00:30")
    val t1 = Timestamp.valueOf("2025-06-10 12:02:00")
    val t2 = Timestamp.valueOf("2025-06-10 12:07:10")
    mem.addData((t0, "click"), (t1, "click"), (t2, "view"))

    val out = StreamingPipeline.windowedEventCounts(
      mem.toDF().toDF("ts", "event_type"))
    val q = out.writeStream.format("memory").queryName("win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("win")
      .select(date_format(col("window_start"), "HH:mm").as("w"),
        col("event_type"), col("cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(rows == Set(("12:00", "click", 2L), ("12:05", "view", 1L)))
  }

  private implicit class ToMap2(rows: Array[(String, String, Long)]) {
    def toMap2: Map[(String, String), Long] =
      rows.map { case (p, q, f) => (p, q) -> f }.toMap
  }
}
