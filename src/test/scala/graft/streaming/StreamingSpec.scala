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

  test("session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData(
      (Timestamp.valueOf("2025-06-10 12:00:00"), 1L),
      (Timestamp.valueOf("2025-06-10 12:10:00"), 1L), // same session (gap 30m)
      (Timestamp.valueOf("2025-06-10 15:00:00"), 1L), // new session
      (Timestamp.valueOf("2025-06-10 12:05:00"), 2L))
    val out = StreamingPipeline.sessionizedEventCounts(
      mem.toDF().toDF("ts", "user_id"), gap = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("sess")
      .select("user_id", "n_events").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    assert(rows(1L) == Seq(1L, 2L)) // one 2-event session + one 1-event
    assert(rows(2L) == Seq(1L))
  }

  test("flatMapGroupsWithState: counts survive across restarts via checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-state").toString
    val seen = scala.collection.concurrent.TrieMap.empty[Long, Long]
    def drain(mem: MemoryStream[(Long, String)]): Unit = {
      val q = StreamingPipeline.statefulUserCounts(mem.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => seen(r.getLong(0)) = r.getLong(1))
          ()
        }
        .start()
      q.awaitTermination()
    }
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "a"), (1L, "b"), (2L, "c"))
    drain(mem)
    assert(seen.get(1L).contains(2L) && seen.get(2L).contains(1L))
    mem.addData((1L, "d"))
    drain(mem) // restarted query, same checkpointed state store
    assert(seen.get(1L).contains(3L),
      s"user 1 cumulative must reach 3 across restart: $seen")
  }

  private implicit class ToMap2(rows: Array[(String, String, Long)]) {
    def toMap2: Map[(String, String), Long] =
      rows.map { case (p, q, f) => (p, q) -> f }.toMap
  }
}
