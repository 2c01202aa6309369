package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the `events.ts` load contract: downstream code (12 temporal
  * queries + streaming) assumes LongType NANOSECONDS since epoch, but the
  * driver-side testdata generator has shipped both ns-precision parquet
  * (LongType via nanosAsLong) and µs-precision parquet (TimestampType /
  * TimestampNTZ, on which nanosAsLong is a no-op — the round-8 type drift
  * that broke all 12). `Tables.normalizeEventTs` must yield the same
  * ns-long values whatever the physical encoding.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one instant, three encodings: 2024-03-01T12:34:56.789012Z
  private val micros = 1709296496789012L
  private val nanos  = micros * 1000L

  test("ts already LongType passes through untouched") {
    val df = Seq((1L, nanos)).toDF("event_id", "ts")
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(nanos))
  }

  test("TimestampType ts normalizes to exact ns-long") {
    val df = Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)))
    assert(df.schema("ts").dataType == TimestampType)
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(nanos))
  }

  test("TimestampNTZ ts normalizes to the same instant under UTC session tz") {
    val df = Seq(Tuple1(1L)).toDF("event_id")
      .withColumn("ts",
        timestamp_micros(lit(micros)).cast(TimestampNTZType))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == LongType)
    assert(out.collect().map(_.getLong(1)).toSeq == Seq(nanos))
  }

  test("normalization preserves column position and the other columns") {
    val df = Seq((1L, "click", 0.5)).toDF("event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(lit(micros)))
      .select("event_id", "ts", "event_type", "value")
    val out = Tables.normalizeEventTs(df)
    assert(out.columns.toSeq == Seq("event_id", "ts", "event_type", "value"))
    assert(out.collect().toSeq ==
      Seq(Row(1L, nanos, "click", 0.5)))
  }

  test("real testdata events loads as ns-long in a plausible epoch range") {
    val e = Tables.table(spark, sf0001, "events")
    assert(e.schema("ts").dataType == LongType)
    val Row(mn: Long, mx: Long) =
      e.agg(min("ts"), max("ts")).collect().head
    // ns since epoch for any modern date is > 1e18 (2001-09) and < 4e18
    // (2096) — a µs or ms value would fail by 3-6 orders of magnitude
    assert(mn > 1_000_000_000_000_000_000L, s"min ts $mn is not ns-scale")
    assert(mx < 4_000_000_000_000_000_000L, s"max ts $mx is not ns-scale")
  }
}
