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

  // Drift guard: the as-LOADED schema contract every query codes against
  // (post-normalization — events.ts is always ns-long here whatever the
  // file stores). The driver regenerates the testdata between rounds and
  // has already changed a physical type once (events.ts ns→µs, breaking
  // 12 queries at analysis time); this failing FIRST, with the table and
  // column named, turns the next drift into a 10-second diagnosis.
  test("loaded testdata schemas match the query-side contract") {
    val expected = Map(
      "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampType),
      "events" -> Seq("event_id" -> LongType, "ts" -> LongType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
    // timestamp columns may legitimately surface as TIMESTAMP or
    // TIMESTAMP_NTZ depending on writer metadata — both give the same
    // instant under the pinned UTC session tz; accept either.
    def ok(actual: DataType, exp: DataType): Boolean = (actual, exp) match {
      case (TimestampNTZType, TimestampType) => true
      case (ArrayType(a, _), ArrayType(b, _)) => ok(a, b)
      case (a, b) => a == b
    }
    val problems = expected.toSeq.flatMap { case (t, cols) =>
      val loaded = Tables.table(spark, sf0001, t).schema
      val actual = loaded.fields.map(f => f.name -> f.dataType).toSeq
      if (actual.map(_._1) != cols.map(_._1))
        Seq(s"$t: columns ${actual.map(_._1)} != ${cols.map(_._1)}")
      else cols.zip(actual).collect {
        case ((n, exp), (_, act)) if !ok(act, exp) =>
          s"$t.$n: loaded $act, queries expect $exp"
      }
    }
    assert(problems.isEmpty, problems.mkString("; "))
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
