package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ops/PrefixSum: the distributed global running sum must be value-
  * identical to the single-partition window form (the thing it exists to
  * avoid at scale) and independent of the input's physical layout.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    // skewed values + duplicate sort keys (total order restored by the id
    // tie-break) — the shapes that break naive prefix sums
    val rows = (1 to 2000).map { i =>
      (i.toLong, (i % 7).toLong, (if (i % 13 == 0) 1000L else i % 5 + 1))
    }
    rows.toDF("id", "grp_key", "v")
  }

  test("parity with the single-partition window cumsum") {
    val df = fixture
    val sort = Seq(col("grp_key").desc, col("id").asc)
    val got = PrefixSum.runningSum(df, sort, col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("cum", sum("v").over(w))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == exp)
  }

  test("independent of input partitioning") {
    val sort = Seq(col("grp_key").desc, col("id").asc)
    val a = PrefixSum.runningSum(fixture.repartition(1), sort, col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val b = PrefixSum.runningSum(fixture.repartition(7), sort, col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("empty input yields empty output") {
    val empty = fixture.filter(lit(false))
    assert(PrefixSum.runningSum(empty, Seq(col("id").asc), col("v"), "cum")
      .count() == 0L)
  }

  test("multi-column form: parity per column, one range exchange total") {
    val df = fixture.withColumn("v2", col("id") % 11)
    val sort = Seq(col("grp_key").desc, col("id").asc)
    val multi = PrefixSum.runningSums(df, sort,
      Seq(col("v") -> "c1", col("v2") -> "c2"))
    val got = multi.select("id", "c1", "c2")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val w = Window.orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("c1", sum("v").over(w))
      .withColumn("c2", sum("v2").over(w))
      .select("id", "c1", "c2")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == exp)
    // n totals must share one range partition of the data — the static
    // pre-AQE plan shows the range exchange once per consuming branch
    // (data path + offsets lineage, deduped by AQE stage reuse at
    // runtime), so the bound is 2 regardless of column count; the naive
    // per-column runningSum chain would show 2 PER COLUMN
    val p = multi.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning")) <= 2,
      s"multi-column form must not range-partition per column:\n$p")
  }
}
