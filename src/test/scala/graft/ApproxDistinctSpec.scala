package graft

import org.apache.spark.sql.functions._

/** HLL sketch sanity: approx_count_distinct stays within the documented
  * relative-error envelope of the exact distinct count (default rsd=5%).
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 3*rsd of exact") {
    val o = Tables.table(spark, sf0001, "orders")
    val rows = o.groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey")).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, approx, exact) =>
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.15, s"$k: approx=$approx exact=$exact rel=$rel")
    }
  }
}
