package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** q_regression (X50): full parity with a plain-Scala normal-equations
  * fit (a third implementation beyond the DuckDB oracle), plus the
  * degenerate-group filter law. The exact BIGINT moment sums and the
  * mirrored double-promotion closed form are the whole contract — any
  * order-dependence or promotion drift breaks this bit-for-bit.
  */
class RegressionSpec extends SparkSpec {

  // HALF_UP on the shortest-decimal form — the rounding Spark's round()
  // applies to doubles (math.round would differ at negative halves)
  private def r0(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q_regression: slope/intercept parity with plain-Scala normal equations") {
    val rows = Tables.table(spark, sf0001, "lineitem")
      .selectExpr("CAST(l_suppkey AS BIGINT)", "CAST(l_quantity AS DOUBLE)",
        "CAST(l_discount AS DOUBLE)").collect()
      .map(r => (r.getLong(0),
        r0(r.getDouble(1)),
        r0(r.getDouble(2) * 10000)))
    val expected = rows.groupBy(_._1).flatMap { case (sk, pts) =>
      val n = pts.length.toLong
      val sx = pts.map(_._2).sum
      val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val denom = n.toDouble * sxx - sx.toDouble * sx
      if (n >= 2 && denom != 0d) Some(sk -> ((n,
        r0(1000000 * (n.toDouble * sxy - sx.toDouble * sy) / denom),
        r0(1000000 *
          (sy.toDouble * sxx - sx.toDouble * sxy) / denom))))
      else None
    }
    val got = SparkEntry.queries("q_regression")(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length == expected.size,
      "exactly the non-degenerate groups must survive")
    got.foreach { r =>
      val sk = r.get(r.fieldIndex("l_suppkey"))
        .asInstanceOf[Number].longValue
      val (n, slope, icept) = expected(sk)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("slope_ppm") == slope,
        s"suppkey $sk: slope mismatch")
      assert(r.getAs[Long]("intercept_ppm") == icept,
        s"suppkey $sk: intercept mismatch")
    }
  }
}
