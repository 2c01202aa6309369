package graft

import org.apache.spark.sql.functions._

/** Sketch-aggregate sanity: approximate results stay within their
  * documented error envelopes of the exact computation —
  * approx_count_distinct (HLL, default rsd=5%) and approx_percentile
  * (GK quantile sketch, rank error <= n/accuracy).
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

  test("merged HLL sketches estimate within error; merge equals rescan") {
    val o = Tables.table(spark, sf0001, "orders")
    // the declared query's shape: partial sketches per (priority, status),
    // unioned per priority — compared against the exact distinct count
    val partials = o.groupBy("o_orderpriority", "o_orderstatus")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = partials.groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = o.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact"))
    val rows = merged.join(exact, "o_orderpriority")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, est, ex) =>
      val rel = math.abs(est - ex).toDouble / ex
      assert(rel <= 0.1, s"$k: est=$est exact=$ex rel=$rel")
    }
    // merging partials must equal sketching the whole table directly —
    // THE mergeability property that makes stored sketch state valid
    val direct = o.groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .as[(String, Long)].collect().toMap
    val viaMerge = merged.as[(String, Long)].collect().toMap
    assert(viaMerge == direct, s"merge path diverged: $viaMerge vs $direct")
  }

  test("approx_percentile within the sketch's rank-error bound of exact") {
    val o = Tables.table(spark, sf0001, "orders")
    val c = round(col("o_totalprice") * 100).cast("long")
    // accuracy A => rank error <= n/A; translate to a value-domain check
    // by comparing against the exact values at rank +- n/A
    val acc = 1000
    val rows = o.select(c.as("c"))
      .agg(expr(s"approx_percentile(c, 0.5D, $acc)").as("approx"),
        expr("percentile(c, 0.5D)").as("exactMid"),
        expr(s"percentile(c, ${0.5 - 1.0 / acc}D)").as("lo"),
        expr(s"percentile(c, ${0.5 + 1.0 / acc}D)").as("hi"))
      .as[(Long, Double, Double, Double)].collect()
    val (approx, _, lo, hi) = rows.head
    assert(approx >= lo.floor && approx <= hi.ceil,
      s"approx median $approx outside exact rank envelope [$lo, $hi]")
  }

  test("count-min sketch: est >= exact always, est <= exact + eps*N w.h.p.") {
    val rows = SparkEntry.queries("q_cms_heavy_hitters")(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(rows.length == 20)
    val n = Tables.table(spark, sf0001, "documents")
      .select(explode(graft.ops.llm.TextOps.tokens(col("text"))).as("t"))
      .count()
    rows.foreach { case (term, exact, est) =>
      // CMS never under-counts
      assert(est >= exact, s"$term: est=$est < exact=$exact")
      // eps = 0.001 → over-count <= eps*N with confidence 0.99 per
      // probe; allow the full bound
      assert(est <= exact + (0.001 * n).ceil.toLong,
        s"$term: est=$est exceeds exact=$exact + eps*N")
    }
    // SQL registration of the probe side
    val viaSql = spark.sql(
      """SELECT graft_cms_estimate(count_min_sketch(x, 0.01d, 0.99d, 7), 'a')
        |FROM VALUES ('a'), ('b'), ('a') AS t(x)""".stripMargin)
      .as[Long].head()
    assert(viaSql == 2L)
  }
}
