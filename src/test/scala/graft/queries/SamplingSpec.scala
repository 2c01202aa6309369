package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q_weighted_sample's PPSWOR reduction: per-stratum bottom-k of docs
  * ranked by MIN digest key over w trials must equal bottom-k DISTINCT
  * docs over the weight-EXPANDED key population — the identity that makes
  * min-of-w-digests exact probability-proportional-to-weight sampling
  * without replacement (each expanded key is equally likely to be the
  * stratum minimum, so the first selection lands on a doc with
  * probability w/Σw; deleting and repeating gives the chain).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("min-key rank equals bottom-k distinct over the expanded population") {
    val d = graft.Tables.table(spark, sf0001, "documents")
    val expanded = d.select(col("doc_id"), col("lang"),
        lower(trim(col("text"))).as("q"),
        expr("cast(1 + least(n_chars div 100, 7) as int)").as("w"))
      .select(col("doc_id"), col("lang"), col("q"),
        explode(sequence(lit(1), col("w"))).as("j"))
      .select(col("doc_id"), col("lang"),
        sha2(concat_ws(":", col("q"), col("j")), 256).as("skey"))

    // form A (the declared query): min key per doc, then rank
    val minKey = expanded.groupBy("doc_id", "lang").agg(min("skey").as("skey"))
    val wA = Window.partitionBy("lang").orderBy(col("skey"), col("doc_id"))
    val a = minKey.select(col("doc_id"), col("lang"),
        row_number().over(wA).as("rk"))
      .filter(col("rk") <= 20)
      .as[(Long, String, Int)].collect().toSet

    // form B: walk the EXPANDED population in key order, keep each doc's
    // first appearance, take the first 20 docs per stratum
    val wB = Window.partitionBy("lang").orderBy(col("skey"), col("doc_id"))
    val firstSeen = expanded
      .withColumn("seen", row_number().over(
        Window.partitionBy("lang", "doc_id").orderBy(col("skey"))))
      .filter(col("seen") === 1).drop("seen")
    val b = firstSeen.select(col("doc_id"), col("lang"),
        row_number().over(wB).as("rk"))
      .filter(col("rk") <= 20)
      .as[(Long, String, Int)].collect().toSet

    assert(a == b)
  }

  test("weights are bounded: expansion is at most 8 rows per doc") {
    val d = graft.Tables.table(spark, sf0001, "documents")
    val w = d.select(expr("cast(1 + least(n_chars div 100, 7) as int)").as("w"))
    val Seq(mn, mx) = w.agg(min("w"), max("w")).collect()
      .head.toSeq.map(_.asInstanceOf[Int])
    assert(mn >= 1 && mx <= 8, s"weight range [$mn,$mx] outside [1,8]")
    // the fixture actually exercises weight VARIATION (not all-equal,
    // which would degenerate to uniform sampling)
    assert(w.distinct.count() > 1, "all weights equal - fixture degenerate")
  }
}
