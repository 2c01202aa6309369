package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Decontamination: the bloom-prefiltered path must return exactly the
  * broadcast-join result (false positives die in the exact verify), and
  * the graft-registered bloom SQL functions must behave like a bloom
  * filter (no false negatives, bounded false positives).
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.table(spark, sf0001, "documents")

  test("viaBloom equals viaJoin on the real corpus") {
    val train = docs.filter(col("doc_id") >= 5)
    val probes = docs.filter(col("doc_id") < 5)
    val exact = Decontaminate.viaJoin(train, probes, "doc_id", "text", 3)
      .as[Long].collect().toSet
    val bloom = Decontaminate.viaBloom(train, probes, "doc_id", "text", 3,
        estItems = 10000L, numBits = 80000L)
      .as[Long].collect().toSet
    assert(exact.nonEmpty)
    assert(bloom == exact,
      s"diff=${(bloom diff exact) ++ (exact diff bloom)}")
  }

  test("graft bloom SQL functions: no false negatives, bounded FPs") {
    val hits = spark.sql(
      """SELECT sum(CASE WHEN graft_might_contain(
        |    (SELECT graft_bloom_agg(xxhash64(id), 1000L, 8000L)
        |     FROM range(1000)),
        |    xxhash64(t.id)) THEN 1 ELSE 0 END) hits
        |FROM range(10000) t(id)""".stripMargin)
      .as[Long].head()
    assert(hits >= 1000L, s"bloom lost members: $hits")   // no false negatives
    assert(hits <= 2000L, s"FP rate too high: $hits")     // ~2% expected at 8 bits/item
  }
}
