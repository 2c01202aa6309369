package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Constraint checker semantics, with the NULL decisions pinned:
  * predicate NULL = violation, NULL keys group as duplicates, NULL
  * foreign keys are skipped. Counts only, never row dumps.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def result(df: org.apache.spark.sql.DataFrame)
      : Map[String, Long] =
    df.as[(String, Long)].collect().toMap

  test("check: one scan, per-rule counts, NULL predicate violates") {
    val df = Seq[(java.lang.Long, String)](
      (10L, "en"), (300L, "de"), (null, "en"), (50L, null))
      .toDF("n", "lang")
    val r = result(Constraints.check(df, Seq(
      "n_le_200" -> Constraints.fails(col("n") <= 200),
      "lang_allowed" -> Constraints.fails(col("lang").isin("en")),
      "n_not_null" -> col("n").isNull)))
    // n_le_200: 300 fails, NULL fails (NULL predicate = violation)
    assert(r == Map(
      "n_le_200" -> 2L, "lang_allowed" -> 2L, "n_not_null" -> 1L))
  }

  test("check: zero violations and empty input both report 0, not null") {
    val ok = Seq((1L, "en")).toDF("n", "lang")
    assert(result(Constraints.check(ok,
      Seq("clean" -> Constraints.fails(col("n") > 0)))) ==
      Map("clean" -> 0L))
    val empty = Seq.empty[(Long, String)].toDF("n", "lang")
    assert(result(Constraints.check(empty,
      Seq("clean" -> Constraints.fails(col("n") > 0)))) ==
      Map("clean" -> 0L))
  }

  test("unique: excess rows per key; NULL keys group together") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (1L, "b"), (1L, "c"),   // 2 excess
      (2L, "d"),                          // unique
      (null, "e"), (null, "f")            // NULL key: 1 excess
    ).toDF("k", "v")
    assert(result(Constraints.unique(df, "k_unique", Seq("k"))) ==
      Map("k_unique" -> 3L))
    // all-unique and empty both report 0
    assert(result(Constraints.unique(df.filter(col("k") === 2),
      "u", Seq("k"))) == Map("u" -> 0L))
  }

  test("orphans: unmatched non-NULL FKs only") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "ok"), (9L, "orphan"), (null, "skipped"), (9L, "orphan2"))
      .toDF("fk", "x")
    val parent = Seq(1L, 2L).toDF("pk")
    assert(result(Constraints.orphans(child, "fk", parent, "pk",
      "fk_ok")) == Map("fk_ok" -> 2L))
  }

  test("tag/quarantine: reason list in rule order; split partitions input") {
    val df = Seq[(Long, java.lang.Long, String)](
      (1L, 100L, "en"),   // clean
      (2L, 300L, "en"),   // n_le_200
      (3L, 300L, "de"),   // both — order must be rule order
      (4L, null, "xx")    // both (NULL fails the range rule)
    ).toDF("id", "n", "lang")
    val rules = Seq(
      "n_le_200" -> Constraints.fails(col("n") <= 200),
      "lang_allowed" -> Constraints.fails(col("lang").isin("en")))
    val (clean, bad) = Constraints.quarantine(df, rules)
    assert(clean.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(!clean.columns.contains("violations"))
    val reasons = bad.select(col("id"),
        array_join(col("violations"), ",")).as[(Long, String)]
      .collect().toMap
    assert(reasons == Map(
      2L -> "n_le_200",
      3L -> "n_le_200,lang_allowed",
      4L -> "n_le_200,lang_allowed"))
    // split is a partition: no row lost, none in both
    assert(clean.count() + bad.count() == df.count())
  }

  test("tag is stateless: identical on a streaming source") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    mem.addData((1L, 100L, "en"), (2L, 300L, "de"))
    val rules = Seq(
      "n_le_200" -> Constraints.fails(col("n") <= 200),
      "lang_allowed" -> Constraints.fails(col("lang").isin("en")))
    val tagged = Constraints.tag(
      mem.toDF.toDF("id", "n", "lang"), rules)
      .select(col("id"), array_join(col("violations"), ",").as("v"))
    val q = tagged.writeStream.format("memory")
      .queryName("constraints_stream").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("constraints_stream")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "", 2L -> "n_le_200,lang_allowed"))
  }

  test("all: rule families union into one (rule, violations) report") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = result(Constraints.all(Seq(
      Constraints.unique(docs, "doc_id_unique", Seq("doc_id")),
      Constraints.check(docs, Seq(
        "text_not_null" -> col("text").isNull)))))
    assert(r == Map("doc_id_unique" -> 0L, "text_not_null" -> 0L))
  }
}
