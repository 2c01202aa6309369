package graft.ops

import graft.SparkSpec

/** P1/P2 edge cases (SURVEY §5.2.2): null, whitespace-only, 1-char,
  * unicode, mixed case.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("filter + normalize edge cases") {
    val in = Seq(null, "", "  ", "a", " A ", "  How TO  ", "ÜBER ad",
      "ok").toDF("value")
    val out = Normalize(in, "value").as[String].collect().toSeq.sorted
    // null/empty/whitespace/1-char dropped; rest trimmed+lowercased
    assert(out == Seq("how to", "ok", "über ad").sorted)
  }

  test("normalization is idempotent") {
    val in = Seq("  MiXeD Case  ", "już done").toDF("value")
    val once = Normalize(in, "value")
    val twice = Normalize(once, "query", "query")
    assert(once.as[String].collect().sorted
      sameElements twice.as[String].collect().sorted)
  }
}
