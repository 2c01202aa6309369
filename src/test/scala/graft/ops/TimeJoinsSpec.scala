package graft.ops

import graft.SparkSpec

/** As-of and binned range joins: hand-computable fixtures covering the
  * boundary semantics (at-timestamp match, no-match nulls, range
  * inclusivity, bin-boundary pairs).
  */
class TimeJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asof: latest right row at-or-before each left row") {
    val clicks = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("user", "ts", "click_id")
    val views = Seq((1L, 100L, 20L), (1L, 40L, 21L), (1L, 90L, 22L))
      .toDF("user", "ts", "view_id")
    val out = TimeJoins.asof(clicks, views, "user", "ts",
        "click_id", "view_id")
      .select("click_id", "view_id", "gap")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(out == Set(
      (10L, Some(20L), Some(0L)),  // view AT the click ts matches (>=)
      (11L, Some(21L), Some(10L)), // latest earlier view
      (12L, None, None)))          // user 2 has no views
  }

  test("rangeBinned finds exactly the in-range pairs across bin borders") {
    // range=10: pairs must be found even when they straddle a bin edge
    val e = Seq((1L, 9L, 1L), (1L, 11L, 2L), (1L, 19L, 3L), (1L, 40L, 4L),
        (2L, 12L, 5L))
      .toDF("user", "ts", "id")
    val out = TimeJoins.rangeBinned(e, e, "user", "ts", "id", range = 10L)
      .select("idA", "idB", "gap").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 2L), (1L, 3L, 10L), (2L, 3L, 8L)))
  }
}
