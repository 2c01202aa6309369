package graft.ops

import graft.SparkSpec

/** 2-D Pareto skyline: exact dominance semantics on constructed points,
  * including the tie and duplicate cases the frontier shape must get
  * right, plus brute-force parity on random data.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Skyline(pts.toDF("id", "x", "y")).as[(Long, Long, Long)].collect().toSet

  test("keeps the frontier, drops dominated and same-x lower-y points") {
    val got = run(Seq(
      (1L, 10L, 1L),  // survives: nothing has x >= 10 with better y
      (2L, 5L, 5L),   // dominated by 7 (same x, strictly higher y)
      (3L, 1L, 9L),   // dominated by 7 (same y, strictly higher x)
      (4L, 4L, 4L),   // dominated by 7 on both axes
      (5L, 5L, 3L),   // same x as 7, lower y -> dominated
      (6L, 1L, 9L),   // duplicate of 3 -> dominated by 7 the same way
      (7L, 5L, 9L)))  // survives
    assert(got == Set((1L, 10L, 1L), (7L, 5L, 9L)))
  }

  test("exact duplicates of a frontier point are all kept") {
    val got = run(Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 2L, 2L)))
    assert(got == Set((1L, 5L, 5L), (2L, 5L, 5L)))
  }

  test("same y at strictly greater x dominates") {
    val got = run(Seq((1L, 3L, 7L), (2L, 5L, 7L)))
    assert(got == Set((2L, 5L, 7L)))
  }

  test("brute-force parity on pseudo-random points") {
    val pts = (0 until 400).map { i =>
      val h = i * 2654435761L
      (i.toLong, math.abs(h % 37), math.abs((h / 37) % 41))
    }
    def dominated(p: (Long, Long, Long)) = pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val expected = pts.filterNot(dominated).toSet
    assert(run(pts) == expected)
    assert(expected.nonEmpty)
  }
}
