package graft.ops

import graft.SparkSpec

class HilbertSpec extends SparkSpec {

  test("xy2d is a bijection and consecutive indexes are grid-adjacent") {
    val order = 4
    val n = 1 << order
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (Hilbert.xy2d(order, x, y), (x, y))
    val byD = cells.sortBy(_._1)
    // bijection: every index in [0, n²) exactly once
    assert(byD.map(_._1) == (0 until n * n).map(_.toLong))
    // THE Hilbert locality law (what z-order does NOT have): walking
    // the curve moves exactly one grid step at a time
    byD.sliding(2).foreach {
      case Seq((_, (x1, y1)), (_, (x2, y2))) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"non-adjacent step between ($x1,$y1) and ($x2,$y2)")
      case _ =>
    }
  }

  test("withIndex column chain matches plain-Scala xy2d at order 8") {
    import spark.implicits._
    val pairs = (for (x <- 0L until 256L by 17; y <- 0L until 256L by 13)
      yield (x, y)) ++ Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L))
    val got = Hilbert
      .withIndex(pairs.toDF("zx", "zy"), "zx", "zy", "hkey")
      .collect()
    assert(got.length == pairs.length)
    got.foreach { r =>
      val (x, y) = (r.getAs[Long]("zx"), r.getAs[Long]("zy"))
      assert(r.getAs[Long]("hkey") == Hilbert.xy2d(8, x, y),
        s"mismatch at ($x,$y)")
    }
  }

  test("curve segments carry tighter boxes than the same-size z-order") {
    // the reason this operator exists: real file splits are
    // byte-targeted, never power-of-4 aligned (on aligned splits both
    // curves tile perfect quads and draw equal) — on UNALIGNED segment
    // sizes the z-curve's diagonal jumps blow up the per-file bounding
    // box while Hilbert's unit steps keep it tight (measured on the
    // order-4 grid: 327 vs 599 summed box area at 5 cells/segment)
    val order = 4
    val n = 1 << order
    def area(cells: Seq[(Int, Int)]): Long = {
      val xs = cells.map(_._1); val ys = cells.map(_._2)
      (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
    }
    def total(key: (Int, Int) => Long, seg: Int): Long =
      (for (x <- 0 until n; y <- 0 until n) yield (key(x, y), (x, y)))
        .sortBy(_._1).map(_._2).grouped(seg).map(area).sum
    def morton(x: Int, y: Int): Long =
      (0 until order).map(i =>
        (((x >> i) & 1).toLong << (2 * i)) +
          (((y >> i) & 1).toLong << (2 * i + 1))).sum
    Seq(5, 6, 10, 12, 24).foreach { seg =>
      assert(total(Hilbert.xy2d(order, _, _), seg) < total(morton, seg),
        s"Hilbert should bound tighter at $seg cells/segment")
    }
  }
}
