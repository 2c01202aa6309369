package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** L95: the Borůvka forest's structural invariants and the
  * MST/single-linkage equivalence the q_single_linkage oracle relies on,
  * checked against brute-force Kruskal and union-find on fixtures a human
  * can audit plus a deterministic pseudo-random graph large enough to
  * exercise multi-round contraction.
  */
class MstSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random weighted graph: `n` nodes, edges from a
    * splitmix-ish integer mix — no RNG object, so the fixture is
    * identical on every run and partitioning.
    */
  private def randomGraph(n: Int, m: Int): Seq[(Long, Long, Long)] =
    (0 until m).flatMap { i =>
      val h = {
        var z = i.toLong * 0x9e3779b97f4a7c15L + 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      }
      val a = math.floorMod(h, n.toLong)
      val b = math.floorMod(h >>> 17, n.toLong)
      val w = math.floorMod(h >>> 39, 1000L)
      if (a == b) Nil
      else Seq((math.min(a, b), math.max(a, b), w))
    }.distinct
      // one row per undirected edge: min weight wins (mirrors how a
      // caller would canonicalize a multigraph)
      .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq

  /** Union-find component labels (min node id per component) over the
    * edges with w <= t.
    */
  private def ufLabels(edges: Seq[(Long, Long, Long)],
                       t: Long): Map[Long, Long] = {
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r }
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.foreach(n => par.getOrElseUpdate(n, n))
    edges.filter(_._3 <= t).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.groupBy(find).flatMap { case (_, ms) =>
      val m = ms.min; ms.map(_ -> m)
    }
  }

  /** Brute-force Kruskal total forest weight (the MST optimum — unique
    * as a value even when the forest is not).
    */
  private def kruskalWeight(edges: Seq[(Long, Long, Long)]): Long = {
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = par.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); par(x) = r; r }
    }
    edges.sortBy(e => (e._3, e._1, e._2)).foldLeft(0L) {
      case (acc, (a, b, w)) =>
        val (ra, rb) = (find(a), find(b))
        if (ra == rb) acc else { par(ra) = rb; acc + w }
    }
  }

  test("boruvka on a hand-audited graph: the textbook forest") {
    // 0-1:1  1-2:2  0-2:9  2-3:5  4-5:3 (two components)
    val e = Seq((0L, 1L, 1L), (1L, 2L, 2L), (0L, 2L, 9L), (2L, 3L, 5L),
      (4L, 5L, 3L)).toDF("a", "b", "w")
    val f = Mst.boruvka(e).as[(Long, Long, Long)].collect().toSet
    assert(f == Set((0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 5L),
      (4L, 5L, 3L)))
  }

  test("forest invariants + Kruskal weight parity on a random graph") {
    val edges = randomGraph(200, 600)
    val f = Mst.boruvka(edges.toDF("a", "b", "w"))
      .as[(Long, Long, Long)].collect().toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = ufLabels(edges, Long.MaxValue).values.toSet
    // a spanning forest has exactly V − C edges and no duplicates
    assert(f.size == nodes.size - comps.size,
      s"forest must have V-C edges: ${f.size} vs ${nodes.size}-${comps.size}")
    assert(f.distinct.size == f.size, "forest emitted a duplicate edge")
    assert(f.toSet.subsetOf(edges.toSet), "forest edge not in the input")
    // optimal total weight (unique even when the forest is not)
    assert(f.map(_._3).sum == kruskalWeight(edges),
      "forest weight differs from Kruskal's optimum")
    // and it spans: at cut=∞ the forest yields the graph's components
    assert(ufLabels(f, Long.MaxValue) == ufLabels(edges, Long.MaxValue),
      "forest does not span the graph's components")
  }

  test("single-linkage cuts equal direct thresholded-graph components") {
    val edges = randomGraph(120, 260)
    val cuts = Seq(100L, 400L, 800L)
    val got = Mst.singleLinkage(edges.toDF("a", "b", "w"), cuts)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (c, rs) => c -> rs.map(r => r._2 -> r._3).toMap }
    cuts.foreach { t =>
      assert(got(t) == ufLabels(edges, t),
        s"cut $t: MST components differ from the direct definition")
    }
  }

  test("empty input yields an empty forest and empty cuts") {
    val e = Seq.empty[(Long, Long, Long)].toDF("a", "b", "w")
    assert(Mst.boruvka(e).count() == 0L)
    assert(Mst.singleLinkage(e, Seq(10L)).count() == 0L)
  }

  test("an empty cut list fails fast with a descriptive message") {
    val e = Seq((1L, 2L, 3L)).toDF("a", "b", "w")
    val ex = intercept[IllegalArgumentException] {
      Mst.singleLinkage(e, Seq.empty)
    }
    assert(ex.getMessage.contains("at least one cut"))
  }

  test("boruvka on a weight-monotone chain (the contraction worst case)") {
    // edge i-(i+1) with strictly increasing weights: round 1 pairs up
    // neighbors and the picked-edge contraction graph is itself a long
    // PATH — the shape the r14 ADVICE flagged as the silent-label risk.
    // The whole chain IS the MST, so any dropped/duplicated forest row
    // shows immediately; strict CC now guarantees loud-or-right.
    val n = 257L
    val chain = (1L until n).map(i => (i, i + 1, i)).toDF("a", "b", "w")
    val f = Mst.boruvka(chain).as[(Long, Long, Long)].collect()
    assert(f.length == (n - 1).toInt, "chain forest must keep every edge")
    assert(f.distinct.length == f.length, "duplicate forest row")
  }
}
