package graft.ops

import graft.SparkSpec

/** L97: the peel's semantics on hand-audited shapes plus the two
  * properties the fixed-round oracle form leans on — monotone shrink
  * and idempotence at the fixpoint (extra rounds change nothing).
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
                   rounds: Int): Map[Long, Long] =
    KCore.peel(edges.toDF("a", "b"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("a path sheds its ends; a cycle is its own 2-core") {
    // path 1-2-3-4 (peels to nothing at k=2) + cycle 10-11-12-10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    assert(core(edges, 2, 4) ==
      Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
  }

  test("a bridge between two triangles survives at k=2, dies at k=3") {
    // two triangles joined by one bridge edge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val c2 = core(edges, 2, 4)
    assert(c2.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // the bridge endpoints carry their bridge degree inside the core
    assert(c2(3L) == 3L && c2(1L) == 2L)
    assert(core(edges, 3, 4).isEmpty, "no 3-core in two bridged triangles")
  }

  test("deep peel chain: each round removes one layer, then fixpoint") {
    // chain of hanging nodes feeding a triangle: 7-6, 6-5, 5-1 onto
    // triangle 1-2-3 — each round strips exactly one chain node, so
    // the peel DEPTH is 3 and under-provisioned rounds stop early
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (5L, 1L), (6L, 5L), (7L, 6L))
    assert(core(edges, 2, 1).keySet == Set(1L, 2L, 3L, 5L, 6L),
      "round 1 strips only the outermost node")
    assert(core(edges, 2, 3).keySet == Set(1L, 2L, 3L))
    // idempotence at the fixpoint: spare rounds change nothing
    assert(core(edges, 2, 3) == core(edges, 2, 8))
  }

  test("empty input yields an empty core") {
    assert(core(Seq.empty, 2, 4).isEmpty)
  }

  test("peelAudited certifies the fixpoint at the gate parameterization") {
    // the deep-chain fixture (peel depth 3): at the gate's spare-round
    // style provisioning the last two alive counts are EQUAL — the
    // monotone-shrink fixpoint certificate (r14 verdict #6) — and an
    // under-provisioned run is visibly still shrinking, never silent.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (5L, 1L), (6L, 5L), (7L, 6L)).toDF("a", "b")
    val full = KCore.peelAudited(edges, k = 2, rounds = 5)
    assert(full.aliveCounts == Seq(6L, 5L, 4L, 3L, 3L, 3L))
    assert(full.atFixpoint)
    val starved = KCore.peelAudited(edges, k = 2, rounds = 2)
    assert(!starved.atFixpoint, "a still-shrinking peel must not certify")
    // rounds = 0 has nothing to certify
    assert(!KCore.peelAudited(edges, k = 2, rounds = 0).atFixpoint)
  }

  test("invalid arguments fail fast") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] { KCore.peel(edges, 0, 4) }
    intercept[IllegalArgumentException] { KCore.peel(edges, 2, -1) }
  }
}
