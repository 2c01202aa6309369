package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** L96: the property the JL projection exists for — pairwise squared
  * distances survive the 64 → 16 reduction in expectation — plus the
  * exactness contract (integer output, partitioning-invariant). The
  * distance check is the textbook identity: with ±1 sign entries,
  * E[||P(u−v)||²] = outDims · ||u−v||², so the per-pair ratio
  * ||Pu−Pv||² / (16·||u_q−v_q||²) concentrates around 1.
  */
class JlSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random 64-dim vectors (no RNG object)
  private def vecs(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { v =>
      val arr = Array.tabulate(64) { i =>
        var z = (v.toLong * 64 + i) * 0x9e3779b97f4a7c15L + 0x2545f4914f6cdd1dL
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        // in [-1, 1), 4 decimal places so the 1e-4 quantization is exact
        math.floorMod(z >>> 17, 20000L).toFloat / 10000f - 1f
      }
      (v.toLong, arr)
    }

  test("pairwise squared distances are preserved in expectation") {
    val data = vecs(20)
    val df = data.toDF("vec_id", "embedding")
    val proj = Jl.randomProjection(df, "vec_id", "embedding", 16)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(_._3)
      }
    val quant = data.map { case (id, a) =>
      id -> a.map(x => math.round(x.toDouble * 10000))
    }.toMap
    val ratios = for {
      (a, pa) <- proj.toSeq; (b, pb) <- proj.toSeq if a < b
    } yield {
      val dProj = pa.zip(pb).map { case (x, y) =>
        val d = x - y; d.toDouble * d
      }.sum
      val dOrig = quant(a).zip(quant(b)).map { case (x, y) =>
        val d = x - y; d.toDouble * d
      }.sum
      dProj / (16.0 * dOrig)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2,
      s"mean distance ratio $mean drifted from 1 — the sign matrix " +
        "lost its JL property")
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"a pair's distortion left the plausible band: " +
        s"${ratios.filterNot(r => r > 0.2 && r < 3.0)}")
  }

  test("projection is exact-integer and partitioning-invariant") {
    val df = vecs(12).toDF("vec_id", "embedding")
    val a = Jl.randomProjection(df.repartition(7), "vec_id",
      "embedding", 16).collect().map(_.toString).sorted
    val b = Jl.randomProjection(df.repartition(3), "vec_id",
      "embedding", 16).collect().map(_.toString).sorted
    assert(a.sameElements(b), "projection varied with partitioning")
    assert(a.length == 12 * 16)
  }
}
