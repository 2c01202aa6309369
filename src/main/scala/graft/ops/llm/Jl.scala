package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: the DATA-FREE dimensionality
  * reduction to complement PCA's data-driven one (Pca.scala). The
  * projection matrix is ±1 signs derived from an integer hash of
  * (input dim, output dim) — no training pass, no broadcast state, no
  * randomness object — so the whole reduction is a stateless scan-side
  * projection: at 100 TB it runs at read speed with ZERO shuffles and
  * nothing to fit, persist, or version (Achlioptas 2003's
  * database-friendly ±1 construction).
  *
  * Exactness: coordinates quantize to integer 1e-4 units (the Pca.xq
  * discipline) and every projected value is an integer sum of ±x terms,
  * so the output is bit-identical across engines and partitionings —
  * fully hash-certifiable, unlike float matrix multiplies. The sign is
  * a murmur-style 32-bit mix of (i, j) — two odd-constant multiplies
  * with an xorshift between, masked to 32 bits so no intermediate
  * exceeds ~2^62 (DuckDB's BIGINT does not wrap; a one-multiply LCG's
  * low-bit structure measurably skewed pairwise distances, caught by
  * JlSpec's distance-preservation test). The resulting 64×16 matrix
  * holds per-pair distortion within [0.3, 2.5] on the spec fixture —
  * the textbook JL band for k=16.
  */
object Jl {

  /** (vec_id, j, proj): the `outDims` integer projections of each
    * embedding, one row per output dimension.
    */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
                       outDims: Int): DataFrame = {
    val q = emb.select(col(idCol).as("vec_id"),
      expr(s"transform(cast($vecCol as array<double>), " +
        "x -> cast(round(x * 10000) as bigint))").as("xq"))
    val projs = (0 until outDims).map { j =>
      val z0 = s"((i * 2654435761 + $j * 2245822519) % 4294967296)"
      val z1 = s"((($z0 ^ shiftright($z0, 15)) * 626627473) % 4294967296)"
      expr("aggregate(transform(xq, (x, i) -> x * " +
        s"(1 - 2 * (shiftright($z1, 12) % 2))), " +
        "0L, (acc, v) -> acc + v)").as(s"p$j")
    }
    q.select(col("vec_id") +: projs: _*)
      .select(col("vec_id"),
        posexplode(array((0 until outDims).map(j => col(s"p$j")): _*))
          .as(Seq("j", "proj")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("proj"))
  }
}
