package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over an embedding column — the
  * classic corpus-geometry diagnostic (what single direction explains
  * the most variance, and where does each document sit on it), and the
  * exact-integer cousin of a one-component PCA.
  *
  * Exactness: coordinates quantize to integer 1e-4 units; the mean,
  * the covariance entries, and every power-iteration step are integer
  * arithmetic (truncating division — Spark `div` and DuckDB `//` both
  * truncate toward zero, including on HUGEINT), so the fixed point is
  * bit-identical across engines and partitionings. The normalization
  * step's w·1e6 exceeds BIGINT, so that one multiply-divide runs in
  * DECIMAL(38) / HUGEINT and casts back (values ≤ 1e6 by construction:
  * v' = (w·1e6) div max|w|).
  *
  * Scale shape (the 100 TB design):
  *  - the mean vector is a 64-row aggregate collected into ONE 1-row
  *    array frame and broadcast — never a data-sized join;
  *  - the covariance outer product is generated SCAN-SIDE (two chained
  *    posexplodes under the (i, j) partial agg — the q_assoc_rules
  *    discipline), so the only data-sized cost is the map-side
  *    D²-per-partition combine; nothing shuffles by row id;
  *  - the D²-row covariance and every 64-row rank vector are eagerly
  *    checkpointed (driver-loop precedent: connectedComponents,
  *    Bpe.train, q_pagerank) so iteration plans stay flat;
  *  - projections are computed scan-side via a broadcast component
  *    array + zip_with/aggregate — zero exchanges.
  * Covariance entries are bounded by the coordinate range (≤ ~1.4e8
  * here), NOT by corpus size — the scatter is divided by n inside the
  * aggregate — so the matvec stays in BIGINT at any n. The per-(i,j)
  * scatter SUM itself holds in BIGINT to ~6e10 rows; beyond, promote
  * the product sum to DECIMAL(38) (the X51 pattern).
  */
object Pca {

  /** (id, cv) with cv the mean-centered integer 1e-4 coordinates. */
  private[graft] def centeredArrays(emb: DataFrame, idCol: String,
                                    vecCol: String): DataFrame = {
    val q = emb.select(col(idCol).as("id"),
      expr(s"transform(cast($vecCol as array<double>), " +
        "x -> cast(round(x * 10000) as bigint))").as("xq"))
    // 64-row per-dim truncating means, array-ified into ONE broadcast row
    val means = q.select(posexplode(col("xq")).as(Seq("p", "x")))
      .groupBy("p").agg(expr("sum(x) div count(1)").as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(p, m))), " +
        "s -> s.m)").as("marr"))
      .localCheckpoint(true)
    q.crossJoin(broadcast(means))
      .select(col("id"),
        zip_with(col("xq"), col("marr"), (x, m) => x - m).as("cv"))
  }

  /** Covariance table (i, j, cij), 1-based dims, scatter div n — the
    * outer product generated scan-side below the (i, j) partial agg.
    */
  private[graft] def covariance(emb: DataFrame, idCol: String,
                                vecCol: String): DataFrame = {
    val cent = centeredArrays(emb, idCol, vecCol)
    val e1 = cent.select(posexplode(col("cv")).as(Seq("pi", "ci")),
      col("cv"))
    val e2 = e1.select(col("pi"), col("ci"),
      posexplode(col("cv")).as(Seq("pj", "cj")))
    e2.groupBy("pi", "pj")
      .agg(expr("sum(ci * cj) div count(1)").as("cij"))
      .select((col("pi") + 1).as("i"), (col("pj") + 1).as("j"),
        col("cij"))
  }

  /** The dominant eigenvector after `rounds` integer power iterations,
    * as (i, v) with v in 1e-6 units of the max-magnitude coordinate
    * (the max attains exactly ±1000000 each round).
    */
  def component(emb: DataFrame, idCol: String, vecCol: String,
                rounds: Int = 5): DataFrame = {
    val cov = covariance(emb, idCol, vecCol).localCheckpoint(true)
    var v = cov.select(col("i")).distinct()
      .select(col("i"), lit(1000000L).as("v"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val w = cov
        .join(broadcast(v.select(col("i").as("j"), col("v").as("vj"))),
          "j")
        .groupBy("i").agg(sum(col("cij") * col("vj")).as("w"))
      val g = w.agg(max(abs(col("w"))).as("g"))
      v = w.crossJoin(broadcast(g)).filter(col("g") > 0)
        .select(col("i"),
          expr("cast((cast(w as decimal(38,0)) * 1000000) div g " +
            "as bigint)").as("v"))
        .localCheckpoint(true)
    }
    v
  }

  /** Per-row projection onto the dominant component: (id, proj) in
    * (1e-4 coordinate) × (1e-6 component) units — exact integer dot
    * products computed scan-side against the broadcast component.
    */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              rounds: Int = 5): DataFrame = {
    val varr = component(emb, idCol, vecCol, rounds)
      .agg(expr("transform(array_sort(collect_list(struct(i, v))), " +
        "s -> s.v)").as("varr"))
      .localCheckpoint(true)
    centeredArrays(emb, idCol, vecCol)
      .crossJoin(broadcast(varr))
      .select(col("id"),
        expr("aggregate(zip_with(cv, varr, (c, vv) -> c * vv), " +
          "cast(0 as bigint), (acc, x) -> acc + x)").as("proj"))
  }
}
