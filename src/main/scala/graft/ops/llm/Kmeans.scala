package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-integer Lloyd k-means over an embedding column — the
  * clustering kernel behind IVF cell builds (ops/llm/Ivf.scala ships
  * the one-round "k-means-lite" variant as a rows-only query; this is
  * the full, ORACLE-EXACT iteration).
  *
  * Exactness: coordinates quantize to integer 1e-4 units; distances
  * are exact BIGINT squared Euclidean sums; the per-dimension centroid
  * update is a truncating integer mean (Spark `div` = DuckDB `//`);
  * argmin ties break on the lower centroid id via lexicographic
  * (dist, cid) struct ordering — so the whole R-round fixed point is
  * bit-identical across engines and partitionings, and the DuckDB
  * oracle unrolls the same recurrence as CTE rounds (the q_pagerank /
  * q_pca_power discipline). Initialization is deterministic: the k
  * lowest-id vectors seed the centroids (production would use k-means‖
  * sampling; the ITERATION is the kernel under test).
  *
  * Scale shape (the 100 TB design):
  *  - the quantized corpus is checkpointed ONCE and every round reads
  *    it from memory (Lloyd's is scan-bound by design);
  *  - the k centroids travel as ONE 1-row broadcast array, and the
  *    assignment argmin is computed SCAN-SIDE via
  *    array_min(transform(...)) — a pure projection, zero exchanges
  *    (no n×k join, no id-keyed shuffle — the q_nb_classify argmin
  *    discipline taken one step further);
  *  - the centroid update shuffles only (cid, dim) partial sums —
  *    k·D rows per partition regardless of corpus size;
  *  - empty clusters deterministically keep their previous centroid.
  * Distances hold in BIGINT at any n (bounded by D·range²); the
  * per-(cid, dim) update sums hold to ~4.6e14 rows per cluster.
  */
object Kmeans {

  /** Final assignment after `rounds` Lloyd iterations:
    * (id, cid, dist2) with dist2 the exact integer squared distance
    * to the winning centroid in 1e-4-unit coordinates.
    */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
          k: Int = 8, rounds: Int = 3): DataFrame = {
    val q = emb.select(col(idCol).as("id"),
        expr(s"transform(cast($vecCol as array<double>), " +
          "x -> cast(round(x * 10000) as bigint))").as("xq"))
      .localCheckpoint(true) // consumed by every round
    var cent = q.filter(col("id") < k)
      .select(col("id").as("cid"), col("xq").as("carr"))
      .localCheckpoint(true)
    def assign(c: DataFrame): DataFrame = {
      val centsRow = c
        .agg(expr("array_sort(collect_list(struct(cid, carr)))")
          .as("cents"))
        .localCheckpoint(true) // 1 row, broadcast below
      q.crossJoin(broadcast(centsRow))
        .withColumn("best", expr(
          "array_min(transform(cents, cc -> named_struct(" +
            "'d', aggregate(zip_with(xq, cc.carr, " +
            "(x, c) -> (x - c) * (x - c)), cast(0 as bigint), " +
            "(acc, y) -> acc + y), " +
            "'cid', cc.cid)))"))
        .select(col("id"), col("xq"),
          col("best.cid").as("cid"), col("best.d").as("d"))
    }
    for (_ <- 1 to rounds) {
      val upd = assign(cent)
        .select(col("cid"), posexplode(col("xq")).as(Seq("p", "x")))
        .groupBy("cid", "p")
        .agg(expr("sum(x) div count(1)").as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(p, m))), " +
          "s -> s.m)").as("narr"))
      cent = cent.join(upd, Seq("cid"), "left")
        .select(col("cid"),
          coalesce(col("narr"), col("carr")).as("carr"))
        .localCheckpoint(true)
    }
    assign(cent).select(col("id"), col("cid"), col("d").as("dist2"))
  }
}
