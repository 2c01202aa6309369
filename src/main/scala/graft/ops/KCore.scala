package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling: the cohesion view of a graph — the maximal subgraph
  * in which every node keeps at least k neighbors. In the dedup pair
  * graph the 2-core separates true duplicate CLUSTERS (mutually
  * supported by several near-dup edges) from incidental one-edge
  * bridges; it completes the graph-analytics family next to CC,
  * PageRank, HITS, label propagation, triangles, and the MST.
  *
  * Execution shape: each round is one (edges ⋈ alive ⋈ alive) keyed
  * degree aggregate + a filter — all equi-joins on node ids, no
  * windows, no driver-side state. The round count is FIXED (a
  * constructor argument, not a convergence probe) so the DuckDB oracle
  * can unroll the identical recurrence as CTE rounds; peeling is
  * monotone (alive sets only shrink) and idempotent at the fixpoint,
  * so any rounds ≥ the peel depth gives the true k-core — KCoreSpec
  * pins the idempotence and the gate query carries 2 spare rounds over
  * the observed depth.
  */
object KCore {

  /** Nodes of the k-core after exactly `rounds` peel rounds, with their
    * within-core degree.
    *
    * @param pairs undirected edges (a, b), one row per edge
    * @return (node, deg_core)
    */
  def peel(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val p = pairs.select(col("a"), col("b")).localCheckpoint(true)
    val edges = p
      .union(p.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var alive = edges.select(col("a").as("node")).distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      alive = edges
        .join(alive.select(col("node").as("a")), "a")
        .join(alive.select(col("node").as("b")), "b")
        .groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("node")
        .localCheckpoint(true)
    }
    edges.join(alive.select(col("node").as("a")), "a")
      .join(alive.select(col("node").as("b")), "b")
      .groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg_core"))
  }
}
