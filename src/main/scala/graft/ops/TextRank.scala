package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank over an undirected term co-occurrence graph
  * (TextRank, the classic graph keyword extractor) with bit-deterministic
  * integer arithmetic: ranks live in micro units, a node's per-edge
  * contribution is `(rank·w) div wdeg` (floor division on longs, same on
  * every engine), and the damping step is `150000 + (85·Σ) div 100` —
  * long sums are order-independent, so a fixed iteration count yields a
  * hash-comparable result no matter how the graph is partitioned.
  *
  * Scale shape (the Pregel decomposition): one message round is ONE
  * equi-join of the edge list to the current ranks on the source key plus
  * ONE partial-agg'd groupBy on the destination key — never a driver-side
  * loop over rows, never a nested-loop join. The edge list (with degree)
  * is checkpointed once before the loop and re-joined per round, and each
  * round's ranks are checkpointed so round N+1's plan does not replay
  * rounds 1..N (the connected-components discipline from ops/llm/Dedup).
  */
object TextRank {

  /** Undirected weighted edge list `(u, v, w)` from a directed
    * co-occurrence pair stream `(x, y)`: self-loops dropped, direction
    * folded by (least, greatest), combined weight thresholded at `minW`
    * to bound the graph, then both directions emitted for the symmetric
    * message flow.
    */
  def edges(pairs: DataFrame, minW: Long): DataFrame = {
    val und = pairs.filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minW)
    und.union(und.select(col("v"), col("u"), col("w"))).toDF("u", "v", "w")
  }

  /** Edge list annotated with the source node's weighted degree — the
    * loop-invariant side of every round (checkpoint it once).
    */
  def withDegree(edges: DataFrame): DataFrame =
    edges.join(edges.groupBy("u").agg(sum("w").as("wdeg")), "u")

  /** Initial ranks: 1.0 (one million micro) per node. */
  def init(ed: DataFrame): DataFrame =
    ed.select(col("u").as("term")).distinct()
      .select(col("term"), lit(1000000L).as("rank"))

  /** One Pregel message round: propagate `(rank·w) div wdeg` along every
    * edge, sum per destination, damp. Equi-join + partial-agg'd groupBy.
    */
  def round(ed: DataFrame, ranks: DataFrame): DataFrame =
    ed.join(ranks, ed("u") === ranks("term"))
      .groupBy(ed("v"))
      .agg((lit(150000L) +
        expr("85 * sum((rank * w) div wdeg) div 100")).as("rank"))
      .select(col("v").as("term"), col("rank"))

  /** Fixed-iteration rank loop over a degree-annotated edge list. */
  def run(ed: DataFrame, iters: Int): DataFrame = {
    // eager checkpoint: lazy + multi-branch consumers can deadlock Spark (see ops/llm/Dedup.scala "EAGER CHECKPOINT DISCIPLINE")
    val pinned = ed.localCheckpoint(true)
    var ranks = init(pinned)
    for (_ <- 1 to iters)
      ranks = round(pinned, ranks).localCheckpoint(true)
    ranks
  }
}
