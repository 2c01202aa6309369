package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time joins Spark lacks as primitives — as-of and bounded range — built
  * from shuffle-friendly shapes (SURVEY §2.3 gap; the custom-operator
  * preference order says compose existing ops first, and both compose).
  */
object TimeJoins {

  /** As-of join: for each left row, the single right row with the largest
    * `ts <= left.ts` for the same key (nullable when none). Implemented
    * as the union/last-over-window trick: one shuffle + one sort on
    * (key, ts) total, NO per-row probe or non-equi join — the shape that
    * scales to dense tick data.
    *
    * Right rows are deduplicated to one per (key, ts) (max `rightId`
    * wins) so ties are unambiguous — DuckDB's ASOF picks an arbitrary
    * row among equal timestamps otherwise.
    *
    * Inputs: `left`(key, ts, leftId), `right`(key, ts, rightId); ts must
    * be an integer column. Output: (leftId, key, ts, matched rightId,
    * gap = ts - right.ts; null gap when unmatched).
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           leftId: String, rightId: String): DataFrame = {
    val r = right.groupBy(col(key), col(ts))
      .agg(max(col(rightId)).as("_rid"))
      .select(col(key), col(ts), col("_rid").as("_rid"),
        col(ts).as("_rts"), lit(0).as("_side"), lit(null).cast("long").as("_lid"))
    val l = left.select(col(key), col(ts),
      lit(null).cast(r.schema("_rid").dataType).as("_rid"),
      lit(null).cast("long").as("_rts"), lit(1).as("_side"),
      col(leftId).cast("long").as("_lid"))
    // order: at equal ts the right row sorts first (side 0), so a right
    // row AT the left row's timestamp matches (>= semantics).
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_lid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_match", last(col("_rid"), ignoreNulls = true).over(w))
      .withColumn("_mts", last(col("_rts"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_lid").as(leftId), col(key), col(ts),
        col("_match").as(rightId),
        (col(ts) - col("_mts")).as("gap"))
  }

  /** As-of join with a staleness tolerance: like [[asof]], but a match
    * older than `tolerance` is NULLed out instead of silently used — the
    * market-data rule that a quote more than N seconds stale must not
    * price a trade. Every left row still appears (left semantics); only
    * the match and its gap are withheld. Same single-shuffle union+window
    * plan as asof; the tolerance is a post-window scalar predicate.
    */
  def asofTolerance(left: DataFrame, right: DataFrame, key: String,
                    ts: String, leftId: String, rightId: String,
                    tolerance: Long): DataFrame = {
    val base = asof(left, right, key, ts, leftId, rightId)
    val fresh = col("gap").isNotNull && col("gap") <= tolerance
    base
      .withColumn(rightId, when(fresh, col(rightId)))
      .withColumn("gap", when(fresh, col("gap")))
  }

  /** Bounded range self/two-table join: pairs (a, b) with the same key and
    * `0 < b.ts - a.ts <= range`. Implemented as a BIN join: each left row
    * is emitted into its own time bin and the next (bin width = range),
    * the join is pure equi on (key, bin), and the exact range predicate
    * filters inside the bucket — candidate volume is O(rows per 2 bins),
    * never a per-key cross product.
    *
    * Inputs: (key, ts integer, id). Output: (key, idA, idB, gap).
    */
  def rangeBinned(left: DataFrame, right: DataFrame, key: String,
                  ts: String, id: String, range: Long): DataFrame = {
    // integer `div`, not `/`: double division can round up across the bin
    // boundary at µs magnitudes
    val bin: Column = expr(s"$ts div ${range}L")
    val l = left.select(col(key).as("_k"), col(ts).as("_ta"),
        col(id).as("idA"),
        explode(array(bin, bin + 1)).as("_bin"))
    val r = right.select(col(key).as("_k2"), col(ts).as("_tb"),
      col(id).as("idB"), bin.as("_bin2"))
    l.join(r, col("_k") === col("_k2") && col("_bin") === col("_bin2") &&
        col("_tb") > col("_ta") && col("_tb") - col("_ta") <= range)
      .select(col("_k").as(key), col("idA"), col("idB"),
        (col("_tb") - col("_ta")).as("gap"))
  }
}
