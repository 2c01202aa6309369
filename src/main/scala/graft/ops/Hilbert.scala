package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering keys — the better-locality sibling of
  * [[ZOrder]]'s Morton keys (same two-column bucket front-end, same
  * `repartitionByRange(key) + sortWithinPartitions` write recipe, and
  * the layout Delta OPTIMIZE and BigQuery clustering actually prefer):
  * consecutive Hilbert indexes are ALWAYS grid-adjacent, so every file
  * covers one contiguous curve segment with a tighter 2-D bounding box
  * than the z-curve's diagonal jumps — fewer false-positive files per
  * box predicate at the same file count.
  *
  * The xy2d transform is the classic bit-twiddling loop (rotate/flip
  * per level), unrolled here into `order` chained PROJECTIONS of pure
  * integer CASE/xor/shift arithmetic — each level references the
  * previous level's named columns, so the expression tree stays linear
  * (never the 4^order blow-up of inlining) and whole-stage codegen
  * keeps it scan-side. Deterministic, SQL-expressible: the DuckDB
  * oracle replays the same unrolled levels bit-for-bit (q_hilbert).
  */
object Hilbert {

  /** Append Hilbert index `out` of bucket columns `bx`, `by` (values in
    * [0, 2^order)) — one chained projection per curve level.
    */
  def withIndex(df: DataFrame, bx: String, by: String, out: String,
                order: Int = ZOrder.bitsPerDim): DataFrame = {
    var cur = df.withColumn("h_x", col(bx))
      .withColumn("h_y", col(by))
      .withColumn(out, lit(0L))
    for (l <- (order - 1) to 0 by -1) {
      val s = 1L << l
      val rx = when(col("h_x").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      val ry = when(col("h_y").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L)
      cur = cur.withColumn("h_rx", rx).withColumn("h_ry", ry)
        .withColumn(out,
          col(out) + lit(s * s) *
            (lit(3L) * col("h_rx")).bitwiseXOR(col("h_ry")))
        .withColumn("h_nx",
          when(col("h_ry") === 0,
            when(col("h_rx") === 1, lit(s - 1) - col("h_y"))
              .otherwise(col("h_y")))
            .otherwise(col("h_x")))
        .withColumn("h_ny",
          when(col("h_ry") === 0,
            when(col("h_rx") === 1, lit(s - 1) - col("h_x"))
              .otherwise(col("h_x")))
            .otherwise(col("h_y")))
        .withColumn("h_x", col("h_nx"))
        .withColumn("h_y", col("h_ny"))
    }
    cur.drop("h_x", "h_y", "h_rx", "h_ry", "h_nx", "h_ny")
  }

  /** Plain-Scala reference xy2d (spec parity + driver-side uses). */
  def xy2d(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
