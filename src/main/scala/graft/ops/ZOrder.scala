package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for multi-dimensional data clustering — the
  * standard layout trick for making parquet min/max (row-group / file
  * footer) statistics selective on MORE THAN ONE column at once.
  *
  * At 100 TB the scan is the dominant cost and the only scan rows you
  * don't pay for are the ones pruned by footer statistics. A sort on
  * `(a, b)` makes file bounds tight on `a` but useless on `b`; writing in
  * z-key order keeps every file's bounding box small in BOTH dimensions,
  * so a predicate on either column (or both) skips most files. The key is
  * computed scan-side from per-column [min, max] (one 1-row broadcast
  * aggregate), then `repartitionByRange(zkey) + sortWithinPartitions` —
  * exactly the recipe Delta/Iceberg `OPTIMIZE ZORDER BY` applies, built
  * here from primitives.
  *
  * Everything is integer bit-twiddling after one scale step, so the key is
  * deterministic and SQL-expressible (the DuckDB oracle replays it
  * bit-for-bit in q_zorder).
  */
object ZOrder {

  /** Bits per dimension (8 → 256 buckets/dim, 16-bit interleaved key for
    * 2-D). Plenty for file-level pruning: with 8 bits a dimension's range
    * splits into 256 slabs, far below file counts at any real SF.
    */
  val bitsPerDim = 8

  /** Scale `c` into an integer bucket in [0, 255] given its column-wide
    * [mn, mx]. All operands go through double so ONE expression shape
    * serves bigint and double columns alike (the oracle mirrors it).
    * Degenerate inputs — NULL value, NULL bounds (all-null column), or a
    * constant column (mx == mn, whose division would produce NaN) — are
    * pinned to bucket 0 BEFORE the division on both engines, so neither
    * NaN casts nor NULL-propagating least/greatest can diverge.
    */
  def bucket(c: Column, mn: Column, mx: Column): Column =
    when(c.isNull || mn.isNull || mx.isNull || mn === mx, lit(0L))
      .otherwise(greatest(lit(0L), least(lit(255L),
        // the mx row itself lands on 256 → clamped to the top bucket
        floor(((c.cast("double") - mn.cast("double")) * 256) /
          (mx.cast("double") - mn.cast("double"))))))

  /** Interleave the low [[bitsPerDim]] bits of two bucket columns:
    * bit i of `bx` lands at position 2i, bit i of `by` at 2i+1.
    * Unrolled sum of 16 shift/mask terms — stays in whole-stage codegen.
    */
  def interleave(bx: Column, by: Column): Column =
    (0 until bitsPerDim).map { i =>
      shiftleft(shiftright(bx, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(by, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** 2-D z-key of `(x, y)` given their column-wide bounds. */
  def key(x: Column, y: Column,
          mnx: Column, mxx: Column, mny: Column, mxy: Column): Column =
    interleave(bucket(x, mnx, mxx), bucket(y, mny, mxy))
}
