package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (batch form): a new
  * session starts when the gap to the previous event of the same key
  * exceeds `gapNs`. Two window passes (lag → flag, running sum → session
  * index) over ONE sort/shuffle per key, then a per-session aggregate.
  *
  * Timestamps stay integer nanoseconds end-to-end (the events table's
  * native ns-long form) so every derived quantity is exact — see the
  * oracle-parity rules (raw timestamps never reach output).
  */
object Sessionize {

  /** (key, sessionIdx, n_events, dur, first/last event id) per session.
    * `ts` must be an integer column (any time unit — `dur` and `gap` are
    * in the same unit); `order` a unique tie-break.
    */
  def apply(df: DataFrame, key: String, ts: String, order: String,
            gap: Long): DataFrame = {
    val w = Window.partitionBy(df(key)).orderBy(df(ts), df(order))
    val delta: Column = df(ts) - lag(df(ts), 1).over(w)
    val isNew = when(delta.isNull || delta > gap, 1L).otherwise(0L)
    val sessionIdx = sum(isNew)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("session_idx", sessionIdx)
      .groupBy(df(key), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(df(ts)) - min(df(ts))).as("dur"),
        min(df(order)).as("first_event"),
        max(df(order)).as("last_event"))
  }

  /** Dual-rule sessionization (the GA4-style gap + max-duration pair): a
    * gap session additionally splits every `cap` time units of absolute
    * offset from its start, so no emitted session spans more than `cap`.
    * The cap split is the deterministic offset-bucket form
    * (floor((ts - session_start) / cap)) — no iteration, and every
    * window/groupBy clusters by a superset of the key, so the WHOLE
    * dual-rule computation still runs on the ONE per-key exchange.
    * Output adds `part_idx` (the cap bucket within the gap session).
    */
  def capped(df: DataFrame, key: String, ts: String, order: String,
             gap: Long, cap: Long): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(df(key)).orderBy(df(ts), df(order))
    val delta: Column = df(ts) - lag(df(ts), 1).over(w)
    val isNew = when(delta.isNull || delta > gap, 1L).otherwise(0L)
    val withIdx = df.withColumn("session_idx", sum(isNew)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val ws = Window.partitionBy(withIdx(key), col("session_idx"))
    withIdx
      .withColumn("_off", withIdx(ts) - min(withIdx(ts)).over(ws))
      .withColumn("part_idx", expr(s"_off div ${cap}L"))
      .groupBy(withIdx(key), col("session_idx"), col("part_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(withIdx(ts)) - min(withIdx(ts))).as("dur"),
        min(withIdx(order)).as("first_event"),
        max(withIdx(order)).as("last_event"))
  }
}
