package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 extension: analytic window frames (running/sliding aggregates,
  * lag/lead) — absent in the reference (its only window is the ranking W1,
  * `IncrementalAutocomplete.java:120-125`).
  *
  * Scale notes: a running frame is one exchange on the partition key plus an
  * in-partition sort — Spark evaluates UNBOUNDED PRECEDING..CURRENT ROW
  * frames in a single streaming pass (no per-row rescans). Skewed partition
  * keys (one user with millions of events) serialize into one task; the
  * mitigation is sessionizing/bucketing the key upstream, not the frame.
  *
  * Determinism: callers must order by a unique key. Metric values are
  * converted to exact integer millis (`round(v*1000) :: long`) so running
  * sums are order-independent integer arithmetic — double accumulation order
  * differs across engines (DuckDB uses segment trees for window sums).
  */
object WindowFrames {

  /** event-frame projection: integer-milli value, running sum, lag(1),
    * sliding 3-row sum, and row_number — all over (partition, order).
    */
  def running(df: DataFrame, partition: String, order: String,
              value: Column): DataFrame = {
    val vm = round(value * 1000).cast("long")
    val w = Window.partitionBy(df(partition)).orderBy(df(order))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val last3 = w.rowsBetween(-2, Window.currentRow)
    df.select(df(order), df(partition), vm.as("value_milli"),
      sum(vm).over(cum).as("running_sum"),
      lag(vm, 1).over(w).as("prev_value"),
      sum(vm).over(last3).as("sum3"),
      row_number().over(w).as("seq"))
  }
}
