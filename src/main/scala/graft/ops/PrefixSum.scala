package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global running total over a TOTAL order — without the
  * single-partition window `Window.orderBy(...)` degenerates to (Spark
  * warns "No Partition Defined ... moving all data to a single
  * partition": the whole corpus lands on one reducer, the opposite of a
  * 100 TB plan).
  *
  * Classic two-pass distributed prefix sum instead:
  *
  *  1. range-partition the rows on the sort key (contiguous key ranges in
  *     increasing partition order — AQE may coalesce, but it merges
  *     ADJACENT shuffle partitions, so ranges stay contiguous and
  *     order-aligned);
  *  2. partition-local running sums (a windowed cumsum per partition id);
  *  3. per-partition totals — one tiny row per partition — get their own
  *     exclusive prefix sum on the driver-scale side and are broadcast
  *     back; each row's global total = local cumsum + its partition's
  *     offset.
  *
  * The result is independent of WHERE the range boundaries fall because
  * the caller's sort columns must totally order the rows (same contract
  * every deterministic window in this engine has) — asserted in
  * PrefixSumSpec by parity with the single-partition form and stability
  * under input repartitioning.
  */
object PrefixSum {

  /** Append `out` = running sum of `value` over the total order `sort`.
    * `sort` columns must totally order the input (add a unique tie-break).
    */
  def runningSum(df: DataFrame, sort: Seq[Column], value: Column,
                 out: String): DataFrame = {
    val ranged = df.repartitionByRange(sort: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__val", value.cast("long"))
      .withColumn("__local", sum(col("__val")).over(localW))
    // one row per partition — window over ~shuffle.partitions rows, the
    // only place a single-partition window is the RIGHT tool
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__pid").agg(sum("__val").as("__ptot"))
      .withColumn("__off", coalesce(sum("__ptot").over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__val", "__local")
  }
}
