package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps: per-zone (file / row-group / ingest-batch) column
  * statistics and the predicate-overlap test that turns them into scan
  * skipping — the pruning index every columnar store keeps (parquet
  * row-group stats, ORC stripe stats, Delta/Iceberg file stats,
  * Netezza zone maps). The reference scans its whole input every run;
  * at 100 TB the only affordable scan is one that skips, and skipping
  * is a METADATA decision: the zone map is aggregate-scale (one row
  * per file — ~800k rows at 100 TB), so evaluating a predicate against
  * it costs nothing compared to opening even one data file.
  *
  * Two pieces:
  *
  *  1. [[build]] — one aggregation pass produces min/max/null-count
  *     per (zone, column). In production the writer emits these at
  *     write time (parquet footers already hold them); building from
  *     data is the backfill path and the oracle-checkable form.
  *  2. [[prune]] — interval-overlap test per zone: a zone whose
  *     [min, max] is disjoint from the predicate's [lo, hi] can be
  *     skipped without reading. NULL semantics: a zone of all-null
  *     values has NULL min/max and is never skipped (conservative —
  *     `IS NULL` predicates may still match).
  *
  * How much skips is a property of LAYOUT, not of the index: stats on
  * a column uncorrelated with write order skip almost nothing, the
  * same stats over a layout clustered on that column skip almost
  * everything — the declared query pair (`q_zonemap` write-order vs
  * `q_zonemap_sorted` clustered) makes that delta oracle-visible, and
  * is the quantitative argument for `q_zorder`/compaction-style layout
  * maintenance.
  */
object ZoneMaps {

  /** One aggregation pass: per-zone row count and min/max/null-count
    * for each of `cols`. Output columns: `zone`, `n_rows`,
    * `<c>_min`, `<c>_max`, `<c>_nulls` per stat column.
    */
  def build(df: DataFrame, zone: Column, cols: Seq[String]): DataFrame = {
    val stats = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    df.groupBy(zone.as("zone"))
      .agg(count(lit(1)).as("n_rows"), stats: _*)
  }

  /** Mark zones skippable for `c BETWEEN lo AND hi`: disjoint
    * [min, max] — strictly below or strictly above the interval. NULL
    * min/max (all-null zone) yields skip=false via the null-safe
    * coalesce, the conservative choice.
    */
  def prune(zones: DataFrame, c: String, lo: Column, hi: Column)
      : DataFrame =
    zones.withColumn("skip",
      coalesce(col(s"${c}_max") < lo || col(s"${c}_min") > hi,
        lit(false)))
}
