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

  /** Multi-dimensional prune: skip when the zone's bounding box is
    * disjoint from the predicate box in ANY dimension — the reason
    * z-order layouts exist (a 1-D sort gives tight bounds on one
    * column; a z-ordered layout keeps every zone's box small in ALL
    * interleaved dimensions, so pruneBox skips on whichever dimension
    * the query constrains). Same conservative NULL handling per dim.
    */
  def pruneBox(zones: DataFrame,
               dims: Seq[(String, Column, Column)]): DataFrame =
    zones.withColumn("skip",
      dims.map { case (c, lo, hi) =>
        coalesce(col(s"${c}_max") < lo || col(s"${c}_min") > hi,
          lit(false))
      }.reduce(_ || _))

  /** The point-lookup half of skipping: min/max answers RANGES, blooms
    * answer `c = key` on high-cardinality columns where [min, max]
    * spans everything. One pass, partial-aggregated like any other agg
    * (map-side partial blooms OR-merge): per-zone bloom over
    * xxhash64(`c`), sized by `estItems`/`numBits` (bits/item ≈ 80 →
    * ~1e-6 false-positive rate; a false positive costs one wasted zone
    * read, never a wrong answer).
    */
  def bloomZones(df: DataFrame, zone: Column, c: String,
                 estItems: Long, numBits: Long): DataFrame =
    df.groupBy(zone.as("zone"))
      .agg(call_function("graft_bloom_agg", xxhash64(col(c)),
        lit(estItems), lit(numBits)).as(s"${c}_bloom"))

  /** Exact per-zone `contains(c = key)` computed the way a bloom-backed
    * scan would: zones whose bloom rules the key out are answered
    * `false` WITHOUT touching data; only bloom-candidate zones are
    * verified against the rows. Blooms have no false negatives, so the
    * result is row-identical to the brute-force group-by — which is
    * exactly what the oracle checks — while the data pass touches only
    * the candidate zones (at 100 TB: the files actually read).
    */
  def containsViaBloom(df: DataFrame, zone: Column, c: String,
                       key: Column, estItems: Long = 1024,
                       numBits: Long = 65536): DataFrame = {
    val zoned = df.withColumn("zone", zone)
    val blooms = bloomZones(zoned, col("zone"), c, estItems, numBits)
    // per-ROW bloom probe (Spark's might_contain only takes a constant
    // filter — one bloom per query; a zone map carries one per row)
    val hit = graft.functions.BloomContains.contains(
      col(s"${c}_bloom"), xxhash64(key))
    val ruledOut = blooms.filter(!hit)
      .select(col("zone"), lit(false).as("contains"))
    val verified = zoned
      .join(blooms.filter(hit).select("zone"), Seq("zone"), "left_semi")
      .groupBy("zone")
      .agg((max(when(col(c) === key, 1).otherwise(0)) === 1)
        .as("contains"))
    ruledOut.unionByName(verified)
  }
}
