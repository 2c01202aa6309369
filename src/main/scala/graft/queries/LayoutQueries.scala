package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.ops.{Compaction, ZoneMaps}

/** Data-layout tier: source-format scan coverage (S1 family, SURVEY §2.1)
  * and the small-file compaction planner ([[graft.ops.Compaction]]).
  *
  * The format-scan queries close the S1 gap between "a csv/json/orc
  * reader exists in `Sources`" (spec-only until this round) and "the
  * reader is hash-certified end-to-end": each reads the `documents`
  * corpus through a memoized fixture in that format
  * ([[FormatFixture]] — built once per JVM, overwritten not leaked,
  * deleted on exit) and aggregates per (lang, source); the DuckDB oracle
  * computes the same aggregate on the parquet stand-in, so a wrong
  * delimiter, quote/escape asymmetry, schema drift, lost rows, or a
  * partition-column mixup changes the hash. Aggregating (not dumping
  * rows) keeps the compare O(langs×sources) while still summing over
  * every row's doc_id/n_chars/length(text).
  *
  * `q_compaction_plan` certifies the bin-packing math on a manifest
  * stand-in derived from `documents` (path = source/doc_id, bytes =
  * n_chars) — the filesystem front-end and the rewrite job are
  * spec-covered on a real fragmented directory (CompactionSpec), since
  * the oracle cannot list files.
  */
object LayoutQueries {

  /** Shared (lang, source) rollup — counts, byte totals, text-length
    * totals, id range. Any row loss, field corruption, or column swap
    * in the format roundtrip moves at least one aggregate.
    */
  private def scanAgg(df: DataFrame): DataFrame =
    df.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(length(col("text"))).as("total_len"),
      min(col("doc_id")).as("min_id"),
      max(col("doc_id")).as("max_id"))

  private val scanAggSql =
    """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS total_len,
      |  CAST(min(doc_id) AS BIGINT) AS min_id,
      |  CAST(max(doc_id) AS BIGINT) AS max_id
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** Greedy-binning target for the manifest stand-in: small enough that
    * every SF yields many multi-file bins (sf0.001 total ≈ 150 KB →
    * ~9 bins; sf0.1 ≈ 1.5 MB → ~90).
    */
  private val planTarget = 16384L

  def all: Map[String, Q] = Map(

    // S1 csv — write-side quoting/whitespace and read-side schema must
    // agree byte-for-byte with the parquet truth.
    "q_scan_csv" -> Q(scanAggSql) { (s, dir) =>
      scanAgg(graft.io.Sources.csv(
        s, FormatFixture.path(s, dir, "csv"), FormatFixture.docSchema))
    },

    // S1 json-lines — explicit schema (no inference scan), unicode-safe.
    "q_scan_json" -> Q(scanAggSql) { (s, dir) =>
      scanAgg(graft.io.Sources.jsonLines(
        s, FormatFixture.path(s, dir, "json"), FormatFixture.docSchema))
    },

    // S1 orc — the other vectorized columnar format in this Spark build.
    "q_scan_orc" -> Q(scanAggSql) { (s, dir) =>
      scanAgg(graft.io.Sources.orc(s, FormatFixture.path(s, dir, "orc")))
    },

    // S1 hive-partitioned parquet — lang comes back as a PARTITION
    // column (directory name), not a data column; the lang IN (...)
    // predicate prunes at planning time (PlanAuditSpec asserts the
    // non-matching lang dirs never reach the scan). The oracle filters
    // the flat parquet the same way, so a lost/mistyped partition value
    // or over-pruned read changes the hash.
    "q_scan_partitioned" -> Q(
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS total_len,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id
        |FROM documents WHERE lang IN ('en', 'fr')
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      scanAgg(
        s.read.parquet(FormatFixture.path(s, dir, "part"))
          .filter(col("lang").isin("en", "fr")))
    },

    // S1d — co-bucketed catalog-table join (the 100 TB co-located-join
    // layout, promoted from SinksSpec to the hash-checked gate): both
    // sides written via Sinks.writeBucketed (8 buckets on doc_id,
    // sorted), so the doc_id equi-join needs NO exchange on either side
    // — the layout that turns the fact⋈fact shuffle into a local merge.
    // The oracle recomputes the same rollup from the raw corpus, so one
    // hash certifies the bucketed write → catalog read → co-located
    // join roundtrip end-to-end. PlanAuditSpec pins the shuffle-free
    // SortMergeJoin with broadcasting disabled (the big-big path the
    // bucketing exists for).
    "q_join_bucketed" -> Q(
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(string_split_regex(lower(trim(text)), '\s+')))
        |    AS BIGINT) AS total_tokens
        |FROM documents GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val (docsT, toksT) = FormatFixture.bucketedTables(s, dir)
      s.table(docsT).join(s.table(toksT), "doc_id")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum("ws_tokens").as("total_tokens"))
    },

    // Compaction planner (ops/Compaction.plan + planSummary) on a
    // manifest stand-in: one "file" per document, path = source/doc_id,
    // bytes = n_chars. The oracle replays the greedy cumulative-sum
    // binning bit-for-bit — bin = floor(bytes-before / target) over the
    // path-sorted manifest — certifying bins are contiguous path ranges
    // averaging the target.
    "q_compaction_plan" -> Q(
      s"""WITH manifest AS (
         |  SELECT source || '/' ||
         |      lpad(CAST(doc_id AS VARCHAR), 12, '0') || '.parquet'
         |      AS path,
         |    CAST(n_chars AS BIGINT) AS bytes
         |  FROM documents),
         |binned AS (
         |  SELECT path, bytes,
         |    CAST(floor(coalesce(sum(bytes) OVER (ORDER BY path
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      / $planTarget.0) AS BIGINT) AS bin
         |  FROM manifest)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
         |  min(path) AS first_file, max(path) AS last_file
         |FROM binned GROUP BY 1""".stripMargin) { (s, dir) =>
      val manifest = table(s, dir, "documents").select(
        concat(col("source"), lit("/"),
          lpad(col("doc_id").cast("string"), 12, "0"),
          lit(".parquet")).as("path"),
        col("n_chars").cast("long").as("bytes"))
      Compaction.planSummary(Compaction.plan(manifest, planTarget))
    },

    // Zone maps over the WRITE-ORDER layout: zone = ingest batch of 50
    // docs (doc_id is monotone in write order), stats + skip decision
    // for n_chars BETWEEN 300 AND 400. n_chars is uncorrelated with
    // write order, so almost nothing skips — the honest baseline the
    // sorted variant is measured against.
    "q_zonemap" -> Q(
      s"""SELECT CAST(floor(doc_id / $zoneRows) AS BIGINT) AS zone,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(min(n_chars) AS BIGINT) AS n_chars_min,
         |  CAST(max(n_chars) AS BIGINT) AS n_chars_max,
         |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_chars_nulls,
         |  coalesce(max(n_chars) < $predLo OR min(n_chars) > $predHi,
         |    false) AS skip
         |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      val zones = ZoneMaps.build(table(s, dir, "documents"),
        floor(col("doc_id") / zoneRows), Seq("n_chars"))
      ZoneMaps.prune(zones, "n_chars", lit(predLo), lit(predHi))
    },

    // Same stats over a layout CLUSTERED on the stat column (what a
    // repartitionByRange(n_chars) write or q_zorder's curve produces):
    // matching rows collapse into a contiguous zone band and every
    // other zone skips. The q_zonemap/q_zonemap_sorted pair makes the
    // layout-maintenance payoff an oracle-checked number, not a claim.
    // The global row_number is oracle scaffolding for a deterministic
    // zone id; production gets the same zones for free as file
    // identity from the range-partitioned write (no global window).
    "q_zonemap_sorted" -> Q(
      s"""WITH ranked AS (
         |  SELECT n_chars,
         |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn
         |  FROM documents)
         |SELECT CAST(floor((rn - 1) / $zoneRows) AS BIGINT) AS zone,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(min(n_chars) AS BIGINT) AS n_chars_min,
         |  CAST(max(n_chars) AS BIGINT) AS n_chars_max,
         |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_chars_nulls,
         |  coalesce(max(n_chars) < $predLo OR min(n_chars) > $predHi,
         |    false) AS skip
         |FROM ranked GROUP BY 1""".stripMargin) { (s, dir) =>
      // rank via the distributed prefix sum (r16 verdict #1): a global
      // row_number() plans as a SINGLE-PARTITION WindowExec — the whole
      // corpus on one reducer, the #1 remaining 100 TB killer shape.
      // row_number over a total order == inclusive running count of 1
      // over the same order, which PrefixSum computes with a range
      // exchange + per-partition local ranks + a broadcast of the
      // ~n_partitions per-partition offsets (same pattern plan-audited
      // in q_token_budget/q_user_growth). Order semantics identical
      // (asc nulls-first on (n_chars, doc_id), a total order).
      val ranked = graft.ops.PrefixSum.runningSum(
        table(s, dir, "documents"),
        Seq(col("n_chars"), col("doc_id")), lit(1L), "rn")
      val zones = ZoneMaps.build(ranked,
        floor((col("rn") - 1) / zoneRows), Seq("n_chars"))
      ZoneMaps.prune(zones, "n_chars", lit(predLo), lit(predHi))
    },

    // Point-lookup skipping (ZoneMaps.containsViaBloom): per-zone
    // blooms rule most zones out without touching data; only bloom
    // candidates are verified against rows. Blooms have no false
    // negatives, so the result is row-identical to the brute-force
    // group-by — the oracle certifies the whole bloom path end-to-end
    // (a lost zone, a wrong hash, or a false negative changes the
    // hash). On this corpus 9 of 10 zones skip.
    "q_zonemap_contains" -> Q(
      s"""SELECT CAST(floor(doc_id / $zoneRows) AS BIGINT) AS zone,
         |  max(CASE WHEN n_chars = $probeChars THEN 1 ELSE 0 END) = 1
         |    AS contains
         |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      ZoneMaps.containsViaBloom(table(s, dir, "documents"),
        floor(col("doc_id") / zoneRows), "n_chars", lit(probeChars))
    },

    // 2-D skipping over a Z-ORDERED layout (the payoff q_zorder's
    // Morton keys exist for): events laid out in zkey order, zones of
    // 100 rows, min/max stats on BOTH scaled dims, and a box predicate
    // (zx AND zy each in [64,127]) pruned via disjointness in EITHER
    // dim. A (zx)-sorted layout gives tight zx bounds but zy spans
    // everything (ZoneMapsSpec measures the gap); the z-curve keeps
    // every zone's bounding box small in both dims. Bucket/interleave
    // math is the committed q_zorder formula; the oracle replays
    // bucket → interleave → rank → zone → stats → skip bit-for-bit.
    "q_zonemap_zorder" -> Q(
      s"""WITH st AS (SELECT CAST(min(user_id) AS BIGINT) mnx,
         |    CAST(max(user_id) AS BIGINT) mxx,
         |    min(value) mny, max(value) mxy FROM events),
         |b AS (SELECT event_id,
         |  CASE WHEN user_id IS NULL OR mnx IS NULL OR mxx IS NULL
         |      OR mnx = mxx THEN 0
         |    ELSE greatest(0, least(255, CAST(floor(
         |      ((CAST(user_id AS DOUBLE) - CAST(mnx AS DOUBLE)) * 256) /
         |      (CAST(mxx AS DOUBLE) - CAST(mnx AS DOUBLE))) AS BIGINT)))
         |    END zx,
         |  CASE WHEN value IS NULL OR mny IS NULL OR mxy IS NULL
         |      OR mny = mxy THEN 0
         |    ELSE greatest(0, least(255, CAST(floor(
         |      ((CAST(value AS DOUBLE) - CAST(mny AS DOUBLE)) * 256) /
         |      (CAST(mxy AS DOUBLE) - CAST(mny AS DOUBLE))) AS BIGINT)))
         |    END zy
         |  FROM events, st),
         |k AS (SELECT event_id, zx, zy,
         |  (((zx >> 0) & 1) << 0) + (((zy >> 0) & 1) << 1) +
         |  (((zx >> 1) & 1) << 2) + (((zy >> 1) & 1) << 3) +
         |  (((zx >> 2) & 1) << 4) + (((zy >> 2) & 1) << 5) +
         |  (((zx >> 3) & 1) << 6) + (((zy >> 3) & 1) << 7) +
         |  (((zx >> 4) & 1) << 8) + (((zy >> 4) & 1) << 9) +
         |  (((zx >> 5) & 1) << 10) + (((zy >> 5) & 1) << 11) +
         |  (((zx >> 6) & 1) << 12) + (((zy >> 6) & 1) << 13) +
         |  (((zx >> 7) & 1) << 14) + (((zy >> 7) & 1) << 15) AS zkey
         |  FROM b),
         |r AS (SELECT zx, zy,
         |  row_number() OVER (ORDER BY zkey, event_id) AS rn FROM k)
         |SELECT CAST(floor((rn - 1) / $zZoneRows) AS BIGINT) AS zone,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(min(zx) AS BIGINT) AS zx_min,
         |  CAST(max(zx) AS BIGINT) AS zx_max,
         |  CAST(sum(CASE WHEN zx IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS zx_nulls,
         |  CAST(min(zy) AS BIGINT) AS zy_min,
         |  CAST(max(zy) AS BIGINT) AS zy_max,
         |  CAST(sum(CASE WHEN zy IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS zy_nulls,
         |  coalesce(max(zx) < $boxLo OR min(zx) > $boxHi, false)
         |    OR coalesce(max(zy) < $boxLo OR min(zy) > $boxHi, false)
         |    AS skip
         |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
      val zones = ZoneMaps.build(zorderRanked(s, dir),
        floor((col("rn") - 1) / zZoneRows), Seq("zx", "zy"))
      ZoneMaps.pruneBox(zones, Seq(
        ("zx", lit(boxLo), lit(boxHi)), ("zy", lit(boxLo), lit(boxHi))))
    })

  /** Zone size (rows per ingest batch / file) and the skip predicate's
    * range for the zone-map queries.
    */
  private val zoneRows = 50
  private val predLo = 300
  private val predHi = 400

  /** Point-lookup probe for the bloom-zone query (a mid-range n_chars
    * value present in ~1 of 10 zones at every SF).
    */
  private val probeChars = 300L

  /** Z-order zone size and the 2-D predicate box (each scaled dim in
    * [64, 127] — a quarter of each axis, 1/16 of the plane).
    */
  private val zZoneRows = 100
  private val boxLo = 64
  private val boxHi = 127

  /** Events with their z-order coords and curve rank: zx/zy scaled
    * buckets (ZOrder.bucket over the column-wide bounds — one 1-row
    * broadcast aggregate), rn = rank along the Morton curve. The
    * global row_number is oracle scaffolding for deterministic zone
    * ids; production gets zones for free as file identity from the
    * `repartitionByRange(zkey) + sortWithinPartitions` write.
    */
  private[graft] def zorderRanked(s: org.apache.spark.sql.SparkSession,
                                  dir: String)
      : org.apache.spark.sql.DataFrame = {
    val e = table(s, dir, "events")
    val st = e.agg(min("user_id").as("mnx"), max("user_id").as("mxx"),
      min("value").as("mny"), max("value").as("mxy"))
    val keyed = e.crossJoin(broadcast(st))
      .select(col("event_id"),
        graft.ops.ZOrder.bucket(col("user_id"), col("mnx"), col("mxx"))
          .as("zx"),
        graft.ops.ZOrder.bucket(col("value"), col("mny"), col("mxy"))
          .as("zy"))
      .withColumn("zkey", graft.ops.ZOrder.interleave(col("zx"), col("zy")))
    // distributed curve rank (r16 verdict #1): row_number over the full
    // events table planned as a single-partition WindowExec; the
    // PrefixSum running count ranks via a range exchange on
    // (zkey, event_id) instead — see q_zonemap_sorted.
    graft.ops.PrefixSum.runningSum(keyed,
      Seq(col("zkey"), col("event_id")), lit(1L), "rn")
  }
}
