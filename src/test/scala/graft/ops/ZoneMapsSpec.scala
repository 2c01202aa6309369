package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zone-map build/prune semantics plus the two properties that make
  * skipping trustworthy and worthwhile: soundness (a skipped zone
  * provably contains no matching row) and the clustering payoff (the
  * same stats over a layout sorted on the stat column skip far more).
  */
class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  test("build+prune: interval overlap decides skip; all-null zone never skips") {
    val df = Seq[(Long, java.lang.Long)](
      (0L, 10L), (0L, 20L),   // zone 0: [10,20]  — below [25,35] -> skip
      (1L, 30L), (1L, 50L),   // zone 1: [30,50]  — overlaps      -> keep
      (2L, 40L), (2L, 60L),   // zone 2: [40,60]  — overlaps (40<=35? no: min 40 > 35 -> skip)
      (3L, null), (3L, null)  // zone 3: all null — conservative  -> keep
    ).toDF("z", "v")
    val zones = ZoneMaps.prune(
      ZoneMaps.build(df, col("z"), Seq("v")), "v", lit(25), lit(35))
      .select("zone", "n_rows", "v_min", "v_max", "v_nulls", "skip")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4), r.getBoolean(5))).toMap
    assert(zones(0L) == ((2L, Some(10L), Some(20L), 0L, true)))
    assert(zones(1L) == ((2L, Some(30L), Some(50L), 0L, false)))
    assert(zones(2L) == ((2L, Some(40L), Some(60L), 0L, true)))
    assert(zones(3L) == ((2L, None, None, 2L, false)))
  }

  test("soundness on documents: skipped zones contain no matching row") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("zone", floor(col("doc_id") / 50))
    val pruned = ZoneMaps.prune(
      ZoneMaps.build(docs, col("zone"), Seq("n_chars")),
      "n_chars", lit(300), lit(400))
    val leaked = docs
      .join(pruned.filter(col("skip")).select("zone"), "zone")
      .filter(col("n_chars").between(300, 400)).count()
    assert(leaked == 0L, s"$leaked matching rows inside skipped zones")
  }

  test("bloom zones: no false negatives, most absent zones ruled out") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val viaBloom = graft.ops.ZoneMaps.containsViaBloom(
      docs, floor(col("doc_id") / 50), "n_chars", lit(300L))
      .as[(Long, Boolean)].collect().toMap
    val exact = docs.groupBy(floor(col("doc_id") / 50).as("zone"))
      .agg((max(when(col("n_chars") === 300, 1).otherwise(0)) === 1)
        .as("contains"))
      .as[(Long, Boolean)].collect().toMap
    // bloom-backed result must be row-identical to brute force (no
    // false negatives; false positives only waste a verify read)
    assert(viaBloom == exact)
    // the skipping is real on this corpus: the BLOOM itself (not the
    // verify pass) rules out most zones before any data is touched
    val ruledOut = graft.ops.ZoneMaps.bloomZones(
        docs, floor(col("doc_id") / 50), "n_chars", 1024L, 65536L)
      .filter(!graft.functions.BloomContains.contains(
        col("n_chars_bloom"), xxhash64(lit(300L)))).count()
    assert(ruledOut >= 8,
      s"bloom ruled out only $ruledOut of ${exact.size} zones")
  }

  test("z-order zones: 2-D box skipping sound, beats the 1-D sort") {
    import org.apache.spark.sql.expressions.Window
    val box = Seq(("zx", lit(64), lit(127)), ("zy", lit(64), lit(127)))
    val ranked = graft.queries.LayoutQueries.zorderRanked(spark, sf0001)
      .cache()
    try {
      val zZones = ZoneMaps.pruneBox(ZoneMaps.build(ranked,
        floor((col("rn") - 1) / 20), Seq("zx", "zy")), box)
      // same rows, 1-D layout: sorted by zx alone — zx bounds tight,
      // zy bounds span everything
      val sorted = ranked.withColumn("rs",
        row_number().over(Window.orderBy("zx", "event_id")))
      val sZones = ZoneMaps.pruneBox(ZoneMaps.build(sorted,
        floor((col("rs") - 1) / 20), Seq("zx", "zy")), box)
      def skips(z: org.apache.spark.sql.DataFrame): Long =
        z.filter(col("skip")).count()
      val (zs, ss) = (skips(zZones), skips(sZones))
      assert(zs > ss,
        s"z-order must out-skip the 1-D sort on a 2-D box: $zs vs $ss")
      // 2-D soundness: no skipped zone holds an in-box row
      val leaked = ranked
        .withColumn("zone", floor((col("rn") - 1) / 20))
        .join(zZones.filter(col("skip")).select("zone"), "zone")
        .filter(col("zx").between(64, 127) &&
          col("zy").between(64, 127)).count()
      assert(leaked == 0L, s"$leaked in-box rows inside skipped zones")
    } finally ranked.unpersist()
  }

  test("clustered layout skips more zones than write-order layout") {
    val byName = graft.SparkEntry.queries
    def skips(q: String): (Long, Long) = {
      val d = byName(q)(spark, sf0001).cache()
      try (d.filter(col("skip")).count(), d.count())
      finally d.unpersist()
    }
    val (skipU, totalU) = skips("q_zonemap")
    val (skipS, totalS) = skips("q_zonemap_sorted")
    assert(totalU == totalS, "same corpus, same zone size")
    assert(skipS > skipU,
      s"sorted layout must skip more: $skipS vs $skipU of $totalU")
    // the matching band is contiguous after sorting: every zone except
    // the band (+2 boundary zones) skips
    val matching = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("n_chars").between(300, 400)).count()
    assert(skipS >= totalS - (matching / 50 + 2),
      s"sorted skips $skipS of $totalS with $matching matching rows")
  }
}
