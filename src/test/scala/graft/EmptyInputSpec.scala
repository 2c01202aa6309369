package graft

import org.apache.spark.sql.functions._

import graft.ops._
import graft.ops.llm._

/** Degenerate-input robustness: every composite operator must return an
  * empty (not crashed) result on empty input — empty partitions, empty
  * localCheckpoints, windows over nothing, and LSH joins with no postings
  * all exercise different failure modes.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noVecs = Seq.empty[(Long, Array[Double])].toDF("id", "v")

  test("pipeline ops on empty input") {
    assert(Pipeline.batchCounts(
      Seq.empty[String].toDF("value")).count() == 0)
    val empty = Pipeline.emptyState(spark)
    assert(Merge(empty, empty, Seq("prefix", "query"), "frequency")
      .count() == 0)
    assert(TopK(empty, Seq("prefix"), empty("frequency"),
      Seq(empty("query")), 3).count() == 0)
  }

  test("dedup ops on empty input") {
    assert(Dedup.exact(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 8, 10)
      .count() == 0)
    assert(Dedup.minhashDedup(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
    assert(SimHash.nearDuplicates(noDocs, "doc_id", "text").count() == 0)
    assert(SimHash.nearDuplicatesSha(noDocs, "doc_id", "text").count() == 0)
  }

  test("similarity ops on empty input") {
    assert(Similarity.bruteForceTopK(noVecs, noVecs, 5).count() == 0)
    assert(Similarity.cosinePairs(noVecs, 0.5).count() == 0)
    assert(Similarity.annTopK(noVecs, noVecs, 5).count() == 0)
    // empty corpus + NON-empty queries: dim inference falls back to the
    // query side so bucketOf on query rows still matches plane length
    val someQ = Seq((1L, Array(0.5, 0.5, 0.5))).toDF("id", "v")
    assert(Similarity.annTopK(noVecs, someQ, 5).count() == 0)
  }

  test("round-4 dedup/similarity ops on empty input") {
    assert(Dedup.chunkDupStats(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.substringDupStats(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minhashCalibration(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.keepBestPerCluster(
      Seq.empty[(Long, Long)].toDF("a", "b"),
      noDocs, "doc_id", length(col("text"))).count() == 0)
    val noCells = Seq.empty[(Long, Int, Array[Double])]
      .toDF("id", "cell", "vec")
    assert(Similarity.semDedupPairs(noCells, 0.5).count() == 0)
    assert(Similarity.semDedup(noCells, 0.5).count() == 0)
    assert(Profile.profile(noDocs, Seq("doc_id", "text")).count() == 2)
    assert(Decontaminate.viaJoin(noDocs, noDocs, "doc_id", "text", 3)
      .count() == 0)
    // empty probe set: the bloom aggregate returns null — must fall back
    // to the (empty) exact join, not fail analysis on a null literal
    val someDocs = Seq((1L, "some training document text here"))
      .toDF("doc_id", "text")
    assert(Decontaminate.viaBloom(someDocs, noDocs, "doc_id", "text", 3)
      .count() == 0)
  }

  test("round-5 dedup ops on empty input") {
    assert(Dedup.removeBoilerplate(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.sortedNeighborhoodPairs(noDocs, "doc_id", "text")
      .count() == 0)
    // all-whitespace docs tokenize to nothing chunkable
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.removeBoilerplate(blank, "doc_id", "text").count() == 0)
  }

  test("round-6 ops on empty input") {
    assert(Dedup.editDistancePairs(noDocs, "doc_id", "text").count() == 0)
    // blank/short docs: the small-string band must survive being the
    // WHOLE corpus (the gram path sees zero rows)
    val blank = Seq((1L, ""), (2L, " "), (3L, "ab")).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(blank, "doc_id", "text").count() == 3)
    val noDict = Seq.empty[(String, String)].toDF("surface", "tag")
    assert(Entities.template(noDocs, "doc_id", "text", noDict)
      .count() == 0)
    assert(Entities.templateSpans(noDocs, "doc_id", "text", noDict, 3)
      .count() == 0)
    // empty DICTIONARY over real docs: pure pass-through
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Entities.templateSpans(docs, "doc_id", "text", noDict, 3)
      .as[(Long, String)].head() == ((1L, "a b c")))
    assert(Similarity.annTopKExactInt(noVecs, noVecs, 5, dim = 3)
      .count() == 0)
    val noCodes = Seq.empty[(Long, Int, Int)].toDF("id", "sub", "code")
    val noBooks = Seq.empty[(Int, Int, Array[Double])]
      .toDF("sub", "code", "cvec")
    assert(Pq.refineTopKInt(noVecs, noCodes, noBooks, noVecs,
      m = 1, k = 5, shortlist = 10).count() == 0)
  }

  test("sessionize and time joins on empty input") {
    val noEvents = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "ts", "event_id")
    assert(Sessionize(noEvents, "user_id", "ts", "event_id", 100L)
      .count() == 0)
    val l = Seq.empty[(Long, Long, Long)].toDF("user", "ts", "id")
    assert(TimeJoins.asof(l, l, "user", "ts", "id", "id").count() == 0)
    assert(TimeJoins.rangeBinned(l, l, "user", "ts", "id", 10L)
      .count() == 0)
  }

  test("layout ops on empty input") {
    val noManifest = Seq.empty[(String, Long)].toDF("path", "bytes")
    assert(Compaction.plan(noManifest, 100L).count() == 0)
    assert(Compaction.planSummary(
      Compaction.plan(noManifest, 100L)).count() == 0)
    // an existing but file-less directory: empty manifest, metadata
    // no-op, no destination written
    val emptyDir = graft.TempDirs.create("graft-compact-empty")
    assert(Compaction.listFiles(spark, emptyDir).count() == 0)
    assert(Compaction.compact(spark, emptyDir, emptyDir + "-dest", 100L)
      == Compaction.CompactResult(0L, 0L, 0L, 0L))
    assert(!new java.io.File(emptyDir + "-dest").exists())
    val noZoned = Seq.empty[(Long, java.lang.Long)].toDF("z", "v")
    assert(ZoneMaps.prune(ZoneMaps.build(noZoned, col("z"), Seq("v")),
      "v", lit(1), lit(2)).count() == 0)
  }
}
