package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TempDirs}

/** Small-file compaction (ops/Compaction): path normalization, manifest
  * listing, greedy binning invariants, and a full rewrite roundtrip on a
  * genuinely fragmented parquet directory — data identical, file count
  * collapsed to the bin count, singleton bins never read or copied.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("normalize: scheme-qualified and bare renderings compare equal") {
    assert(Compaction.normalize("file:///tmp/x/p.parquet") ==
      "/tmp/x/p.parquet")
    assert(Compaction.normalize("file:/tmp/x/p.parquet") ==
      "/tmp/x/p.parquet")
    // authority is PRESERVED (two namenodes must not collide) — only the
    // scheme + slash-run renderings collapse
    assert(Compaction.normalize("hdfs://nn:8020/w/p.parquet") ==
      "/nn:8020/w/p.parquet")
    assert(Compaction.normalize("s3a://bucket/k/p.parquet") ==
      "/bucket/k/p.parquet")
    // already-bare path is a fixpoint
    assert(Compaction.normalize("/tmp/x/p.parquet") == "/tmp/x/p.parquet")
  }

  test("plan: bins are contiguous path ranges that average the target") {
    val files = (0 until 100)
      .map(i => (f"/data/part-$i%05d.parquet", 1000L)).toDF("path", "bytes")
    val planned = Compaction.plan(files, 10000L)
      .select("path", "bytes", "bin")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // 100 equal files at 10x target -> exactly 10 bins of 10 files
    assert(planned.map(_._3).distinct.sorted.toSeq == (0L until 10L))
    assert(planned.groupBy(_._3).values.forall(_.length == 10))
    // contiguity: bin ids are non-decreasing in path order
    assert(planned.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("plan: a file at target size gets its own bin (singleton)") {
    val files = Seq(("/d/a", 100L), ("/d/b", 100L), ("/d/c", 100L))
      .toDF("path", "bytes")
    val planned = Compaction.plan(files, 100L)
      .select("path", "bin").as[(String, Long)].collect().toMap
    assert(planned == Map("/d/a" -> 0L, "/d/b" -> 1L, "/d/c" -> 2L))
  }

  test("listFiles: manifest matches the directory, hidden files skipped") {
    val dir = TempDirs.create("graft-compact-list")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .repartition(8).write.mode("overwrite").parquet(dir)
    val m = Compaction.listFiles(spark, dir)
      .as[(String, Long)].collect()
    assert(m.length == 8, s"expected 8 data files, got ${m.length}")
    // _SUCCESS (and any .crc) excluded; scheme stripped
    assert(m.forall { case (p, b) =>
      p.startsWith("/") && p.endsWith(".parquet") && b > 0 })
  }

  test("compact: fragmented dir collapses to one file per bin, data intact") {
    val src = TempDirs.create("graft-compact-src")
    val dest = TempDirs.create("graft-compact-dest") + "/out"
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.repartition(40).write.mode("overwrite").parquet(src)

    val totalBytes = Compaction.listFiles(spark, src)
      .agg(sum("bytes")).as[Long].head()
    val target = totalBytes / 5 // ~5 bins over 40 files, all multi-file
    val res = Compaction.compact(spark, src, dest, target)

    assert(res.filesRewritten == 40 && res.filesKept == 0)
    assert(res.binsRewritten >= 4 && res.binsRewritten <= 7,
      s"expected ~5 bins, got ${res.binsRewritten}")
    assert(res.bytesRewritten == totalBytes)

    // exactly ONE file per bin, hash collisions notwithstanding
    val outFiles = Compaction.listFiles(spark, dest)
      .as[(String, Long)].collect()
    assert(outFiles.length == res.binsRewritten,
      s"one file per bin: ${outFiles.length} vs ${res.binsRewritten}")

    // content identical (the __bin partition column is layout metadata)
    val out = spark.read.parquet(dest).drop("__bin")
    assert(out.exceptAll(docs).isEmpty && docs.exceptAll(out).isEmpty,
      "compacted content must equal the source rows exactly")
  }

  test("compact: 5k-file manifest never lands in the plan as literals") {
    val src = TempDirs.create("graft-compact-5k")
    // 5000 single-row files — the small-file pathology at spec scale
    spark.range(0, 5000, 1, 5000).write.mode("overwrite").parquet(src)
    val manifest = Compaction.listFiles(spark, src)
    val nFiles = manifest.count()
    assert(nFiles == 5000L, s"expected 5000 data files, got $nFiles")

    val planned = Compaction.plan(manifest,
      manifest.agg(sum("bytes")).as[Long].head() / 10) // ~10 bins
    val binFrame = planned
      .select(col("path").as("__path"),
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy("bin")).cast("int").as("__bin"))
    val paths = planned.select("path").as[String].collect().toSeq
    val tagged = Compaction.taggedData(spark, paths,
      binFrame.as[(String, Int)].map(identity).toDF("__path", "__bin"))

    // With the broadcast join, file paths live ONLY in the scan's file
    // index (elided in the plan string) — a typedlit map would print all
    // 5000 paths into the expression tree (~400 KB). Bound the whole
    // optimized plan and count path echoes directly.
    val planStr = tagged.queryExecution.optimizedPlan.toString
    assert(planStr.length < 50000,
      s"plan string must be O(1) in manifest size, got ${planStr.length}")
    assert("part-".r.findAllIn(planStr).size < 50,
      "per-file path literals must not appear in the plan")

    // and the join itself is a broadcast, not a shuffle
    val phys = tagged.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"path->bin tagging must broadcast; got:\n$phys")
  }

  test("compact: all-singleton layout is a metadata no-op (nothing read)") {
    val src = TempDirs.create("graft-compact-noop")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .repartition(4).write.mode("overwrite").parquet(src)
    val sizes = Compaction.listFiles(spark, src).as[(String, Long)].collect()
    // target below every file's size -> every bin is a singleton
    val res = Compaction.compact(spark, src, src + "-dest",
      sizes.map(_._2).min)
    assert(res == Compaction.CompactResult(4L, 0L, 0L, 0L))
    assert(!new java.io.File(src + "-dest").exists(),
      "no-op compaction must not write a destination")
  }
}
