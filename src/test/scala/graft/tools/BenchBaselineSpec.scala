package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Keeps BENCH_BASELINE.json honest: every declared query must carry an
  * expected-median entry (a new query without a baseline turns this red,
  * so the perf gate in tools/bench_gate.py can never silently skip it),
  * and stale entries for deleted queries must be pruned.
  */
class BenchBaselineSpec extends AnyFunSuite {

  private lazy val baseline: Map[String, Double] = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_BASELINE.json")), "UTF-8")
    val qsStart = raw.indexOf("\"queries\"")
    assert(qsStart >= 0, "BENCH_BASELINE.json must have a queries object")
    "\"([a-z0-9_]+)\"\\s*:\\s*([0-9.]+)".r
      .findAllMatchIn(raw.substring(qsStart))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  test("every declared query has a baseline median") {
    val missing = SparkEntry.queries.keySet -- baseline.keySet
    assert(missing.isEmpty,
      s"add 3-run medians to BENCH_BASELINE.json for: ${missing.toSeq.sorted}")
  }

  test("no stale baselines for queries that no longer exist") {
    val stale = baseline.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"prune stale BENCH_BASELINE.json entries: ${stale.toSeq.sorted}")
  }

  test("baseline medians are positive and plausibly sized") {
    baseline.foreach { case (name, sec) =>
      assert(sec > 0 && sec < 120, s"$name baseline $sec s out of range")
    }
  }
}
