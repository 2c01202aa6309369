package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Keeps SURVEY.md honest the way BenchBaselineSpec keeps
  * BENCH_BASELINE.json honest: SURVEY is the blueprint a fresh context
  * reads, so every query in the live registry must have a row (a new
  * operator landing without documentation turns this red at the same
  * commit), and the document must not advertise queries that no longer
  * exist.
  */
class SurveyCoverageSpec extends AnyFunSuite {

  private lazy val surveyed: Set[String] = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    "`(q_[a-z0-9_]+)`".r.findAllMatchIn(raw).map(_.group(1)).toSet
  }

  test("every declared query has a SURVEY.md row") {
    val missing = SparkEntry.queries.keySet -- surveyed
    assert(missing.isEmpty,
      s"add SURVEY.md rows for: ${missing.toSeq.sorted}")
  }

  test("no SURVEY.md query reference is stale") {
    val stale = surveyed -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"SURVEY.md references queries that no longer exist: ${stale.toSeq.sorted}")
  }
}
