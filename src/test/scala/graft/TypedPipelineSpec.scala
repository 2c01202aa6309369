package graft

import graft.model._

/** Typed facade: the Dataset[T] layer must agree with the untyped
  * pipeline and round-trip the case-class schemas.
  */
class TypedPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("typed batchCounts + merge + topCompletions agree with untyped") {
    val lines = Seq(LogLine("how to train"), LogLine("how to train"),
      LogLine("how to bake")).toDS()
    val counts = TypedPipeline.batchCounts(lines)
    assert(counts.filter(_.prefix == "how to t").head() ==
      PrefixCount("how to t", "how to train", 2L))

    val merged = TypedPipeline.merge(counts, counts)
    assert(merged.filter(_.prefix == "how to t").head().frequency == 4L)

    val top = TypedPipeline.topCompletions(merged, 5)
    val howTo = top.filter(_.prefix == "how to").head()
    // frequency 4 vs 2 → train first; JSON array in rank order
    assert(howTo.completions == """["how to train","how to bake"]""")
  }

  test("groupByKey + mapGroups: custom per-group logic escape hatch") {
    // per-user "session fingerprint": ordered event types joined — the
    // kind of arbitrary per-group computation that has no SQL form
    val events = Seq((1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 5L, "view"), (1L, 30L, "buy")).toDS()
    val out = events.groupByKey(_._1)
      .mapGroups { (user, it) =>
        val path = it.toSeq.sortBy(_._2).map(_._3).mkString(">")
        (user, path)
      }.collect().toMap
    assert(out(1L) == "view>click>buy")
    assert(out(2L) == "view")
  }

  test("cogroup: keyed reconciliation of two datasets") {
    // reconcile state vs delta per key without materializing a join row
    // per pair — cogroup hands both sides' iterators to one function
    val state = Seq(("ab", 3L), ("cd", 1L)).toDS().groupByKey(_._1)
    val delta = Seq(("ab", 2L), ("ef", 7L)).toDS().groupByKey(_._1)
    val merged = state.cogroup(delta) { (k, s, d) =>
      Iterator((k, s.map(_._2).sum + d.map(_._2).sum))
    }.collect().toMap
    assert(merged == Map("ab" -> 5L, "cd" -> 1L, "ef" -> 7L))
  }
}
