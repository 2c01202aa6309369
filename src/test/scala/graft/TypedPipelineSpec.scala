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
}
