package graft.ops.llm

import graft.SparkSpec

/** Entity templating: dictionary hits become tags, everything else
  * passes through lowercased, token order survives reassembly.
  */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq(
    "docker" -> "APPLICATION", "linux" -> "OS", "ubuntu" -> "OS")
    .toDF("surface", "tag")

  test("reference example: recognized spans become type tags") {
    val docs = Seq((1L, "How to install Docker in Linux"))
      .toDF("doc_id", "text")
    val out = Entities.template(docs, "doc_id", "text", dict)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "how to install APPLICATION in OS")
  }

  test("unmatched tokens pass through; order and repeats survive") {
    val docs = Seq(
      (1L, "  ubuntu or linux or ubuntu  "),
      (2L, "no entities here"),
      (3L, "")).toDF("doc_id", "text")
    val out = Entities.template(docs, "doc_id", "text", dict)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "OS or OS or OS")
    assert(out(2L) == "no entities here")
    assert(out(3L) == "")
    assert(out.size == 3, "every doc must survive the reassembly")
  }

  test("dictionary join is a broadcast, reassembly is one exchange") {
    val docs = Seq((1L, "docker linux")).toDF("doc_id", "text")
    val p = Entities.template(docs, "doc_id", "text", dict)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"dictionary must broadcast, not shuffle the token stream:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled:\n$p")
  }
}
