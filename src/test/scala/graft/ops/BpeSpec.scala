package graft.ops

import graft.SparkSpec
import graft.ops.llm.Bpe

/** BPE merge-training semantics pinned on hand-computable corpora: the
  * argmax/tie-break order, the greedy left-to-right merge law (the
  * double-space replace trick), end-marker participation, and
  * degenerate inputs.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("three merges on 'aa aa ab' follow count-then-lexicographic argmax") {
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    // words: aa×2, ab×1. Pairs it1: (a a)=2, (a </w>)=2, (a b)=1,
    // (b </w>)=1 — tie at 2 broken lexicographically: "a </w>" < "a a".
    // it2: "a a</w>"=2 beats the ab-word pairs. it3: "a b"=1 < "b </w>"
    // lexicographically at the tie.
    assert(Bpe.train(docs, "text", 3) == Seq(
      (1, "a </w>", 2L), (2, "a a</w>", 2L), (3, "a b", 1L)))
  }

  test("merges apply greedily left-to-right: 'aaa' merges the FIRST two") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val st = Bpe.applyMerges(docs, "text", Seq("a a")).collect()
    assert(st.length == 1)
    assert(st(0).getAs[String]("s") == "  aa  a  </w>  ",
      "left-to-right non-overlapping: (aa, a), never (a, aa)")
  }

  test("token counts after zero merges are weighted char+marker counts") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val counts = Bpe.tokenCounts(Bpe.applyMerges(docs, "text", Nil))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ab×2 → a:2 b:2 </w>:2; b×1 → b:1 </w>:1
    assert(counts == Map("a" -> 2L, "b" -> 3L, "</w>" -> 3L))
  }

  test("empty corpus trains zero merges without failing") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.train(docs, "text", 3).isEmpty)
  }

  test("trainChained is row-identical to train (the no-collect scale form)") {
    val docs = Seq((1L, "aa aa ab"), (2L, "low lower lowest"),
      (3L, "aa low ab")).toDF("doc_id", "text")
    val looped = Bpe.train(docs, "text", 4)
    val chained = Bpe.trainChained(docs, "text", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(chained == looped,
      "the 1-row-DataFrame argmax chain must replay the driver loop exactly")
  }

  test("trainChained past pair exhaustion emits only the available merges") {
    // one single-char word: it1 merges (a </w>); afterwards the state is
    // one token per word, the pair table is empty, and iterations 2..3
    // must emit nothing (train()'s break), not fail
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val rows = Bpe.trainChained(docs, "text", 3).collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "a </w>", 1L)))
  }

  test("train leaves no pinned RDDs behind") {
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Bpe.train(docs, "text", 3)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"unpersist must reclaim checkpoints: $leaked")
  }
}
