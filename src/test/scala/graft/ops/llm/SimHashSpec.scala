package graft.ops.llm

import graft.SparkSpec

/** SimHash semantics: identical docs → identical hash; a one-token edit
  * moves few of the 64 bits; unrelated docs differ in many bits.
  */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private val base = ("spark shuffle partition codegen catalyst tungsten " +
    "dataset column row batch stage executor").trim
  private val tweaked = base.replace("executor", "driver")
  private val unrelated =
    "pasta tomato basil olive oil garlic parmesan oven plate dinner kitchen"

  private def hashes: Map[Long, String] = {
    val d = Seq((1L, base), (2L, base), (3L, tweaked), (4L, unrelated))
      .toDF("doc_id", "text")
    d.select(d("doc_id"), SimHash.simhashBits("text").as("h"))
      .as[(Long, String)].collect().toMap
  }

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  test("64-bit simhash: identity, locality, separation") {
    val h = hashes
    assert(h.values.forall(_.length == 64))
    assert(hamming(h(1L), h(2L)) == 0)
    val near = hamming(h(1L), h(3L))
    val far = hamming(h(1L), h(4L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16, s"one-token edit moved $near bits")
  }

  test("nearDuplicates finds close pairs via band buckets, skips far ones") {
    val docs = Seq((1L, base), (2L, base), (3L, tweaked), (4L, unrelated))
      .toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicates(docs, "doc_id", "text",
        maxHamming = 16, bands = 32)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "identical docs must pair (dist 0)")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"one-token edit must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("hamming helper agrees with scala reference") {
    val d = Seq(("1010", "1001")).toDF("a", "b")
    val out = d.select(SimHash.hamming(d("a"), d("b"))).as[Int].head()
    assert(out == 2)
  }

  test("sha variant: banded pairs equal brute-force all-pairs") {
    val docs = Seq((1L, base), (2L, base), (3L, tweaked), (4L, unrelated),
        (5L, base + " extra"), (6L, unrelated + " words"))
      .toDF("doc_id", "text")
    val maxH = 5
    val banded = SimHash.nearDuplicatesSha(docs, "doc_id", "text",
        maxHamming = maxH, bands = 6)
      .select("a", "b", "dist").as[(Long, Long, Int)].collect().toSet
    // brute force over the same 60-bit hashes
    val hs = docs.select(docs("doc_id"),
        SimHash.simhashSha("text").as("h"))
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= maxH
    } yield (a, b, d)).toSet
    assert(banded == brute,
      s"banded=$banded brute=$brute — LSH banding must be exact-complete")
    assert(brute.exists { case (a, b, d) => d == 0 },
      "identical docs must appear at distance 0")
  }
}
