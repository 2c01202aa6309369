package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking (TextOps.cdcChunks / Dedup.cdcDupStats):
  * the reason CDC exists is shift robustness — a one-token insertion at
  * the head of a copy must leave most chunk digests intact (boundaries
  * re-align to content), where fixed-width chunks all shift out of phase.
  * Both halves of that contrast are pinned here, plus the segmentation
  * invariants (chunks concatenate back to the token stream; boundary rule
  * matches a plain-Scala replay).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // long enough for several 1/16-probability boundaries: ~120 tokens
  private val body: String = (1 to 120)
    .map(i => s"tok${i * 7 % 101}w${i}")
    .mkString(" ")

  private def chunksOf(text: String): Seq[String] =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(TextOps.cdcChunks(col("text"))).as("c"))
      .as[String].collect().toSeq

  /** Plain-Scala replay of the boundary rule: cut after token j when
    * sha256 of the ≤3-token window ending at j starts with '0'.
    */
  private def scalaChunks(text: String): Seq[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex0(s: String): Boolean = {
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) == 0
    }
    val cuts = (1 until toks.length).filter { j =>
      hex0(toks.slice(math.max(j - 3, 0), j).mkString(" "))
    }
    val starts = 0 +: cuts
    val ends = cuts.map(_ - 1) :+ (toks.length - 1)
    starts.zip(ends).map { case (a, b) => toks.slice(a, b + 1).mkString(" ") }
  }

  test("codegen CdcChunks ≡ composed-HOF reference form") {
    val texts = Seq(body, "inserted " + body, "word", "", "a b c d e",
      (1 to 40).map(_ => "same").mkString(" "))
    val df = texts.map(Tuple1(_)).toDF("text")
    val both = df.select(
        graft.functions.CdcChunks(col("text")).as("fast"),
        TextOps.cdcChunks(col("text")).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("chunks concatenate back to the token stream") {
    val ch = chunksOf(body)
    assert(ch.nonEmpty)
    assert(ch.mkString(" ") == body.toLowerCase)
  }

  test("boundary rule matches the plain-Scala replay") {
    assert(chunksOf(body) == scalaChunks(body))
  }

  test("CDC digests survive a head insertion; fixed-width chunks do not") {
    val shifted = "inserted " + body
    val a = chunksOf(body).toSet
    val b = chunksOf(shifted).toSet
    // all chunks after the first boundary re-align: at most the leading
    // chunk (the one containing the insertion) differs
    val shared = a.intersect(b).size
    assert(shared >= a.size - 1,
      s"CDC lost ${a.size - shared} of ${a.size} chunks to a 1-token shift")

    def fixed(text: String): Set[String] =
      Seq(Tuple1(text)).toDF("text")
        .select(explode(TextOps.tokenChunks(col("text"), 10)).as("c"))
        .as[String].collect().toSet
    // the same insertion shifts every 10-token block out of phase
    assert(fixed(body).intersect(fixed(shifted)).isEmpty)
  }

  test("cdcDupStats flags the shifted copy's shared chunks corpus-wide") {
    val docs = Seq((1L, body), (2L, "inserted " + body),
      (3L, "totally unrelated words about cooking fresh pasta tonight"))
      .toDF("doc_id", "text")
    val out = Dedup.cdcDupStats(docs, "doc_id", "text")
      .select("doc_id", "n_chunks", "dup_chunks")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // docs 1 and 2 share all re-aligned chunks; doc 3 shares none
    assert(out(1L)._2 >= out(1L)._1 - 1)
    assert(out(2L)._2 >= out(2L)._1 - 2) // leading chunk + insertion chunk
    assert(out(3L)._2 == 0L)
  }

  test("single-token and empty docs yield one chunk, no crash") {
    assert(chunksOf("word") == Seq("word"))
    assert(chunksOf("").size == 1)
  }
}
