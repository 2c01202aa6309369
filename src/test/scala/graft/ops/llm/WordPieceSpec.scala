package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PieceTokenize

/** WordPiece greedy longest-match serving: exact segmentation on a
  * synthetic vocab, parity with a plain-Scala greedy reference on the
  * real corpus, and the length conservation law.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def tokenize(words: Seq[String], vocab: Seq[String])
      : Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), PieceTokenize(col("w"), vocab).as("p"))
      .as[(String, Seq[String])].collect().toMap

  /** The spec's independent greedy reference (plain Scala). */
  private def greedyRef(word: String, vocab: Set[String]): Seq[String] = {
    val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val len = (math.min(maxLen, word.length - pos) to 1 by -1)
        .find(l => vocab.contains(word.substring(pos, pos + l)))
      len match {
        case Some(l) => out += word.substring(pos, pos + l); pos += l
        case None => out += word.substring(pos, pos + 1); pos += 1
      }
    }
    out.result()
  }

  test("greedy longest-match picks the longest piece at each position") {
    val vocab = Seq("a", "b", "c", "ab", "bc", "abc")
    val got = tokenize(Seq("abcab", "cabc", "bcbc", "a"), vocab)
    assert(got("abcab") == Seq("abc", "ab"))
    assert(got("cabc") == Seq("c", "abc"))
    assert(got("bcbc") == Seq("bc", "bc"))
    assert(got("a") == Seq("a"))
  }

  test("an unmatched character passes through as a single-char piece") {
    val got = tokenize(Seq("xay", "zzz"), Seq("a"))
    assert(got("xay") == Seq("x", "a", "y"))
    assert(got("zzz") == Seq("z", "z", "z"))
  }

  test("greedy is NOT optimal-match: longest-first can fragment the tail") {
    // classic MaxMatch behavior worth pinning: "aab" with {aa, ab, a, b}
    // takes "aa" first and leaves "b", never the 1+2 split
    val got = tokenize(Seq("aab"), Seq("aa", "ab", "a", "b"))
    assert(got("aab") == Seq("aa", "b"))
  }

  test("parity with the plain-Scala reference on the real corpus vocab") {
    val docs = graft.Tables.table(spark, sf0001, "documents")
    val words = WordPiece.wordFreq(docs, "text")
    val vocab = WordPiece.vocab(words)
    // vocab covers every corpus char, so serving never hits pass-through
    val vset = vocab.toSet
    val ws = words.select("word").as[String].collect()
    val got = tokenize(ws.toSeq, vocab)
    ws.foreach { w =>
      assert(got(w) == greedyRef(w, vset), s"mismatch on '$w'")
      assert(got(w).mkString == w, s"pieces must concat back to '$w'")
    }
    // vocab determinism across recomputation
    assert(WordPiece.vocab(WordPiece.wordFreq(docs, "text")) == vocab)
  }

  test("length conservation: piece lengths weighted by occurrences cover the corpus") {
    val docs = graft.Tables.table(spark, sf0001, "documents")
    val pieces = WordPiece.pieceFrequencies(docs, "text")
    val got = pieces
      .agg(sum(length(col("piece")) * col("occurrences"))).as[Long].head()
    val expected = WordPiece.wordFreq(docs, "text")
      .agg(sum(length(col("word")) * col("freq"))).as[Long].head()
    assert(got == expected && got > 0L)
  }
}
