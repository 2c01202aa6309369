package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ViterbiTokenize

/** Unigram-LM Viterbi serving: the DP's segmentations are OPTIMAL —
  * certified against brute-force enumeration of every segmentation on
  * the real corpus vocabulary — plus pinned tie-breaks, unknown-char
  * behavior, and the length conservation law.
  */
class ViterbiSpec extends SparkSpec {
  import spark.implicits._

  test("corpus max word length stays inside the oracle's enumeration budget") {
    // the q_unigram_viterbi / q_tokenizer_compare DuckDB oracles
    // enumerate EVERY composition of each distinct word into pieces of
    // length 1-4 — ~1.93^len rows per word, exponential in word length.
    // Fine at the corpus's observed max (8 chars, ~40 rows/word); one
    // regenerated long token (URL, hash, 40+ chars) would blow the
    // oracle and the brute-force parity test up identically. Pin the
    // budget here so a corpus regeneration fails THIS named test
    // instead of hanging the sweep: 16 chars ~= 37k enumerated rows per
    // word, still trivially cheap.
    for (dir <- Seq(sf0001, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val d = graft.Tables.table(spark, dir, "documents")
      val mx = d.select(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.array_max(
            org.apache.spark.sql.functions.transform(
              graft.ops.llm.TextOps.tokens(d("text")),
              w => org.apache.spark.sql.functions.length(w)))))
        .head().getInt(0)
      assert(mx <= 16,
        s"$dir: max word length $mx exceeds the Viterbi oracle's " +
          "enumeration budget — cap the oracle's word set or rewrite it " +
          "as a per-position DP CTE before re-running the sweep")
    }
  }

  private def tokenize(words: Seq[String], vocab: Seq[(String, Long)],
      unk: Long = 999999L): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), ViterbiTokenize(col("w"), vocab, unk).as("p"))
      .as[(String, Seq[String])].collect().toMap

  /** Brute-force reference: enumerate EVERY segmentation into vocab
    * pieces (+ single unknown chars at `unk`), return the minimum by
    * (total cost, path joined with U+0001 compared by UTF-8 bytes) —
    * the oracle's definition, independent of the DP.
    */
  private def bruteBest(word: String, cost: Map[String, Long],
      unk: Long): (Long, Seq[String]) = {
    val maxLen = if (cost.isEmpty) 1 else cost.keysIterator.map(_.length).max
    def segs(pos: Int): Seq[(Long, List[String])] =
      if (pos == word.length) Seq((0L, Nil))
      else (1 to math.min(maxLen, word.length - pos)).flatMap { l =>
        val piece = word.substring(pos, pos + l)
        val c = cost.get(piece)
          .orElse(if (l == 1) Some(unk) else None)
        c.toSeq.flatMap(pc =>
          segs(pos + l).map { case (sc, sp) => (pc + sc, piece :: sp) })
      }
    // tie key: path joined with U+0001, compared on UTF-8 bytes
    // (fixed-width decimal encoding makes String order == byte order)
    val best = segs(0).minBy { case (c, p) =>
      (c, p.mkString("\u0001").getBytes("UTF-8")
        .map(b => f"${b & 0xff}%03d").mkString)
    }
    (best._1, best._2)
  }

  test("minimal-cost segmentation beats greedy longest-match") {
    // "aab" with costs making the 1+2 split cheaper than greedy's 2+1:
    // greedy (PieceTokenize) takes "aa" first; Viterbi pays less with
    // a + ab
    val v = Seq("a" -> 10L, "b" -> 10L, "aa" -> 50L, "ab" -> 5L)
    assert(tokenize(Seq("aab"), v)("aab") == Seq("a", "ab"))
    // and when the long piece IS cheap, Viterbi takes it
    val v2 = Seq("a" -> 10L, "b" -> 10L, "aa" -> 1L, "ab" -> 50L)
    assert(tokenize(Seq("aab"), v2)("aab") == Seq("aa", "b"))
  }

  test("cost ties break on the U+0001-joined path, byte-lexicographic") {
    // both splits of "abc" cost 20; path "a<sep>bc" < "ab<sep>c" because
    // the separator byte sorts below 'b'
    val v = Seq("a" -> 10L, "bc" -> 10L, "ab" -> 10L, "c" -> 10L)
    assert(tokenize(Seq("abc"), v)("abc") == Seq("a", "bc"))
  }

  test("unknown chars pass through as single-char pieces at unkCost; never multi-char") {
    val v = Seq("a" -> 5L, "ab" -> 3L)
    val got = tokenize(Seq("xaby", "zz"), v, unk = 100L)
    assert(got("xaby") == Seq("x", "ab", "y"))
    assert(got("zz") == Seq("z", "z"))
    // unk is charged per char: with a cheap known piece available the DP
    // still prefers it (ab at 3 beats a + unk b at 105)
    assert(tokenize(Seq("ab"), v, unk = 100L)("ab") == Seq("ab"))
  }

  test("DP segmentations are optimal: brute-force enumeration parity on the real corpus") {
    val docs = graft.Tables.table(spark, sf0001, "documents")
    val w = WordPiece.wordFreq(docs, "text")
    val costs = Unigram.vocabCosts(w)
    val costMap = costs.toMap
    val unk = costs.iterator.map(_._2).max + 10000L
    val words = w.select("word").as[String].collect().toSeq
    assert(words.nonEmpty)
    val got = tokenize(words, costs, unk)
    words.foreach { word =>
      val (bc, bp) = bruteBest(word, costMap, unk)
      val gp = got(word)
      assert(gp == bp,
        s"'$word': DP gave $gp, brute-force minimum is $bp")
      assert(gp.map(costMap(_)).sum == bc)
    }
  }

  test("conservation: piece occurrences reproduce the corpus character mass") {
    val docs = graft.Tables.table(spark, sf0001, "documents")
    val pf = Unigram.pieceFrequencies(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val w = WordPiece.wordFreq(docs, "text").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(pf.map { case (p, occ) => p.length.toLong * occ }.sum ==
      w.map { case (wd, f) => wd.length.toLong * f }.sum,
      "sum(occ * len(piece)) must equal sum(freq * len(word))")
  }
}
