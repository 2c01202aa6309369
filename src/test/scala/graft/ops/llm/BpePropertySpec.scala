package graft.ops.llm

import graft.SparkSpec

/** Property test: the distributed BPE trainer (double-space literal-
  * replace merges over the word-count table) must agree merge-for-merge
  * with a plain-Scala reference implementation of greedy BPE on random
  * corpora — the guard that the string-replace reduction IS greedy BPE,
  * not something that merely matches on friendly inputs. Small alphabet
  * + short words maximize adjacent-merge and repeated-token collisions
  * (the `a a a` class of edge cases).
  */
class BpePropertySpec extends SparkSpec {
  import spark.implicits._

  // -- plain-Scala greedy BPE reference -----------------------------------
  private def mergeTokens(toks: Vector[String], a: String, b: String)
  : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(wordCounts: Map[String, Long], k: Int)
  : Seq[(Int, String, Long)] = {
    var st: Seq[(Vector[String], Long)] = wordCounts.toSeq.map {
      case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c
    }
    val merges = Seq.newBuilder[(Int, String, Long)]
    var it = 1
    var done = false
    while (it <= k && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      st.foreach { case (toks, c) =>
        toks.iterator.sliding(2).withPartial(false).foreach { p =>
          val key = (p.head, p(1))
          pc(key) = pc.getOrElse(key, 0L) + c
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((x, y), c) =>
          (-c, s"$x $y")
        }
        merges += ((it, s"$a $b", cnt))
        st = st.map { case (toks, c) => mergeTokens(toks, a, b) -> c }
        it += 1
      }
    }
    merges.result()
  }

  private def randomCorpus(seed: Long): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    val alphabet = "ab"
    def word() = Seq.fill(1 + r.nextInt(4))(
      alphabet(r.nextInt(alphabet.length))).mkString
    (1L to (1 + r.nextInt(4)).toLong).map { id =>
      id -> Seq.fill(1 + r.nextInt(6))(word()).mkString(" ")
    }
  }

  test("train agrees with the plain-Scala greedy BPE reference") {
    (1L to 8L).foreach { seed =>
      val corpus = randomCorpus(seed)
      val counts = corpus.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = refBpe(counts, 3)
      val got = Bpe.train(corpus.toDF("doc_id", "text"), "text", 3)
      assert(got == expected,
        s"seed $seed: got=$got expected=$expected corpus=$corpus")
    }
  }
}
