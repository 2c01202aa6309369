package graft.ops.llm

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the dedup pipeline against plain-Scala references
  * (seeded Gen sampling — the scalatest-scalacheck bridge isn't available
  * offline):
  *
  *  - connectedComponents vs a driver-side union-find on random graphs:
  *    the distributed min-label propagation + pointer jumping must land
  *    every node on its component's minimum id;
  *  - PPJoin-filtered ngramJaccardPairs vs the naive all-pairs scan on
  *    random near-dup corpora: prefix filtering is a pure pruning
  *    optimization and must never change the result set.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  // -- union-find reference ------------------------------------------------
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElse(a, { parent(a) = a; a })
      parent.getOrElse(b, { parent(b) = b; b })
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] = Gen.listOf(for {
    a <- Gen.chooseNum(1L, 40L)
    b <- Gen.chooseNum(1L, 40L) if a != b
  } yield (math.min(a, b), math.max(a, b)))

  test("connectedComponents equals union-find on random graphs") {
    (1L to 5L).foreach { s =>
      val edges = genEdges(Gen.Parameters.default, Seed(s)).getOrElse(Nil)
        .distinct
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        val got = Dedup.connectedComponents(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        assert(got == expected,
          s"seed $s: cc=$got expected=$expected edges=$edges")
      }
    }
  }

  // -- naive Jaccard reference --------------------------------------------
  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size <= n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def naivePairs(docs: Seq[(Long, String)], n: Int,
                         num: Int, den: Int): Set[(Long, Long, Int, Int)] =
    (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = shingleSet(ta, n); sb = shingleSet(tb, n)
      inter = (sa intersect sb).size
      uni = sa.size + sb.size - inter
      if inter * den >= uni * num
    } yield (a, b, inter, uni)).toSet

  private val words =
    Vector("spark", "shuffle", "codegen", "catalyst", "executor", "row",
      "batch", "stage", "column", "plan")

  private def genDoc(seed: Long, i: Int): String = {
    val r = new scala.util.Random(seed * 1000 + i)
    // near-dup families: base docs + small perturbations
    val len = 6 + r.nextInt(6)
    (0 until len).map(_ => words(r.nextInt(words.size))).mkString(" ")
  }

  test("PPJoin prefix filtering never changes the Jaccard result set") {
    (1L to 3L).foreach { s =>
      val r = new scala.util.Random(s)
      val bases = (0 until 8).map(i => genDoc(s, i))
      // each base plus 1-2 near copies (one word swapped)
      val docs = bases.zipWithIndex.flatMap { case (d, i) =>
        val copy = {
          val t = d.split(" ")
          t(r.nextInt(t.length)) = words(r.nextInt(words.size))
          t.mkString(" ")
        }
        Seq((i * 10L, d), (i * 10L + 1, d), (i * 10L + 2, copy))
      }
      val expected = naivePairs(docs, n = 3, num = 6, den = 10)
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, num = 6, den = 10)
        .as[(Long, Long, Int, Int)].collect().toSet
      assert(got == expected,
        s"seed $s: ppjoin=${got.size} naive=${expected.size} diff=" +
          s"${(got diff expected) ++ (expected diff got)}")
    }
  }

  // -- naive containment reference ----------------------------------------
  private def naiveContainment(docs: Seq[(Long, String)], n: Int,
                               num: Int, den: Int)
      : Set[(Long, Long, Int, Int)] =
    (for {
      (a, ta) <- docs; (b, tb) <- docs if a != b
      sa = shingleSet(ta, n); sb = shingleSet(tb, n)
      inter = (sa intersect sb).size
      if inter * den >= sa.size * num
    } yield (a, b, inter, sa.size)).toSet

  test("containment prefix filter never changes the result set") {
    (1L to 3L).foreach { s =>
      val bases = (0 until 6).map(i => genDoc(s, i))
      // excerpts embedded in larger docs (the asymmetric case), exact
      // copies (both directions must appear), unrelated docs, tiny docs
      // (single-shingle sets stress the prefix-size floor)
      val docs = bases.zipWithIndex.flatMap { case (d, i) =>
        val container = d + " " + genDoc(s + 7, i)
        Seq((i * 10L, d), (i * 10L + 1, container),
          (i * 10L + 2, d), (i * 10L + 3, genDoc(s + 13, i)))
      } ++ Seq((900L, "tiny"), (901L, "spark"))
      val expected = naiveContainment(docs, n = 3, num = 8, den = 10)
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, num = 8, den = 10)
        .as[(Long, Long, Int, Int)].collect().toSet
      assert(got == expected,
        s"seed $s: got=${got.size} naive=${expected.size} diff=" +
          s"${(got diff expected) ++ (expected diff got)}")
    }
  }

  // -- naive Levenshtein reference -----------------------------------------
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("Ed-Join q-gram prefix filter never changes the edit-distance set") {
    (1L to 3L).foreach { s =>
      val r = new scala.util.Random(s)
      val bases = (0 until 8).map(i => genDoc(s, i))
      val docs = bases.zipWithIndex.flatMap { case (d, i) =>
        val chars = d.toCharArray
        chars(r.nextInt(chars.length)) = 'z'
        Seq((i * 10L, d), (i * 10L + 1, d),          // exact dup
          (i * 10L + 2, new String(chars)))          // 1-char edit
      } ++ Seq((900L, "ab"), (901L, "abcd"), (902L, "xy"), // tiny strings
        // the q+maxDist..q*(maxDist+1) band where the gram-survival
        // bound does NOT hold (maxDist edits can destroy every q-gram):
        (903L, "abcde"), (904L, "abzde"),                 // len 5, dist 1
        (905L, "abcdefgh"), (906L, "azcdezgh"),           // len 8, dist 2
        (907L, "qrstuvwxy"), (908L, "qrZtuZwxZ"),         // len 9, dist 3
        // small×big-fringe pairs straddling the smallCut boundary
        // (len 11 has 9 < q*maxDist+1 = 10 grams; len 12-13 are big):
        (909L, "hello world"), (910L, "hello worlds"),    // 11 vs 12
        (911L, "hello worldZZ"),                          // 11 vs 13, dist 2
        (912L, "hello"), (913L, "hello"))                 // dup small strings
      val maxD = 3
      def norm(t: String) = t.trim.toLowerCase.take(24)
      val expected = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        dist = lev(norm(ta), norm(tb)) if dist <= maxD
      } yield (a, b, dist)).toSet
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", q = 3, maxDist = maxD, prefixChars = 24)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected,
        s"seed $s: got=${got.size} naive=${expected.size} diff=" +
          s"${(got diff expected) ++ (expected diff got)}")
    }
  }

  test("editDistancePairs default params: short-string band is complete") {
    // q=3, maxDist=2 => gram bound holds only for len >= 9; strings of
    // length 5..8 can lose every 3-gram to 2 edits. 'abcde' vs 'abzde'
    // (dist 1, zero shared 3-grams) is the canonical miss of a
    // q+maxDist cutoff; the len-8 vs len-10 pair crosses small×big.
    val docs = Seq(
      (1L, "abcde"), (2L, "abzde"),                    // len 5, dist 1
      (3L, "abcdefgh"), (4L, "abZdeZgh"),              // len 8, dist 2
      (5L, "abcdefgh"),                                // dup of 3
      (6L, "abcdefghij"),                              // len 10 (big)
      (7L, "abcdefgh__"), (8L, ""), (9L, "a"),         // fringe + empties
      (10L, "completely different text here"))
    def lev2(a: String, b: String) = lev(a, b)
    val expected = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      la = ta.trim.toLowerCase.take(64); lb2 = tb.trim.toLowerCase.take(64)
      dist = lev2(la, lb2) if dist <= 2
    } yield (a, b, dist)).toSet
    val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", q = 3, maxDist = 2, prefixChars = 64)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected,
      s"got=${got.size} naive=${expected.size} diff=" +
        s"${(got diff expected) ++ (expected diff got)}")
  }

  test("editDistancePairs equals brute force on random danger-zone strings") {
    // randomized sweep concentrated on lengths 0..2·smallCut where the
    // gram bound, the small-string band, and the fringe all interact —
    // tiny alphabet so edits collide and matches are dense
    val alpha = "abc"
    (1L to 5L).foreach { seed =>
      val r = new scala.util.Random(seed)
      val docs = (0 until 60).map { i =>
        val len = r.nextInt(19) // 0..18 covers small, fringe, big at q=3,d=2
        (i.toLong, Seq.fill(len)(alpha(r.nextInt(alpha.length))).mkString)
      }
      val expected = (for {
        (a, ta) <- docs; (b, tb) <- docs if a < b
        dist = lev(ta, tb) if dist <= 2
      } yield (a, b, dist)).toSet
      val got = Dedup.editDistancePairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", q = 3, maxDist = 2, prefixChars = 64)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected,
        s"seed $seed: got=${got.size} naive=${expected.size} diff=" +
          s"${(got diff expected) ++ (expected diff got)}")
    }
  }

  test("substringDupStats equals the naive cross-doc shingle count") {
    (1L to 3L).foreach { s =>
      val docs = (0 until 12).map(i => (i.toLong, genDoc(s, i / 2)))
      val n = 3
      // naive reference: distinct n-gram sets per doc, count shingles
      // present in any OTHER doc's set
      def shingles(t: String): Set[String] = {
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        (if (toks.size <= n) Seq(toks.mkString(" "))
         else toks.sliding(n).map(_.mkString(" ")).toSeq).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
      val expected = docs.map { case (id, _) =>
        val mine = sets(id)
        val dup = mine.count(g =>
          sets.exists { case (o, st) => o != id && st(g) })
        id -> ((mine.size.toLong, dup.toLong))
      }.toMap
      val got = Dedup.substringDupStats(docs.toDF("doc_id", "text"),
          "doc_id", "text", n)
        .select("doc_id", "n_shingles", "dup_shingles")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected,
        s"seed $s: diff=${(got.toSet diff expected.toSet) ++
          (expected.toSet diff got.toSet)}")
    }
  }

  test("chunkDupStats equals the naive corpus-multiplicity chunk count") {
    (1L to 3L).foreach { s =>
      val docs = (0 until 12).map(i => (i.toLong, genDoc(s, i / 2)))
      val w = 3
      def chunks(t: String): Seq[String] = {
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        (0 until toks.size / w).map(i =>
          toks.slice(i * w, i * w + w).mkString(" "))
      }
      val all = docs.flatMap { case (_, t) => chunks(t) }
        .groupBy(identity).map { case (c, occ) => c -> occ.size }
      val expected = docs.flatMap { case (id, t) =>
        val cs = chunks(t)
        if (cs.isEmpty) None
        else Some(id -> ((cs.size.toLong,
          cs.count(c => all(c) > 1).toLong)))
      }.toMap
      val got = Dedup.chunkDupStats(docs.toDF("doc_id", "text"),
          "doc_id", "text", w)
        .select("doc_id", "n_chunks", "dup_chunks")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected,
        s"seed $s: diff=${(got.toSet diff expected.toSet) ++
          (expected.toSet diff got.toSet)}")
    }
  }

  test("minhashDeltaPairs equals the full result restricted to the delta") {
    (1L to 3L).foreach { s =>
      val r = new scala.util.Random(s)
      val bases = (0 until 8).map(i => genDoc(s, i))
      val docs = bases.zipWithIndex.flatMap { case (d, i) =>
        Seq((i * 10L, d), (i * 10L + 1, d))
      }
      val df = docs.toDF("doc_id", "text")
      // arbitrary delta split (every 3rd doc is "incoming")
      val deltaIds = docs.map(_._1).filter(_ % 3 == 0).toSet
      val isNew = col("doc_id").isInCollection(deltaIds)
      val full = Dedup.minhashDedup(df, "doc_id", "text")
        .as[(Long, Long, Int, Int)].collect().toSet
        .filter(p => deltaIds(p._1) || deltaIds(p._2))
      val delta = Dedup.minhashDeltaPairs(
          df.filter(!isNew), df.filter(isNew), "doc_id", "text")
        .as[(Long, Long, Int, Int)].collect().toSet
      assert(delta == full,
        s"seed $s: delta=${delta.size} fullFiltered=${full.size} diff=" +
          s"${(delta diff full) ++ (full diff delta)}")
    }
  }
}
