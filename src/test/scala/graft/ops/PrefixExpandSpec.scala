package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** G1 invariants (SURVEY §5.2.2/3): prefix count = max(0, min(len,60)-1),
  * every emitted prefix is a true prefix, and the Spark expansion equals a
  * brute-force Scala reference on random strings.
  *
  * Property sampling: plain scalacheck `Gen` with fixed seeds (the
  * scalatest-scalacheck bridge isn't available offline).
  */
class PrefixExpandSpec extends SparkSpec {
  import spark.implicits._

  private def expand(qs: Seq[String]): Seq[(String, String)] = {
    val df = qs.toDF("q")
    PrefixExpand(df, "q").as[(String, String)].collect().toSeq
  }

  private def reference(q: String): Seq[(String, String)] =
    (2 to math.min(q.length, 60)).map(l => (q.substring(0, l), q))

  test("fixed edge cases") {
    // 1-char → no rows; 2-char → itself; >60 chars → capped at 60
    val long = "a" * 75
    val out = expand(Seq("a", "ab", long, "how to"))
    assert(!out.exists(_._2 == "a"))
    assert(out.filter(_._2 == "ab") == Seq(("ab", "ab")))
    val longPrefixes = out.filter(_._2 == long).map(_._1)
    assert(longPrefixes.size == 59 && longPrefixes.map(_.length).max == 60)
    // whitespace is included in prefixes
    assert(out.contains(("how t", "how to")))
  }

  test("matches brute-force reference on random strings") {
    val gen = Gen.listOfN(12,
      Gen.chooseNum(0, 70).flatMap(n =>
        Gen.stringOfN(n, Gen.oneOf(('a' to 'e') :+ ' ' :+ 'ü'))))
    (1L to 5L).foreach { seed =>
      val qs = gen.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"gen failed for seed $seed"))
      val expected = qs.flatMap(reference).sorted
      assert(expand(qs).sorted == expected, s"seed $seed")
    }
  }
}
