package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** J1 merge algebra (SURVEY §5.2.2/3): associativity, commutativity,
  * identity with empty state — the properties that make incremental runs
  * composable in any batch order.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("prefix", "query")

  private def toDf(rows: Seq[(String, String, Long)]): DataFrame =
    rows.toDF("prefix", "query", "frequency")

  private def result(df: DataFrame): Map[(String, String), Long] =
    df.as[(String, String, Long)].collect()
      .map { case (p, q, f) => (p, q) -> f }.toMap

  private def merge(a: DataFrame, b: DataFrame): DataFrame =
    Merge(a, b, keys, "frequency")

  private val genTable = Gen.listOf(for {
    p <- Gen.oneOf("ab", "cd", "ef")
    q <- Gen.oneOf("abq", "cdq", "efq", "abr")
    f <- Gen.chooseNum(1L, 50L)
  } yield (p, q, f))

  private def sample(seed: Long): Seq[(String, String, Long)] =
    genTable.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("merge equals per-key sum") {
    val a = Seq(("ab", "abq", 2L), ("cd", "cdq", 1L))
    val b = Seq(("ab", "abq", 3L), ("ef", "efq", 5L))
    assert(result(merge(toDf(a), toDf(b))) ==
      Map(("ab", "abq") -> 5L, ("cd", "cdq") -> 1L, ("ef", "efq") -> 5L))
  }

  test("associativity and commutativity") {
    (1L to 3L).foreach { s =>
      val (a, b, c) = (toDf(sample(s)), toDf(sample(s + 100)),
        toDf(sample(s + 200)))
      val leftFold = result(merge(merge(a, b), c))
      val rightFold = result(merge(a, merge(b, c)))
      val swapped = result(merge(merge(b, a), c))
      assert(leftFold == rightFold, s"assoc seed $s")
      assert(leftFold == swapped, s"comm seed $s")
    }
  }

  test("empty state is identity (modulo per-key summing)") {
    val rows = sample(7)
    val expected = rows.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).sum).toMap
    val empty = graft.Pipeline.emptyState(spark)
    assert(result(merge(toDf(rows), empty)) == expected)
  }
}
