package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.llm.TextOps

/** Native codegen expressions: bit-parity with the composed HOF forms they
  * replace, plus SQL registration through GraftExtensions.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches HOF aggregate(zip_with) bit-for-bit") {
    val d = graft.Tables.table(spark, sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, z) => acc + z)
    val diff = d.select((VectorMath.dot(col("v"), col("v")) - hof).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0, s"max |native-hof| = $diff (must be bit-identical)")
  }

  test("DotProduct handles nulls and empty arrays") {
    val d = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0))),
      (Some(Array.empty[Double]), Some(Array.empty[Double])))
      .toDF("a", "b")
    val out = d.select(VectorMath.dot(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(11.0), None, Some(0.0)))
  }

  test("WordShingles matches the composed HOF form") {
    val texts = Seq("  Alpha beta GAMMA delta  ", "one two", "solo", "",
      "a  b   c d a b c d", "ü ö ä ü ö ä").toDF("text")
    val composed = array_distinct(
      TextOps.shingles(TextOps.tokens(col("text")), 3))
    val rows = texts.select(
        TextOps.shingleSet(col("text"), 3).as("native"),
        composed.as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
  }

  test("RollingMinSha matches the composed HOF form") {
    val d = graft.Tables.table(spark, sf0001, "documents").limit(100)
    val rows = d.select(
        graft.ops.llm.Fingerprint.rollingMin(col("text")).as("native"),
        graft.ops.llm.Fingerprint.rollingMinHof(col("text")).as("hof"))
      .as[(String, String)].collect()
    assert(rows.length == 100)
    rows.foreach { case (n, h) => assert(n == h) }
    // short-text edge: whole string hashed
    val tiny = Seq("ab", "  AB  ").toDF("text").select(
      graft.ops.llm.Fingerprint.rollingMin(col("text")).as("n"),
      graft.ops.llm.Fingerprint.rollingMinHof(col("text")).as("h"))
      .as[(String, String)].collect()
    tiny.foreach { case (n, h) => assert(n == h) }
    assert(tiny(0)._1 == tiny(1)._1) // normalization applied
  }

  test("SQL registration via GraftExtensions") {
    assert(spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head() == 11.0)
    assert(spark.sql(
      "SELECT graft_word_shingles('a b c d', 3)")
      .as[Seq[String]].head() == Seq("a b c", "b c d"))
  }
}
