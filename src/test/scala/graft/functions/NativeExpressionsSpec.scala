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
    // non-distinct stream variant == the HOF form WITHOUT array_distinct
    val streams = texts.select(
        TextOps.shingleStream(col("text"), 3).as("native"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    streams.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
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

  test("SparseDot matches the HOF map-lookup form on corpus postings") {
    // packed postings: the exact builder tfidfKnnGraph uses
    val d = graft.Tables.table(spark, sf0001, "documents").limit(120)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("w"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("t"), col("w")))).as("ent"))
    val pairs = d.select(col("doc_id").as("a"), col("ent").as("ea"))
      .join(d.select(col("doc_id").as("b"), col("ent").as("eb")),
        col("a") < col("b"))
    // reference: per-entry map lookup (interpreted, O(|a|·|b|)) — the
    // form the sorted-merge expression replaces
    val hof = aggregate(col("ea"), lit(0L), (acc, e) =>
      acc + e.getField("w") *
        coalesce(map_from_entries(col("eb"))(e.getField("t")), lit(0L)))
    val diff = pairs
      .select((graft.functions.SparseDot(col("ea"), col("eb")) - hof)
        .as("d"))
      .agg(max(abs(col("d")))).as[Long].head()
    assert(diff == 0L, s"max |native-hof| = $diff (must be identical)")
    // edges: empty, disjoint, partial overlap, null input
    val tiny = Seq(
      (Seq(("a", 2L), ("b", 3L)), Seq(("a", 5L), ("c", 7L))),
      (Seq.empty[(String, Long)], Seq(("a", 1L))),
      (Seq(("x", 4L)), Seq(("y", 9L))),
      (Seq(("a", 1L), ("b", 2L), ("c", 3L)),
        Seq(("a", 10L), ("b", 20L), ("c", 30L))))
      .toDF("ea", "eb")
      .select(transform(col("ea"), e =>
          struct(e.getField("_1").as("t"), e.getField("_2").as("w")))
        .as("ea"),
        transform(col("eb"), e =>
          struct(e.getField("_1").as("t"), e.getField("_2").as("w")))
        .as("eb"))
    val got = tiny
      .select(graft.functions.SparseDot(col("ea"), col("eb")))
      .as[Long].collect().toSeq
    assert(got == Seq(10L, 0L, 0L, 140L))
    val nul = Seq((null, Seq(("a", 1L)))).toDF("ea0", "eb0")
      .select(col("ea0").cast("array<struct<t:string,w:long>>").as("ea"),
        transform(col("eb0"), e =>
          struct(e.getField("_1").as("t"), e.getField("_2").as("w")))
        .as("eb"))
      .select(graft.functions.SparseDot(col("ea"), col("eb")))
      .as[Option[Long]].head()
    assert(nul.isEmpty, "null input must yield null")
  }

  test("NgramStats matches the explode+groupBy form") {
    val d = graft.Tables.table(spark, sf0001, "documents").limit(200)
      .select(col("doc_id"), col("text"))
    // reference: the shuffle-heavy form the expression replaces
    val ref = d.select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("t"),
        count(lit(1)).as("d"), max("cnt").as("m"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val st = graft.functions.NgramStats(col("text"), 2)
    val native = d.select(col("doc_id"), st.getField("total"),
        st.getField("distinct"), st.getField("max_cnt"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(native.size == 200 && native == ref)
    // short/empty-text edges: one partial shingle, counted once
    val tiny = Seq("solo", "", "a a a a").toDF("text").select(
      graft.functions.NgramStats(col("text"), 2).as("s"))
      .select("s.total", "s.distinct", "s.max_cnt")
      .as[(Long, Long, Long)].collect().toSeq
    assert(tiny == Seq((1L, 1L, 1L), (1L, 1L, 1L), (3L, 1L, 3L)))
  }

  test("CharHistStats matches the explode+groupBy form") {
    val d = graft.Tables.table(spark, sf0001, "documents").limit(200)
      .select(col("doc_id"), lower(trim(col("text"))).as("s"))
      .filter(length(col("s")) >= 1)
    // reference: one row per character, shuffled and double-aggregated
    val ref = d.select(col("doc_id"), explode(
        transform(sequence(lit(1), length(col("s"))),
          i => col("s").substr(i, lit(1)))).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("n"), count(lit(1)).as("d"),
        sum(col("cnt") * col("cnt")).as("ss"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val h = graft.functions.CharHistStats(col("s"))
    val native = d.select(col("doc_id"), h.getField("n_chars"),
        h.getField("distinct"), h.getField("sum_sq"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(native.nonEmpty && native == ref)
    // edges: single char, repeated char, surrogate pair counted once
    val tiny = Seq("a", "aaab", "😀x").toDF("s").select(
      graft.functions.CharHistStats(col("s")).as("h"))
      .select("h.n_chars", "h.distinct", "h.sum_sq")
      .as[(Long, Long, Long)].collect().toSeq
    assert(tiny == Seq((1L, 1L, 1L), (4L, 2L, 10L), (2L, 2L, 2L)))
    // h_micro: per-term HALF_UP micro-nat rounding (round(215761.55…)
    // + round(346573.59…) for 'aaab'; 2·round(346573.59…) for the
    // 2-distinct doc; 0 for a single-char doc)
    val ent = Seq("a", "aaab", "😀x").toDF("s").select(
      graft.functions.CharHistStats(col("s")).getField("h_micro"))
      .as[Long].collect().toSeq
    assert(ent == Seq(0L, 215762L + 346574L, 2L * 346574L))
  }

  test("GreedySpanScan matches the interpreted aggregate-HOF fold") {
    import graft.ops.llm.Entities
    val dict = Seq("sort merge join" -> "SMJ", "merge join" -> "MJ",
      "hash join" -> "HJ", "spark" -> "APPLICATION",
      "join" -> "OPERATION").toDF("surface", "tag")
    // the full declared-query corpus, plus crafted edge docs
    val d = graft.Tables.table(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, ""), (100002L, "   "), (100003L, "join"),
        (100004L, "sort merge join merge join hash join spark join"),
        (100005L, "sort merge joins")).toDF("doc_id", "text"))
    val native = Entities.templateSpans(d, "doc_id", "text", dict, 3)
      .as[(Long, String)].collect().toMap
    val hof = Entities.templateSpansHof(d, "doc_id", "text", dict, 3)
      .as[(Long, String)].collect().toMap
    assert(native.size == hof.size && native.nonEmpty)
    native.foreach { case (id, t) =>
      assert(t == hof(id), s"doc $id: native='$t' hof='${hof(id)}'")
    }
  }

  test("BloomContains matches constant-filter might_contain bit-for-bit") {
    // same serialized filter, probed per-row by BloomContains vs as a
    // constant by Spark's own BloomFilterMightContain — every verdict
    // (true hits AND false-positive bits) must agree, since both read
    // the same bit array
    val vals = (1L to 200L).toDF("v")
    val bloom = vals
      .agg(call_function("graft_bloom_agg", xxhash64(col("v")),
        lit(200L), lit(2048L)))
      .head().getAs[Array[Byte]](0)
    val probes = (150L to 400L).toDF("p")
      .withColumn("bloom", lit(bloom))
    val mine = probes.select(
      BloomContains.contains(col("bloom"), xxhash64(col("p"))))
      .as[Boolean].collect().toSeq
    val theirs = probes.select(
      call_function("graft_might_contain", lit(bloom),
        xxhash64(col("p")))).as[Boolean].collect().toSeq
    assert(mine == theirs)
    // and it is a real filter: all members hit, most non-members miss
    assert(mine.take(51).forall(identity))
    assert(mine.drop(51).count(identity) < 20)
  }

  test("SQL registration via GraftExtensions") {
    assert(spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head() == 11.0)
    assert(spark.sql(
      "SELECT graft_word_shingles('a b c d', 3)")
      .as[Seq[String]].head() == Seq("a b c", "b c d"))
    assert(spark.sql(
      "SELECT graft_ngram_stats('x y x y x', 2).max_cnt")
      .as[Long].head() == 2L)
    assert(spark.sql(
      "SELECT graft_char_hist('abca').sum_sq")
      .as[Long].head() == 6L)
    assert(spark.sql(
      """SELECT graft_greedy_span_scan(array(
        |  named_struct('pos', 0, 'tok', 'new', 'len', 2, 'tag', 'CITY'),
        |  named_struct('pos', 1, 'tok', 'york', 'len', 0,
        |               'tag', CAST(NULL AS STRING)),
        |  named_struct('pos', 2, 'tok', 'pizza', 'len', 0,
        |               'tag', CAST(NULL AS STRING))))""".stripMargin)
      .as[String].head() == "CITY pizza")
  }
}
