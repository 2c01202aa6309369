package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic properties of the data-selection & scoring tier (L52–L55)
  * on real corpus data — the structural invariants the DuckDB hash gate
  * certifies only implicitly: dense interleave positions, per-group
  * conservation of classified docs, PPSWOR weight bounds, and the
  * duplicate⇒zero-novelty law.
  */
class SelectionSpec extends SparkSpec {

  private def run(q: String) = SparkEntry.queries(q)(spark, sf0001)

  test("q_curriculum: dense positions, round-robin interleave, difficulty-monotone per source") {
    val rows = run("q_curriculum").collect()
    assert(rows.nonEmpty)
    val byPos = rows.sortBy(_.getAs[Int]("pos"))
    assert(byPos.map(_.getAs[Int]("pos")).toSeq == (1 to rows.length),
      "positions must be dense 1..N")
    // the interleave order is (rk, source): rk never decreases globally,
    // and within each source the ranks are dense and difficulty-sorted
    val rks = byPos.map(_.getAs[Int]("rk")).toSeq
    assert(rks.zip(rks.tail).forall { case (a, b) => a <= b },
      "per-source rank must be non-decreasing along the global order")
    byPos.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      assert(rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Int]("rk")).toSeq ==
        (1 to rs.length), "each source's ranks must be dense in order")
      val d = rs.sortBy(_.getAs[Int]("rk"))
        .map(_.getAs[Long]("difficulty_ppk"))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b },
        "difficulty must be non-decreasing within a source")
    }
  }

  test("q_quality_classifier: keep+drop conserves the per-(source,lang) doc count") {
    val res = run("q_quality_classifier").collect()
    val expected = Tables.table(spark, sf0001, "documents")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(res.map(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
      .toSet == expected.keySet, "every (source,lang) group must report")
    res.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_keep") + r.getAs[Long]("n_drop") == expected(k),
        s"classified docs must conserve the group count at $k")
    }
  }

  test("q_importance_resample: weight bounds, dense per-lang ranks, repeat-run stability") {
    val a = run("q_importance_resample").collect()
    assert(a.nonEmpty)
    assert(a.forall { r =>
      val w = r.getAs[Int]("w"); w >= 1 && w <= 9
    }, "PPSWOR weights must stay in the documented [1,9] explode bound")
    a.groupBy(_.getAs[String]("lang")).values.foreach { g =>
      assert(g.length <= 15, "per-lang cut is 15")
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to g.length),
        "per-lang ranks must be dense")
    }
    // the stat-literal injection (driver-side collect of the rollup)
    // must be deterministic: two full runs agree row-for-row
    val b = run("q_importance_resample").collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("q_novelty: exact duplicates of an earlier doc score zero novelty") {
    import spark.implicits._
    val d = Tables.table(spark, sf0001, "documents")
    val wD = Window.partitionBy(lower(trim(col("text"))))
      .orderBy(col("doc_id"))
    val dupIds = d.select(col("doc_id"),
        row_number().over(wD).as("rn"))
      .filter(col("rn") > 1).select("doc_id").as[Long].collect().toSet
    val res = run("q_novelty").collect()
    assert(res.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to res.length),
      "ranks must be dense 1..N")
    val byRk = res.sortBy(_.getAs[Int]("rk"))
      .map(_.getAs[Long]("novelty_ppm"))
    assert(byRk.zip(byRk.tail).forall { case (a, b) => a <= b },
      "novelty must ascend with rank")
    res.foreach { r =>
      if (dupIds.contains(r.getAs[Long]("doc_id")))
        assert(r.getAs[Long]("novelty_ppm") == 0L,
          s"duplicate doc ${r.getAs[Long]("doc_id")} must score 0")
    }
    // the corpus ships exact twins: the most-redundant cut must surface
    // zero-novelty docs at its head
    if (dupIds.nonEmpty)
      assert(byRk.head == 0L, "rank 1 must be a zero-novelty duplicate")
  }

  test("q_shard_tokens: dense shards, conserved totals, bounded skew") {
    val res = run("q_shard_tokens").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).sortBy(_._1)
    assert(res.nonEmpty)
    assert(res.map(_._1).toSeq == (0L until res.length).toSeq,
      "shard ids must be dense 0..N-1")
    val d = Tables.table(spark, sf0001, "documents")
    val perDoc = d.select(size(split(lower(trim(col("text"))), "\\s+"))
      .cast("long").as("n")).collect().map(_.getLong(0))
    assert(res.map(_._2).sum == perDoc.length,
      "every doc lands in exactly one shard")
    assert(res.map(_._3).sum == perDoc.sum,
      "token mass is conserved across shards")
    // a doc is assigned by its FIRST token, so a shard holds at most
    // stride-1 tokens of starts plus one straddling doc
    val bound = 50000L + perDoc.max
    assert(res.forall(_._3 < bound),
      s"per-shard tokens must stay under stride+max_doc ($bound)")
  }

  test("q_ppl_bucket: per-lang partition into ordered head/middle/tail terciles") {
    val rows = run("q_ppl_bucket").collect()
    assert(rows.nonEmpty)
    // every scored doc appears exactly once
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "one bucket per doc")
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.map(_.getAs[Long]("density"))).toMap
      assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
      val head = byBucket.getOrElse("head", Array.empty[Long])
      assert(head.nonEmpty, s"$lang: head tercile must be nonempty")
      // buckets are value-separated: assignment compares density against
      // the rank-selected boundaries, so nonempty buckets order STRICTLY
      for {
        m <- byBucket.get("middle")
      } assert(head.max < m.min, s"$lang: head/middle overlap")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max < t.min, s"$lang: middle/tail overlap")
      // ties only ADD to head: at least ceil(n/3) docs sit at or below
      // the first boundary value
      val n = rs.length
      assert(head.length >= (n + 2) / 3,
        s"$lang: head must hold at least ceil(n/3) docs")
    }
  }

  test("q_nb_train: smoothed log-likelihoods positive, monotone in count within a class") {
    val rows = run("q_nb_train").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).values.foreach { rs =>
      assert(rs.forall(_.getAs[Long]("micro4") > 0),
        "-ln of a smoothed probability < 1 must be positive")
      // a more frequent term can never be MORE surprising than a rarer
      // one in the same class (the likelihood is monotone in the count)
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("c"), -r.getAs[Long]("micro4")))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("micro4") >= b.getAs[Long]("micro4"),
            "micro4 must be non-increasing as the count grows")
        case _ => ()
      }
    }
  }

  test("q_nb_classify: one row per doc; full argmin parity with a plain-Scala NB") {
    // independent re-derivation of the whole train→serve loop in plain
    // Scala (no Catalyst, no SQL) — certifies the Spark pipeline against
    // a third implementation beyond the DuckDB oracle
    val docs = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, lang, t) =>
      (id, lang, t.trim.toLowerCase.split("\\s+", -1).toSeq)
    }
    val cnt = toks.flatMap { case (_, l, ts) => ts.map(l -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tot = cnt.groupBy(_._1._1)
      .map { case (l, m) => l -> m.values.sum }
    val v = toks.flatMap(_._3).distinct.size.toLong
    def micro(l: String, t: String): Long = cnt.get((l, t)) match {
      case Some(c) =>
        math.round(-math.log((c + 1).toDouble / (tot(l) + v)) * 10000)
      case None => math.round(math.log((tot(l) + v).toDouble) * 10000)
    }
    val dl = docs.groupBy(_._2).map { case (l, d) => l -> d.size.toLong }
    val nd = docs.length.toLong
    def prior(l: String): Long =
      math.round(-math.log(dl(l).toDouble / nd) * 10000)
    val langs = dl.keys.toSeq.sorted
    val expected = toks.map { case (id, trueL, ts) =>
      val best = langs
        .map(l => (prior(l) + ts.map(micro(l, _)).sum, l)).min
      id -> ((trueL, best._2, best._1))
    }.toMap
    val got = run("q_nb_classify").collect()
    assert(got.length == docs.length, "every doc classified exactly once")
    assert(got.map(_.getAs[Long]("doc_id")).distinct.length == got.length)
    got.foreach { r =>
      val (tl, pl, sc) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("true_lang") == tl)
      assert(r.getAs[String]("pred_lang") == pl,
        s"doc ${r.getAs[Long]("doc_id")}: argmin mismatch")
      assert(r.getAs[Long]("score_micro4") == sc,
        s"doc ${r.getAs[Long]("doc_id")}: score mismatch")
      assert(r.getAs[Long]("correct") == (if (pl == tl) 1L else 0L))
    }
  }
}
