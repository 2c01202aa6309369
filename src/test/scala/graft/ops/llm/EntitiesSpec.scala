package graft.ops.llm

import graft.SparkSpec

/** Entity templating: dictionary hits become tags, everything else
  * passes through lowercased, token order survives reassembly.
  */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  private val dict = Seq(
    "docker" -> "APPLICATION", "linux" -> "OS", "ubuntu" -> "OS")
    .toDF("surface", "tag")

  test("reference example: recognized spans become type tags") {
    val docs = Seq((1L, "How to install Docker in Linux"))
      .toDF("doc_id", "text")
    val out = Entities.template(docs, "doc_id", "text", dict)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "how to install APPLICATION in OS")
  }

  test("unmatched tokens pass through; order and repeats survive") {
    val docs = Seq(
      (1L, "  ubuntu or linux or ubuntu  "),
      (2L, "no entities here"),
      (3L, "")).toDF("doc_id", "text")
    val out = Entities.template(docs, "doc_id", "text", dict)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "OS or OS or OS")
    assert(out(2L) == "no entities here")
    assert(out(3L) == "")
    assert(out.size == 3, "every doc must survive the reassembly")
  }

  private val spanDict = Seq(
    "sort merge join" -> "SMJ", "merge join" -> "MJ",
    "hash join" -> "HJ", "spark" -> "APPLICATION",
    "join" -> "OPERATION").toDF("surface", "tag")

  // naive greedy leftmost-longest reference
  private def naiveSpans(text: String, dict: Map[String, String],
                         maxLen: Int): String = {
    val toks = text.trim.toLowerCase.split("\\s+", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      val l = (math.min(maxLen, toks.length - i) to 1 by -1)
        .find(n => dict.contains(toks.slice(i, i + n).mkString(" ")))
      l match {
        case Some(n) =>
          out += dict(toks.slice(i, i + n).mkString(" ")); i += n
        case None => out += toks(i); i += 1
      }
    }
    out.mkString(" ")
  }

  test("templateSpans: greedy leftmost-longest beats shorter overlaps") {
    val docs = Seq(
      (1L, "sort merge join beats hash join"), // 3-token over 2-token
      (2L, "spark join now"),                  // 'spark join' not in dict:
                                               // 1-token matches chain
      (3L, "merge join and join"),             // 2-token then 1-token
      (4L, "sort merge joins"),                // no match on 'joins'
      (5L, "")).toDF("doc_id", "text")
    val dm = Seq("sort merge join" -> "SMJ", "merge join" -> "MJ",
      "hash join" -> "HJ", "spark" -> "APPLICATION",
      "join" -> "OPERATION").toMap
    val got = Entities.templateSpans(docs, "doc_id", "text", spanDict, 3)
      .as[(Long, String)].collect().toMap
    val docsLocal = Seq(1L -> "sort merge join beats hash join",
      2L -> "spark join now", 3L -> "merge join and join",
      4L -> "sort merge joins", 5L -> "")
    docsLocal.foreach { case (id, t) =>
      assert(got(id) == naiveSpans(t, dm, 3),
        s"doc $id: got '${got(id)}' want '${naiveSpans(t, dm, 3)}'")
    }
    assert(got(1L) == "SMJ beats HJ")
    assert(got(2L) == "APPLICATION OPERATION now")
    assert(got(3L) == "MJ and OPERATION")
  }

  test("templateSpans equals the naive greedy walk on random word soup") {
    val vocab = Array("sort", "merge", "join", "hash", "spark", "scan",
      "table", "the")
    val dm = Seq("sort merge join" -> "SMJ", "merge join" -> "MJ",
      "hash join" -> "HJ", "spark" -> "APPLICATION",
      "join" -> "OPERATION").toMap
    (1 to 3).foreach { seed =>
      val r = new scala.util.Random(seed)
      val docs = (0 until 40).map(i => (i.toLong,
        Seq.fill(3 + r.nextInt(12))(vocab(r.nextInt(vocab.length)))
          .mkString(" ")))
      val got = Entities.templateSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", spanDict, 3)
        .as[(Long, String)].collect().toMap
      docs.foreach { case (id, t) =>
        assert(got(id) == naiveSpans(t, dm, 3),
          s"seed $seed doc $id '$t': got '${got(id)}' " +
            s"want '${naiveSpans(t, dm, 3)}'")
      }
    }
  }

  test("messy dictionary: case/whitespace normalized, dup surfaces collapse") {
    // ' Docker ' must still match (tokens are lower(trim)ed before lookup)
    // and a surface listed twice must NOT multiply token rows through the
    // broadcast left join — deterministically the min tag wins
    val messy = Seq(" Docker " -> "APPLICATION", "docker" -> "ZZZ_TOOL",
      "LINUX" -> "OS", "" -> "EMPTY").toDF("surface", "tag")
    val docs = Seq((1L, "install docker in linux")).toDF("doc_id", "text")
    val t = Entities.template(docs, "doc_id", "text", messy)
      .as[(Long, String)].collect().toMap
    assert(t(1L) == "install APPLICATION in OS")
    val s = Entities.templateSpans(docs, "doc_id", "text", messy, 3)
      .as[(Long, String)].collect().toMap
    assert(s(1L) == "install APPLICATION in OS")
  }

  test("dictionary join is a broadcast, reassembly is one exchange") {
    val docs = Seq((1L, "docker linux")).toDF("doc_id", "text")
    val p = Entities.template(docs, "doc_id", "text", dict)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"dictionary must broadcast, not shuffle the token stream:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled:\n$p")
  }
}
