package graft

/** Semantic properties of the table-maintenance tier (L63–L65) on real
  * corpus data: every MERGE outcome class lands on the right keys, the
  * delete-beats-update tie is pinned, the snapshot diff classifies
  * exactly the changed keys, and the k-anonymity report matches a
  * brute-force recount.
  */
class MaintenanceSpec extends SparkSpec {

  private def run(q: String) = SparkEntry.queries(q)(spark, sf0001)

  private def baseIds: Set[Long] =
    Tables.table(spark, sf0001, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet

  test("CDC insert-key offset is disjoint from the base key space") {
    // the synthetic insert feed clones doc_id % 11 == 0 to doc_id + 10^12;
    // a collision would make q_stream_cdc's max(struct) state (op 'U' >
    // 'I' in payload order) and q_cdc_merge's (version DESC, op ASC)
    // window tie-break pick DIFFERENT rows — stream and batch would
    // silently diverge. Pin the disjointness on the live testdata.
    val mx = Tables.table(spark, sf0001, "documents")
      .agg(org.apache.spark.sql.functions.max("doc_id")).head().getLong(0)
    assert(mx < 1000000000000L / 2,
      s"max doc_id $mx too close to the CDC insert offset 10^12")
  }

  test("q_cdc_merge: every MERGE outcome class lands on the right keys") {
    val base = Tables.table(spark, sf0001, "documents")
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getLong(3))).toMap
    val merged = run("q_cdc_merge").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))).toMap

    val deleted = base.keySet.filter(_ % 13 == 0)
    val inserted = base.keySet.filter(_ % 11 == 0).map(_ + 1000000000000L)

    // deletes remove — INCLUDING keys that also carry a same-version
    // update (doc_id % 182 == 0, e.g. 0/182/364): 'D' < 'U' under the
    // (version DESC, op ASC) tie-break, so the delete wins
    assert(deleted.nonEmpty && deleted.exists(_ % 14 == 0),
      "fixture must contain the update-vs-delete tie keys")
    assert(merged.keySet.intersect(deleted).isEmpty,
      "deleted keys must be absent from the merged snapshot")
    // inserts appear at the shifted key with the insert source
    inserted.foreach { id =>
      assert(merged.get(id).exists(_._2 == "cdc_insert"),
        s"insert $id missing or mis-sourced")
    }
    // last-writer-wins: v2 update beats v1 on keys carrying both
    base.keySet.filterNot(_ % 13 == 0).foreach { id =>
      val src = merged(id)._2
      if (id % 14 == 0) assert(src == "cdc_update_v2", s"$id: $src")
      else if (id % 7 == 0) assert(src == "cdc_update_v1", s"$id: $src")
      else assert(merged(id) == base(id),
        s"untouched $id must pass through byte-identical")
    }
    // conservation: |merged| = |base| - deletes + inserts
    assert(merged.size == base.size - deleted.size + inserted.size)
  }

  test("q_snapshot_diff: classifies exactly the added/removed/changed keys") {
    val ids = baseIds
    val rows = run("q_snapshot_diff").collect()
    def cls(c: String): Set[Long] =
      rows.filter(_.getAs[String]("change") == c)
        .map(_.getAs[Long]("doc_id")).toSet
    assert(cls("added") == ids.filter(_ % 11 == 0).map(_ + 1000000000000L))
    assert(cls("removed") == ids.filter(_ % 13 == 0))
    // %14 ⊂ %7, so "changed" = updated-and-not-deleted = %7 minus %13
    assert(cls("changed") == ids.filter(i => i % 7 == 0 && i % 13 != 0))
    rows.foreach { r =>
      r.getAs[String]("change") match {
        case "added"   => assert(r.getAs[String]("old_source") == null &&
          r.getAs[String]("new_source") != null)
        case "removed" => assert(r.getAs[String]("new_source") == null &&
          r.getAs[String]("old_source") != null)
        case "changed" => assert(r.getAs[String]("old_source") !=
          r.getAs[String]("new_source"))
      }
    }
  }

  test("q_stream_cdc: streamed latest-per-key state applies to the batch merge, row-identical") {
    // the streaming form consumes the change feed across ≥4 micro-batches
    // (8 staged files, 2 per trigger); its max(struct) state must land on
    // exactly the rows the batch window picks — including the
    // delete-beats-update tie the drk field encodes
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Long]("n_chars"))
    val streamed = run("q_stream_cdc").collect().map(key).toSet
    val batch = run("q_cdc_merge").collect().map(key).toSet
    assert(streamed == batch, "streamed merge must equal the batch merge")
    assert(streamed.nonEmpty)
  }

  test("q_kanon: report matches a brute-force equivalence-class recount") {
    val docs = Tables.table(spark, sf0001, "documents")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
    val classes = docs.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val expect = classes.groupBy { case ((l, s, _), _) => (l, s) }
      .map { case (k, cs) =>
        val sizes = cs.values
        k -> (cs.size.toLong, sizes.min,
          sizes.count(_ < 5).toLong, sizes.filter(_ < 5).sum)
      }
    val got = run("q_kanon").collect().map { r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        (r.getAs[Long]("n_classes"), r.getAs[Long]("min_class"),
          r.getAs[Long]("n_risky_classes"), r.getAs[Long]("n_risky_rows"))
    }.toMap
    assert(got == expect, "k-anonymity report differs from brute force")
    // the audit must cover every document exactly once
    assert(classes.values.sum == docs.length.toLong)
  }
}
