package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Format-scan queries (S1 family) and the compaction-plan query: each
  * format roundtrip must reproduce the parquet truth's aggregates
  * exactly (the DuckDB oracle re-certifies this driver-side; here the
  * parquet side is computed in-Spark so the suite needs no DuckDB).
  */
class LayoutQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .toSeq.sorted

  private def parquetTruth(filtered: Boolean): DataFrame = {
    val d0 = spark.read.parquet(s"$sf0001/documents.parquet")
    val d = if (filtered) d0.filter(col("lang").isin("en", "fr")) else d0
    d.groupBy("lang", "source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(length(col("text"))).as("total_len"),
      min(col("doc_id")).as("min_id"),
      max(col("doc_id")).as("max_id"))
  }

  for (name <- Seq("q_scan_csv", "q_scan_json", "q_scan_orc")) {
    test(s"$name: format roundtrip reproduces the parquet aggregates") {
      assert(sortedRows(q(name)) == sortedRows(parquetTruth(false)))
    }
  }

  test("q_scan_partitioned: partition-pruned read matches filtered truth") {
    val rows = q("q_scan_partitioned")
    assert(sortedRows(rows) == sortedRows(parquetTruth(true)))
    // lang survives as the (recovered) partition column with only the
    // selected values
    assert(rows.select("lang").distinct().as[String].collect().sorted
      .toSeq == Seq("en", "fr"))
  }

  test("q_compaction_plan: bins partition the corpus and stay contiguous") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = q("q_compaction_plan")
      .select("bin", "n_files", "bin_bytes", "first_file", "last_file")
      .as[(Long, Long, Long, String, String)].collect().sortBy(_._1)
    // every "file" lands in exactly one bin; bytes conserved
    assert(plan.map(_._2).sum == docs.count())
    assert(plan.map(_._3).sum ==
      docs.agg(sum("n_chars")).as[Long].head())
    // bins are disjoint contiguous path ranges in bin order
    plan.foreach { case (_, _, _, first, last) => assert(first <= last) }
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"bins ${a._1}/${b._1} overlap: ${a._5} !< ${b._4}")
      case _ => ()
    }
    // many multi-file bins at this target (the point of compaction)
    assert(plan.count(_._2 > 1) >= 3)
  }
}
