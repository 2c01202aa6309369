package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination: find training documents sharing >= 1 n-gram
  * shingle with a probe (test/eval) set.
  *
  * Two exact paths with the same output:
  *
  *  - `viaJoin`: probe shingles distinct + broadcast, semi-join against
  *    the exploded corpus shingle stream. Right while the probe shingle
  *    set fits a broadcast (~10s of MB).
  *
  *  - `viaBloom`: the corpus stream is prefiltered by a Bloom filter of
  *    the probe shingles (built with Spark's own BloomFilterAggregate,
  *    SQL-registered by GraftExtensions as `graft_bloom_agg` /
  *    `graft_might_contain`), then ONLY the candidate rows — true hits
  *    plus the filter's false positives — reach the exact semi-join, so
  *    the join input shrinks by orders of magnitude while the result
  *    stays exact. The filter is built by a 1-row aggregate and handed
  *    to `might_contain` as a SCALAR SUBQUERY — the exact channel
  *    Spark's runtime row-group filtering uses — so the bitmap reaches
  *    codegen as a reference object, never an O(numBits) plan literal
  *    (size it freely: 8 bits/item ≈ 2% FP at 12 MB per 100 M probe
  *    shingles never touches the plan string).
  */
object Decontaminate {

  private def shingled(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(df(idCol).as("doc_id"),
      explode(TextOps.shingleSet(df(textCol), n)).as("g"))

  /** Exact broadcast-join path: contaminated train doc_ids. */
  def viaJoin(train: DataFrame, probes: DataFrame, idCol: String,
              textCol: String, n: Int): DataFrame = {
    val probeShingles = shingled(probes, idCol, textCol, n)
      .select("g").distinct()
    shingled(train, idCol, textCol, n)
      .join(broadcast(probeShingles), "g")
      .select("doc_id").distinct()
  }

  /** Graded decontamination (the partial-overlap policy of the PaLM /
    * GPT-3 appendices): per train doc, how many of its DISTINCT n-gram
    * shingles appear in the probe set, plus the ppm fraction. `viaJoin`
    * is the binary drop decision; this is the dirtiness SCORE that lets
    * a pipeline drop above a threshold and keep light-touch docs (a doc
    * quoting one test sentence is salvageable; a verbatim copy is not).
    * Same scale shape as `viaJoin`: probe shingles distinct + broadcast,
    * ONE exploded corpus shingle stream, one doc-keyed count — linear in
    * the corpus; clean docs surface with n_dirty = 0 (left join, they
    * never vanish).
    */
  def dirtiness(train: DataFrame, probes: DataFrame, idCol: String,
                textCol: String, n: Int): DataFrame = {
    val probeShingles = shingled(probes, idCol, textCol, n)
      .select("g").distinct().withColumn("hit", lit(1L))
    shingled(train, idCol, textCol, n)
      .join(broadcast(probeShingles), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_dirty"))
      .select(col("doc_id"), col("n_shingles"), col("n_dirty"),
        expr("n_dirty * 1000000 div n_shingles").as("dirty_ppm"))
  }

  /** Bloom-prefiltered exact path: same result as `viaJoin`, join input
    * reduced to bloom candidates. `estItems`/`numBits` size the filter
    * (see object doc).
    */
  def viaBloom(train: DataFrame, probes: DataFrame, idCol: String,
               textCol: String, n: Int,
               estItems: Long = 1000000L,
               numBits: Long = 8000000L): DataFrame = {
    // materialized once: the bloom build (an eager action) and the exact
    // verify join both read the probe shingle set — without this the
    // tokenize+shingle+distinct pipeline runs twice per query
    val probeShingles = shingled(probes, idCol, textCol, n)
      .select("g").distinct()
      // eager checkpoint: lazy + multi-branch consumers can deadlock Spark (see ops/llm/Dedup.scala "EAGER CHECKPOINT DISCIPLINE")
      .localCheckpoint(true)
    // empty probe set → the aggregate yields a null bloom and
    // might_contain(null, ·) is null, so the prefilter drops every
    // corpus shingle — the correct (empty) answer, no driver-side
    // branch needed
    val bloom = org.apache.spark.sql.graft.Bridge.scalarSubquery(
      probeShingles.agg(call_function("graft_bloom_agg",
        xxhash64(col("g")), lit(estItems), lit(numBits)).as("bf")))
    val candidates = shingled(train, idCol, textCol, n)
      .filter(call_function("graft_might_contain",
        bloom, xxhash64(col("g"))))
    candidates
      .join(broadcast(probeShingles), "g")
      .select("doc_id").distinct()
  }
}
