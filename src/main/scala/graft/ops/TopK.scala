package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1 + P4 (SURVEY.md §2.5): top-K rows per group by a metric.
  *
  * Reference: `Window.partitionBy(prefix).orderBy(frequency.desc)` +
  * `row_number()` + `filter(rank <= K)` at
  * `IncrementalAutocomplete.java:120-125`.
  *
  * Two deliberate changes from the reference:
  *  - deterministic tie-break: order is (metric desc, tieBreak asc...) — the
  *    reference orders only by frequency, so equal-frequency rows get
  *    arbitrary ranks run-to-run (hazard SURVEY §2.11.2).
  *  - scale: Spark ≥3.5 plans this exact shape with
  *    `WindowGroupLimitExec` (rule `InferWindowGroupLimit`) in BOTH
  *    Partial (pre-shuffle, map-side) and Final modes — each map task
  *    ships only k rows per group, so a hot 2-char prefix shuffles
  *    k×numMapTasks rows instead of its full fan-in. That is the
  *    two-phase/salted top-K SURVEY §7.5.3 planned to hand-build, native.
  *    Asserted in TopKSpec (operator) and PlanAuditSpec (Partial+Final).
  */
object TopK {

  /** Add `rankCol` = row_number over (partition by groupKeys, order by
    * metric desc then tieBreaks asc) and keep rows with rank <= k.
    */
  def apply(df: DataFrame, groupKeys: Seq[String], metric: Column,
            tieBreaks: Seq[Column], k: Int, rankCol: String = "rnk")
      : DataFrame = {
    val w = Window
      .partitionBy(groupKeys.map(df(_)): _*)
      .orderBy(metric.desc +: tieBreaks.map(_.asc): _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Explicit salted two-phase top-K for pathological group fan-in
    * (SURVEY §4.3: a hot 2-char prefix can hold a large share of the
    * corpus). The native plan above already map-side-limits, but its
    * FINAL pass still lands k rows per map task of a hot group on ONE
    * reducer — k=10 across 100k map tasks is a 1M-row straggler
    * partition. Salting inserts a spreading pass: phase 1 ranks within
    * (group, salt) — the hot group fans out over `salts` reducers, each
    * itself map-side-limited — phase 2 re-ranks the ≤ salts×k survivors
    * per group, a trivially small final window. The salt is a
    * deterministic hash of the tie-break columns, so reruns shard
    * identically. Output is identical to [[apply]] whenever
    * (metric, tieBreaks) totally orders each group (the same contract
    * apply needs for deterministic ranks); equivalence asserted in
    * TopKSpec, plan shape in PlanAuditSpec.
    */
  def salted(df: DataFrame, groupKeys: Seq[String], metric: Column,
             tieBreaks: Seq[Column], k: Int, salts: Int = 64,
             rankCol: String = "rnk"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(tieBreaks.nonEmpty, "salted top-k salts on the tie-break columns")
    val w1 = Window
      .partitionBy(groupKeys.map(df(_)) :+ col("__salt"): _*)
      .orderBy(metric.desc +: tieBreaks.map(_.asc): _*)
    val local = df
      .withColumn("__salt", pmod(xxhash64(tieBreaks: _*), lit(salts)))
      .withColumn("__lr", row_number().over(w1))
      .filter(col("__lr") <= k)
      .drop("__salt", "__lr")
    apply(local, groupKeys, metric, tieBreaks, k, rankCol)
  }
}
