package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints → violation counts: the
  * expectations gate (Delta constraints / dbt tests shape) a pipeline
  * runs before trusting an ingest batch. The reference trusts its
  * input blindly (one malformed log line changes its counts silently);
  * at 100 TB the check must also be CHEAP — so every rule family
  * reduces to violation COUNTS (one row per rule), never row dumps:
  *
  *  - [[check]] — N predicate rules over one table in ONE scan and one
  *    1-row aggregate (no shuffle of data rows; map-side partial sums).
  *  - [[unique]] — key-duplication excess via groupBy count: the only
  *    rule family that genuinely needs a shuffle, and it shuffles the
  *    KEY columns only.
  *  - [[orphans]] — referential integrity via left-anti join against
  *    the distinct parent keys (broadcast when the parent is small,
  *    AQE decides; never a driver-side collect).
  *
  * NULL semantics are explicit, not inherited from SQL three-valued
  * logic: [[fails]] counts a NULL predicate result as a violation
  * (a range rule fails on NULL — say `c.isNull || pred` explicitly to
  * allow them); [[unique]] groups NULL keys together (duplicate-
  * detection semantics, like GROUP BY — not SQL UNIQUE, which ignores
  * NULLs); [[orphans]] skips NULL foreign keys (nothing to resolve).
  */
object Constraints {

  /** Violation predicate from an expectation: rows where `pred` is
    * false OR NULL violate. */
  def fails(pred: Column): Column = !coalesce(pred, lit(false))

  /** N predicate rules in one scan: returns (rule, violations), one
    * row per rule. `rules` maps rule name → violation predicate
    * (compose with [[fails]] for expectation form).
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val sums = rules.map { case (name, v) =>
      coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as(name)
    }
    df.agg(sums.head, sums.tail: _*)
      .unpivot(Array.empty[Column], "rule", "violations")
  }

  /** Excess duplicate rows for a key (rows beyond the first per key).
    * NULL keys group together — this is duplicate detection, not SQL
    * UNIQUE. Shuffles only the key columns.
    */
  def unique(df: DataFrame, name: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(lit(name).as("rule"),
        coalesce(sum(col("cnt") - 1), lit(0L)).as("violations"))

  /** Foreign-key orphans: child rows whose non-NULL `fk` has no match
    * in the parent's `pk`. Anti-join against the distinct parent keys.
    */
  def orphans(child: DataFrame, fk: String, parent: DataFrame,
              pk: String, name: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk)).distinct(),
        col(fk) === col(pk), "left_anti")
      .agg(lit(name).as("rule"), count(lit(1)).as("violations"))

  /** Union of rule results (all are (rule, violations) single/multi
    * row frames). */
  def all(results: Seq[DataFrame]): DataFrame =
    results.reduce(_ unionByName _)

  /** Row-level routing (the dead-letter half of the gate): append a
    * `violations` array naming every predicate rule the row fails, in
    * rule order. Pure projection — codegen, shuffle-free, and legal on
    * STREAMING DataFrames unchanged (stateless), so the same rule set
    * drives the batch audit and the ingest stream's quarantine split.
    */
  def tag(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    df.withColumn("violations",
      filter(array(rules.map { case (n, v) =>
        when(v, lit(n))
      }: _*), _.isNotNull))
  }

  /** [[tag]] split into (clean, quarantined): clean rows drop the
    * marker column; quarantined rows keep it as the reason list.
    */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val tagged = tag(df, rules)
    (tagged.filter(size(col("violations")) === 0).drop("violations"),
      tagged.filter(size(col("violations")) > 0))
  }
}
