package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline with both objectives MAXIMIZED: keep every row
  * (id, x, y) no other row dominates, where q dominates p iff
  * q.x >= p.x ∧ q.y >= p.y with at least one strict. Exact duplicates
  * of a frontier point are all kept (neither dominates the other) — the
  * multi-objective selection primitive for data curation (e.g. the
  * length-vs-diversity frontier: no doc on it is beaten on both axes).
  *
  * Shape, not brute force: dominance only needs per-x maxima. A row
  * survives iff its y equals its x-group's max AND strictly beats the
  * best y among all STRICTLY greater x (same-y at greater x dominates
  * via the strict x). So:
  *   1. per-x max-y — one partial-agg'd groupBy, corpus-sized scan;
  *   2. running max over the per-x table, x desc, strictly-preceding
  *      frame — a single-partition window, safe because the table is
  *      |distinct x|-sized (for discrete features like document length
  *      that cardinality is bounded regardless of corpus size);
  *   3. broadcast the surviving (x, max-y) frontier — frontier-sized by
  *      definition — back onto the corpus to emit all achieving rows.
  * No shuffle touches corpus rows except the groupBy in (1).
  */
object Skyline {

  /** `df` = (id, x, y). Output: the non-dominated rows, same columns. */
  def apply(df: DataFrame): DataFrame = {
    val d = df.toDF("id", "x", "y")
    val gx = d.groupBy("x").agg(max("y").as("my"))
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keep = gx.withColumn("rm", max("my").over(w))
      .filter(col("rm").isNull || col("my") > col("rm"))
      .select(col("x").as("kx"), col("my"))
    d.join(broadcast(keep), d("x") === col("kx") && d("y") === col("my"))
      .select(d("id"), d("x"), d("y"))
  }
}
