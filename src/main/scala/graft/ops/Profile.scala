package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic one-pass column profiler — the data-audit utility run before a
  * corpus enters the pipeline: per column, null count, exact distinct
  * count, and min/max (rendered as strings so heterogeneous column types
  * stack into one typed result).
  *
  * Scale shape: ONE scan of the input produces a single 1-row aggregate
  * (Spark plans the k distinct aggregates via Expand — k× the rows into
  * the partial agg, still map-side combined before the exchange), then the
  * 1-row result is unpivoted driver-free with `stack`. Exact distinct is
  * the oracle-checkable choice here; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (same plan shape minus the Expand) when ±2 %
  * is acceptable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"${c}__null"),
        countDistinct(df(c)).as(s"${c}__dist"),
        min(df(c)).cast("string").as(s"${c}__min"),
        max(df(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__null`, `${c}__dist`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one.select(col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs)")
        .as(Seq("column", "n_null", "n_distinct", "min_s", "max_s")))
      .select("column", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
  }
}
