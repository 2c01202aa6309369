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
  * 1-row result is unpivoted driver-free (explode over an array of
  * structs — the typed-Column form of `stack`). Exact distinct is
  * the oracle-checkable choice here; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` (same plan shape minus the Expand) when ±2 %
  * is acceptable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // Internal agg aliases are INDEX-based (c0__null, c1__null, …), never
    // the user's column names: interpolating raw names into SQL/aliases
    // breaks on quotes/backticks (injection-shaped analysis failure). The
    // original name only ever travels as a lit() value.
    val aggs = count(lit(1)).as("n_rows") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"c${i}__null"),
          countDistinct(df(c)).as(s"c${i}__dist"),
          min(df(c)).cast("string").as(s"c${i}__min"),
          max(df(c)).cast("string").as(s"c${i}__max"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"c${i}__null").as("n_null"),
        col(s"c${i}__dist").as("n_distinct"),
        col(s"c${i}__min").as("min_s"), col(s"c${i}__max").as("max_s"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("r"))
      .select(col("r.column").as("column"), col("n_rows"),
        col("r.n_null").as("n_null"), col("r.n_distinct").as("n_distinct"),
        col("r.min_s").as("min_s"), col("r.max_s").as("max_s"))
  }
}
