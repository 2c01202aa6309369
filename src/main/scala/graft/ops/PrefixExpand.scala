package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G1 (SURVEY.md §2.9): prefix expansion — for each query `q` emit
  * `(q.substring(0, L), q)` for `L = minLen .. min(len(q), maxLen)`.
  *
  * Reference (`IncrementalAutocomplete.java:71-79`) drops to
  * `JavaRDD.flatMap` + `RowFactory`, severing the Catalyst plan
  * (`LogicalRDD` barrier). Rebuilt as
  * `explode(transform(sequence(...), substr))` — a pure Catalyst generator:
  * stays in whole-stage codegen, keeps column pruning/pushdown alive, and
  * needs no custom `Generator`.
  *
  * Semantics preserved exactly: min prefix length 2 (1-char queries emit zero
  * rows), max 60 (`VARCHAR(60)` key, `approach 4 cli insturctions.txt:43`),
  * prefixes are char slices of the normalized query, whitespace included.
  */
object PrefixExpand {

  /** Array of prefixes of `q` with lengths `minLen..min(length(q),maxLen)`;
    * empty array when the query is shorter than `minLen` (guarded explicitly:
    * Spark's `sequence(2, 1)` would count *down*, not produce empty).
    */
  def prefixArray(q: Column, minLen: Int = 2, maxLen: Int = 60): Column = {
    val lens = sequence(lit(minLen), least(length(q), lit(maxLen)))
    when(length(q) >= minLen, transform(lens, l => q.substr(lit(1), l)))
      .otherwise(array().cast("array<string>"))
  }

  /** Explode `col` into (prefix, query) rows, one per prefix length. */
  def apply(df: DataFrame, col: String, minLen: Int = 2, maxLen: Int = 60)
      : DataFrame =
    df.select(
      explode(prefixArray(df(col), minLen, maxLen)).as("prefix"),
      df(col).as("query"))
}
