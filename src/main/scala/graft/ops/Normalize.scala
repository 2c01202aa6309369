package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1 + P2 (SURVEY.md §2.2): line filter + normalization.
  *
  * Reference (`IncrementalAutocomplete.java:66-69`) uses typed
  * `FilterFunction`/`MapFunction` lambdas — opaque to Catalyst, so nothing
  * pushes down past them. Rebuilt as native column expressions: the filter
  * reaches the scan (`PushedFilters`), the plan stays inside whole-stage
  * codegen, and constant folding still applies.
  */
object Normalize {

  /** `trim().toLowerCase()` — the reference's normalization (P2). */
  def normalized(c: Column): Column = lower(trim(c))

  /** Keep rows whose trimmed value has >= `minLen` chars (P1; reference uses
    * `line != null && line.trim().length() >= 2`). A native `length(trim())`
    * predicate is null-rejecting already, matching the reference's null guard.
    */
  def validLine(c: Column, minLen: Int = 2): Column =
    length(trim(c)) >= minLen

  /** Full P1+P2 over a single-column log DataFrame: filter then normalize. */
  def apply(df: DataFrame, col: String, out: String = "query",
            minLen: Int = 2): DataFrame =
    df.filter(validLine(df(col), minLen))
      .select(normalized(df(col)).as(out))
}
