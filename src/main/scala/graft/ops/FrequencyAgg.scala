package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A1/A2 (SURVEY.md §2.4): hash aggregation of (key...) → count / sum.
  *
  * Reference: `groupBy(prefix, query).agg(sum("count"))` at
  * `IncrementalAutocomplete.java:86-88` and `:105-106`. Spark plans this as
  * partial `HashAggregate` → shuffle on the group keys → final
  * `HashAggregate`; map-side combine collapses G1's ~59× fan-out before the
  * exchange, which is the property that makes the pipeline survive 100 TB.
  */
object FrequencyAgg {

  /** count(*) per key tuple, as column `cnt` (long). */
  def counts(df: DataFrame, keys: Seq[String], out: String = "cnt"): DataFrame =
    df.groupBy(keys.map(df(_)): _*).agg(count(lit(1)).as(out))

  /** sum(`valueCol`) per key tuple. Sum of long stays long (explicit — the
    * reference narrows long→INT implicitly on its JDBC write, SURVEY §2.6).
    */
  def sums(df: DataFrame, keys: Seq[String], valueCol: String,
           out: String = "sum"): DataFrame =
    df.groupBy(keys.map(df(_)): _*).agg(sum(df(valueCol)).as(out))
}
