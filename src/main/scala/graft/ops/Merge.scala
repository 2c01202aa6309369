package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 (SURVEY.md §2.3): incremental merge — `existing ∪ delta` then
  * re-aggregate to cumulative counts.
  *
  * Reference: `unionByName` + `groupBy(prefix, query).sum` at
  * `IncrementalAutocomplete.java:100-107`. Semantically a full-outer join on
  * the key with `coalesce(old,0)+coalesce(new,0)`, but union+sum needs one
  * shuffle and no null handling, so the rebuild keeps that shape.
  *
  * At scale: if the cumulative state is bucketed by the merge key (see
  * `io.Sinks.writeBucketed`), the union's re-aggregation only shuffles the
  * (much smaller) delta side once AQE coalesces; history never re-shuffles
  * in full when both sides share the bucketing.
  */
object Merge {

  /** Merge two (keys..., valueCol) tables by summing `valueCol` per key.
    * Columns are matched by name (`unionByName`), like the reference.
    */
  def apply(existing: DataFrame, delta: DataFrame, keys: Seq[String],
            valueCol: String): DataFrame = {
    val cols = keys :+ valueCol
    val l = existing.select(cols.map(existing(_)): _*)
    val r = delta.select(cols.map(delta(_)): _*)
    l.unionByName(r)
      .groupBy(keys.map(col): _*)
      .agg(sum(valueCol).as(valueCol))
  }
}
