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
    *
    * Note the union discards both inputs' partitioning, so this form
    * re-shuffles state + delta. Fine when both sides are fresh
    * aggregations (their exchanges feed the final agg directly — see
    * PlanAuditSpec's q_merge assertion); for a LARGE persisted state use
    * `bucketAligned`.
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

  /** Delta-only-shuffle merge for bucketed state (SURVEY §4.3): when
    * `state` is a table bucketed on `keys` (`Sinks.writeBucketed`), the
    * full-outer join form lets Spark use the bucketing as the state
    * side's partitioning — only the (small) delta shuffles, and the
    * cumulative history never re-partitions. This is the property that
    * keeps a 5-minute incremental batch O(delta), not O(history), at
    * 100 TB. Asserted in SinksSpec.
    */
  def bucketAligned(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    valueCol: String): DataFrame = {
    val d = delta.groupBy(keys.map(delta(_)): _*)
      .agg(sum(delta(valueCol)).as("delta_v"))
    state.join(d, keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col(valueCol), lit(0L)) + coalesce(col("delta_v"), lit(0L)))
          .as(valueCol): _*)
  }
}
