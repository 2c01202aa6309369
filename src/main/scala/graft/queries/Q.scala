package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  * Registering both in one value keeps column names/types in lockstep —
  * the driver's compare sorts columns by name before hashing.
  */
final case class Q(fn: (SparkSession, String) => DataFrame,
                   sql: Option[String])

object Q {
  def apply(sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(fn, Some(sql))
  def noOracle(fn: (SparkSession, String) => DataFrame): Q = Q(fn, None)
}
