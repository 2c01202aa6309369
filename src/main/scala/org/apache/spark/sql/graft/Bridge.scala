package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved these conversions behind
  * `private[sql] classic.ExpressionUtils`; third-party native expressions
  * reach them by living one object inside the sql package — the same
  * pattern public Spark connector libraries use. Nothing here is
  * proprietary API: both methods are stable internals used by every
  * session extension.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a 1-row/1-column DataFrame as a scalar subquery Column — the
    * channel Spark's own InjectRuntimeFilter uses to hand a bloom to
    * `might_contain`. The subquery executes ONCE as its own stage and
    * its value reaches codegen as a reference object; a driver-side
    * `collect` + `lit(bytes)` instead embeds the whole bitmap in the
    * expression tree (an O(bloom-size) plan literal — 800 KB plan
    * strings at gate scale, unbounded at 100 TB bloom sizings).
    */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))

  /** Re-wrap a MATERIALIZED DataFrame (localCheckpoint'ed — actions on
    * the result re-run its physical plan, so the input must be a cheap
    * stable scan) as a fresh LogicalRDD carrying DEFAULT stats.
    *
    * Why this exists: Catalyst's size-in-bytes estimator multiplies
    * child sizes at every join (SizeInBytesOnlyStatsPlanVisitor), and
    * checkpointing PRESERVES the estimate (LogicalRDD
    * rewriteStatsAndConstraints). An iterative algorithm whose
    * loop-carried frame goes through joins each round therefore
    * compounds the estimate multiplicatively per round — and with
    * NESTED iteration (Borůvka rounds each running a CC contraction
    * loop) the BigInt's digit count grows geometrically until a single
    * stats visit burns minutes in ToomCook multiplication (observed:
    * MstSpec hung 15+ min inside BigInteger.multiply under
    * rewriteStatsAndConstraints). Dropping to default stats at the
    * loop's checkpoint boundary caps the magnitude; the estimate was
    * meaningless for these frames anyway, and AQE re-plans from REAL
    * runtime sizes at execution.
    */
  def resetStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cls = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cls.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
