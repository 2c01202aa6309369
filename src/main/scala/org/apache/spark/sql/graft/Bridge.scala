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
}
