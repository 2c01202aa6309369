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
}
