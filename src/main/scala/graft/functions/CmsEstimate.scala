package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe for Spark's `count_min_sketch` aggregate output —
  * the read side Spark never registered (the sketch binary is only
  * consumable from the JVM API). With this, heavy-hitter estimation is
  * expressible end-to-end in the DataFrame/SQL layer: build the sketch
  * distributedly (mergeable partial aggregation), broadcast the one-row
  * result, probe per candidate row.
  *
  * Probed items use the SAME representation CountMinSketchAgg fed the
  * sketch (UTF8String bytes for strings, the long value for integrals),
  * so estimates are exactly what the sketch recorded. The parsed sketch
  * is cached per byte-array REFERENCE: the binary arrives via a broadcast
  * 1-row cross join, so every row of a partition sees the same array
  * object and deserialization happens once per task, not per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string|bigint item), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  // one reference, swapped atomically: codegen shares this instance
  // across task threads, and a miss only costs a redundant deserialize
  @transient private var cache: (Array[Byte], CountMinSketch) = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    val c = cache
    if (c != null && (c._1 eq bytes)) c._2
    else {
      val s = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cache = (bytes, s)
      s
    }
  }

  def compute(sketch: Array[Byte], item: Any): Long = item match {
    case s: UTF8String => sketchFor(sketch).estimateCount(s.getBytes)
    case l: java.lang.Long => sketchFor(sketch).estimateCount(l.longValue())
    case other => sketchFor(sketch).estimateCount(other)
  }

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    compute(sketch.asInstanceOf[Array[Byte]], item)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this,
      classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev,
      (sk, it) => s"${ev.value} = $ref.compute($sk, $it);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch),
      Bridge.expression(item)))
}
