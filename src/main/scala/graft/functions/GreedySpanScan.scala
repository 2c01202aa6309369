package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy leftmost-longest entity-span walk over a position-sorted
  * `array<struct<pos:int, tok:string, len:int, tag:string>>` — the
  * codegen replacement for `Entities.templateSpans`' interpreted
  * `aggregate` HOF fold (which broke the whole-stage span of the
  * reassembly stage). Each element is one token with the LONGEST
  * dictionary match starting at it (`len` = matched token count, 0 for
  * none; `tag` = its entity type): the walk emits the tag and skips the
  * consumed tokens, or passes the token through — exactly the fold's
  * (out, skip) state machine, as one linear pass appending into a single
  * builder instead of per-step array concats. Returns the re-joined
  * (space-separated) templated text.
  *
  * Bit-parity with the HOF form is spec-asserted
  * (NativeExpressionsSpec); `Entities.templateSpansHof` keeps the fold
  * alive as the parity oracle.
  */
case class GreedySpanScan(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 4 &&
          s(0).dataType == IntegerType && s(1).dataType == StringType &&
          s(2).dataType == IntegerType && s(3).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<pos:int,tok:string,len:int," +
        s"tag:string>>, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_greedy_span_scan"

  def compute(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val sb = new java.lang.StringBuilder
    var skip = 0
    var first = true
    var i = 0
    while (i < n) {
      val e = a.getStruct(i, 4)
      if (skip > 0) {
        skip -= 1
      } else {
        val len = e.getInt(2)
        val out = if (len >= 1) { skip = len - 1; e.getUTF8String(3) }
                  else e.getUTF8String(1)
        if (!first) sb.append(' ')
        sb.append(if (out == null) "" else out.toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("greedySpanScan", this,
      classOf[GreedySpanScan].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GreedySpanScan = copy(child = newChild)
}

object GreedySpanScan {
  def apply(c: Column): Column =
    Bridge.column(GreedySpanScan(Bridge.expression(c)))
}
