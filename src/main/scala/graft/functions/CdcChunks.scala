package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunks of the normalized text in ONE pass: a chunk
  * boundary falls AFTER token j whenever sha256 of the ≤3-token window
  * ending at j starts with hex '0' (FastCDC/rsync at token granularity —
  * boundaries follow content, never position, so chunk digests survive
  * the offset shifts that break fixed-width chunking).
  *
  * Semantically identical to the composed HOF reference form
  * [[graft.ops.llm.TextOps.cdcChunks]] (and to the DuckDB oracle's
  * list_filter/list_prepend pipeline) — CdcSpec pins the equivalence —
  * but orders of magnitude faster: the composed form re-evaluates the
  * whole interpreted cut pipeline (a sha256 per token) for EVERY
  * element_at of the outer chunk-building transform, i.e. O(chunks ×
  * tokens) digests per row plus per-lambda allocation churn; this is
  * O(tokens) digests with one reused MessageDigest and a single output
  * allocation.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  def compute(u: UTF8String): ArrayData = {
    val s = u.trim().toLowerCase.toString
    val toks = CdcChunks.WS.split(s, -1)
    val n = toks.length
    val md = MessageDigest.getInstance("SHA-256")
    val out = new java.util.ArrayList[UTF8String]
    val sb = new java.lang.StringBuilder
    var start = 0
    var j = 1 // cut-after candidate: 1-based token index, 1..n-1
    while (j < n) {
      val lo = math.max(j - 3, 0)
      sb.setLength(0)
      var k = lo
      while (k < j) {
        if (k > lo) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) == 0) {
        out.add(UTF8String.fromString(
          CdcChunks.join(toks, start, j)))
        start = j
      }
      j += 1
    }
    out.add(UTF8String.fromString(CdcChunks.join(toks, start, n)))
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("chunker", this,
      classOf[CdcChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunks = copy(child = newChild)
}

object CdcChunks {
  private val WS = Pattern.compile("\\s+")

  private def join(toks: Array[String], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < until) {
      if (i > from) sb.append(' ')
      sb.append(toks(i))
      i += 1
    }
    sb.toString
  }

  def apply(c: Column): Column =
    Bridge.column(CdcChunks(Bridge.expression(c)))
}
