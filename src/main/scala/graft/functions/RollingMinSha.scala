package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint in one pass: min sha256 (lowercase hex) over all
  * `w`-char sliding windows of the normalized text.
  *
  * Semantically identical to
  * `array_min(transform(sequence(1, greatest(len-w+1, 1)),
  *   i => sha2(substr(norm, i, w), 256)))` — and to the DuckDB oracle —
  * but with one reused MessageDigest, min tracked on raw digest bytes
  * (hex encoding is order-preserving for unsigned byte order), and a
  * single output allocation, instead of per-window interpreted lambdas +
  * hex strings.
  */
case class RollingMinSha(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_rolling_min_sha"

  def compute(u: UTF8String): UTF8String = {
    val norm = u.trim().toLowerCase
    val n = norm.numChars()
    val md = MessageDigest.getInstance("SHA-256")
    var best: Array[Byte] = null
    val last = math.max(n - w, 0)
    var i = 0
    while (i <= last) {
      md.reset()
      val digest = md.digest(
        norm.substring(i, math.min(i + w, n)).getBytes)
      if (best == null || unsignedLess(digest, best)) best = digest
      i += 1
    }
    UTF8String.fromString(hex(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("roller", this,
      classOf[RollingMinSha].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingMinSha = copy(child = newChild)
}

object RollingMinSha {
  def apply(c: Column, w: Int): Column =
    Bridge.column(RollingMinSha(Bridge.expression(c), w))
}
