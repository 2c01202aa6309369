package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition profile in ONE pass:
  * `struct(total, distinct, max_cnt)` over the word n-grams of the text —
  * the Gopher-style repetition features (top-n-gram share, duplicate
  * n-gram fraction) without materializing, exploding, or shuffling the
  * n-grams themselves.
  *
  * Semantically identical to
  * `explode(TextOps.shingles(tokens, n)) → groupBy(doc, gram).count →
  * groupBy(doc).agg(sum, count, max)` (and to the DuckDB oracle's
  * unnest/list_transform pipeline) — same tokenization as
  * [[WordShingles]] (trim + lower + `\s+` split; a doc shorter than n
  * words yields its single shorter shingle). The two-groupBy form
  * shuffles every n-gram occurrence across the cluster (O(corpus tokens)
  * shuffle rows); this is a per-row scan-side expression, so the
  * repetition query is a straight projection over the parquet scan.
  */
case class NgramStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("distinct", LongType, nullable = false),
    StructField("max_cnt", LongType, nullable = false)))
  override def prettyName: String = "graft_ngram_stats"

  def compute(u: UTF8String): InternalRow = {
    val s = u.trim().toLowerCase.toString
    val toks = NgramStats.WS.split(s, -1)
    val counts = new java.util.HashMap[String, Long]
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
    } else {
      counts.put(toks.mkString(" "), 1L)
    }
    var total = 0L
    var max = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      total += c
      if (c > max) max = c
    }
    new GenericInternalRow(Array[Any](total, counts.size.toLong, max))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramStats", this,
      classOf[NgramStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramStats = copy(child = newChild)
}

object NgramStats {
  private val WS = Pattern.compile("\\s+")

  def apply(c: Column, n: Int): Column =
    Bridge.column(NgramStats(Bridge.expression(c), n))
}
