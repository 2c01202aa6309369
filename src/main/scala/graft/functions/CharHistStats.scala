package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-histogram profile in ONE pass:
  * `struct(n_chars, distinct, sum_sq, h_micro)` over the code points of
  * the input string — the base facts for character-diversity quality
  * signals (Gini impurity, distinct-char ratio, Shannon entropy) without
  * materializing one row per character.
  *
  * `h_micro` is the Shannon entropy in integer micro-nats under the
  * repo's float-entropy discipline (q_user_entropy / q_info_gain): each
  * char's −1e6·p·ln p term is HALF_UP-rounded to a long INDEPENDENTLY
  * (matching Spark/DuckDB `round(double)`) and the longs summed — an
  * order-free integer sum, so the hashmap iteration order here and the
  * GROUP BY order in the oracle cannot diverge.
  *
  * Semantically identical to exploding the string into 1-char substrings
  * and aggregating `count(*), count(DISTINCT ch), sum(cnt*cnt)` (the
  * DuckDB oracle's generate_series/substr pipeline): `n_chars` counts
  * code points exactly like Spark/DuckDB `length()`, and each code point
  * is one histogram key exactly like `substr(s, i, 1)`. The explode form
  * shuffles every character of the corpus; the per-row HOF form
  * (`transform` + nested `filter`) stays scan-side but is interpreted and
  * O(distinct·n) per doc — measured 66 s at sf0.1 vs 0.5 s for this
  * expression. One linear scan, a small int-keyed histogram, codegen via
  * the same compute-object pattern as [[NgramStats]].
  */
case class CharHistStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("h_micro", LongType, nullable = false)))
  override def prettyName: String = "graft_char_hist"

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val counts = new java.util.HashMap[Integer, Long]
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var ss = 0L
    var h = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      ss += c * c
      if (n > 0) {
        val pr = c.toDouble / n.toDouble
        // one term per distinct char, rounded like SQL round(double)
        // (HALF_UP) BEFORE summing — order-free integer entropy
        h += java.math.BigDecimal.valueOf(-1000000.0 * pr * math.log(pr))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
    }
    new GenericInternalRow(Array[Any](n, counts.size.toLong, ss, h))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charHistStats", this,
      classOf[CharHistStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharHistStats = copy(child = newChild)
}

object CharHistStats {
  def apply(c: Column): Column =
    Bridge.column(CharHistStats(Bridge.expression(c)))
}
