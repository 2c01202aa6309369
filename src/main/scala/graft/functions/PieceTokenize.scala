package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword segmentation (the WordPiece /
  * MaxMatch serving kernel): at each position take the LONGEST vocabulary
  * piece that matches, emit it, advance past it. A character with no
  * vocabulary match passes through as a single-char piece (the vocabulary
  * construction in `ops.llm.WordPiece` includes every corpus character, so
  * on its own corpus this branch never fires; pinned in the spec on a
  * synthetic input).
  *
  * The vocabulary rides IN the expression (a driver-built reference
  * object, vocab-sized — same footprint class as the BPE merge table) as
  * a hash set of UTF8Strings grouped by piece length, so the per-position
  * work is at most `maxLen` hash probes on zero-copy substring views.
  * Codegen calls straight into [[compute]] — one virtual call per row,
  * the whole-stage span stays intact.
  */
case class PieceTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_piece_tokenize"

  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

  @transient private lazy val pieces: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](vocab.size * 2)
    vocab.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }

  def compute(word: UTF8String): GenericArrayData = {
    val n = word.numChars()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var pos = 0
    while (pos < n) {
      var len = math.min(maxLen, n - pos)
      var hit: UTF8String = null
      while (hit == null && len >= 1) {
        val cand = word.substringSQL(pos + 1, len)
        if (pieces.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null) { // unmatched char passes through
        out += word.substringSQL(pos + 1, 1)
        pos += 1
      } else {
        out += hit
        pos += len
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pieceTokenize", this,
      classOf[PieceTokenize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PieceTokenize = copy(child = newChild)
}

object PieceTokenize {
  def apply(c: Column, vocab: Seq[String]): Column =
    Bridge.column(PieceTokenize(Bridge.expression(c), vocab))
}
