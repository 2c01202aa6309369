package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi subword segmentation (the SentencePiece serving
  * kernel): split a word into the vocabulary pieces minimizing the summed
  * piece cost (cost = quantized −ln of the piece's unigram probability).
  * This is the third tokenizer family next to the BPE merge replay
  * (`ops.llm.Bpe`) and WordPiece greedy longest-match
  * ([[PieceTokenize]]): BPE replays learned merges, MaxMatch is greedy
  * local, Viterbi is globally OPTIMAL for the given piece costs.
  *
  * Determinism: ties on total cost are broken by the segmentation path
  * joined with U+0001, compared byte-lexicographically — the same total
  * order DuckDB's binary VARCHAR compare applies when the oracle
  * enumerates ALL segmentations and picks the first by (cost, path).
  * The exchange argument making the tie DP-safe: two same-cost paths to
  * the same position are never byte-prefixes of one another (equal
  * character mass, separators in different places), so their first
  * differing byte survives any common suffix.
  *
  * The (piece → cost) table rides IN the expression as a hash map
  * (vocab-sized driver state, the [[PieceTokenize]] footprint class);
  * per-word work is O(len · maxPieceLen) probes + one path rebuild.
  * A character with no vocabulary entry passes through as a single-char
  * piece at `unkCost` (corpus-derived vocabularies contain every corpus
  * character, so on their own corpus this never fires; spec-pinned on a
  * synthetic input). Codegen calls straight into [[compute]].
  */
case class ViterbiTokenize(child: Expression, vocab: Seq[(String, Long)],
                           unkCost: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_viterbi_tokenize"

  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max

  // java.lang.Long values: a scala.Long-valued java map unboxes an absent
  // key's null to 0L, silently making every out-of-vocab piece free
  @transient private lazy val costs
      : java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) =>
      m.put(UTF8String.fromString(p), java.lang.Long.valueOf(c))
    }
    m
  }

  // joined with U+0001 (what the oracle's chr(1) join uses): the
  // separator sorts below every word character, so joined-string byte
  // order equals piece-sequence lexicographic order
  private val SEP = UTF8String.fromString("\u0001")

  def compute(word: UTF8String): GenericArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // forward DP: per end-position the minimal (cost, joined-path) and
    // the length of the winning last piece (for the backtrack)
    val cost = new Array[Long](n + 1)
    val path = new Array[UTF8String](n + 1)
    val lastLen = new Array[Int](n + 1)
    java.util.Arrays.fill(cost, Long.MaxValue)
    cost(0) = 0L
    path(0) = UTF8String.EMPTY_UTF8
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (cost(i - l) != Long.MaxValue) {
          val piece = word.substringSQL(i - l + 1, l)
          val c: java.lang.Long = costs.get(piece)
          // unknown chars only ever enter as single-char pieces
          val pieceCost: Long =
            if (c != null) c.longValue() else if (l == 1) unkCost else -1L
          if (pieceCost >= 0L) {
            val cand = cost(i - l) + pieceCost
            if (cand < cost(i)) {
              cost(i) = cand
              path(i) = if (i == l) piece
                else UTF8String.concat(path(i - l), SEP, piece)
              lastLen(i) = l
            } else if (cand == cost(i)) {
              val candPath = if (i == l) piece
                else UTF8String.concat(path(i - l), SEP, piece)
              if (candPath.compareTo(path(i)) < 0) {
                path(i) = candPath
                lastLen(i) = l
              }
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // backtrack the winning piece lengths (path() held the tie-break key;
    // the pieces themselves rebuild zero-copy from the word)
    var k = n
    var cnt = 0
    while (k > 0) { cnt += 1; k -= lastLen(k) }
    val out = new Array[Any](cnt)
    k = n
    var slot = cnt - 1
    while (k > 0) {
      val l = lastLen(k)
      out(slot) = word.substringSQL(k - l + 1, l)
      slot -= 1
      k -= l
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("viterbiTokenize", this,
      classOf[ViterbiTokenize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ViterbiTokenize = copy(child = newChild)
}

object ViterbiTokenize {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  def apply(col: Column, vocab: Seq[(String, Long)],
            unkCost: Long): Column =
    Bridge.column(ViterbiTokenize(Bridge.expression(col), vocab, unkCost))
}
