package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a bloom COLUMN. Spark's own
  * `might_contain` insists the filter side is a constant or scalar
  * subquery (its runtime-filter use ships exactly one bloom per
  * query); a zone-map table carries one bloom PER ROW, which that
  * contract cannot express. This probe deserializes the row's filter
  * and tests the xxhash64 value — with a per-thread last-filter memo
  * keyed by array reference, so probing the same zone row's bloom
  * against several keys pays one deserialization, not several.
  *
  * Scale note: the input is a zone-map/manifest table (one row per
  * file — metadata-scale), never a data table; deserialization per
  * zone row is noise next to even one skipped file read.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got ($l, $r)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomContains.filterFor(bloom.asInstanceOf[Array[Byte]])
      .mightContainLong(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomContains.filterFor($b).mightContainLong($h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {

  /** Column API: `contains(bloomBinaryCol, xxhash64Col)`. */
  def contains(bloom: Column, hash: Column): Column =
    Bridge.column(BloomContains(
      Bridge.expression(bloom), Bridge.expression(hash)))

  private val last =
    new ThreadLocal[(Array[Byte], BloomFilter)]

  /** Deserialize `bytes` as a BloomFilter, memoizing the last filter
    * per thread by ARRAY REFERENCE (same row probed with another key →
    * cache hit; a different row's bytes → miss and replace).
    */
  def filterFor(bytes: Array[Byte]): BloomFilter = {
    val hit = last.get()
    if (hit != null && (hit._1 eq bytes)) hit._2
    else {
      val f = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      last.set((bytes, f))
      f
    }
  }
}
