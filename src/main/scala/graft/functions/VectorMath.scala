package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector math (SURVEY §7.4 "custom only where bench
  * demands"): the embedding-similarity hot path evaluates a dot product
  * per candidate pair. The `zip_with`+`aggregate` higher-order-function
  * formulation is interpreted per element (lambda dispatch + an
  * intermediate array allocation per pair); at millions of pairs that
  * dominates the query. `DotProduct` is a codegen'd expression — the
  * generated code is a tight primitive loop over the two ArrayData
  * buffers, JIT-friendly, zero allocation — and stays inside whole-stage
  * codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  /** Null elements are only possible when the schema says so; the codegen
    * hot loop stays branch-free for containsNull=false inputs. lazy val:
    * constant per expression instance — the interpreted path evaluates
    * per row and must not re-derive it.
    */
  private lazy val anyContainsNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => false
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: array length mismatch " +
          s"(${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    val checkNulls = anyContainsNull
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i)))
        throw new IllegalArgumentException(
          s"$prettyName: null element at index $i")
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (anyContainsNull)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i))
             |  throw new IllegalArgumentException(
             |    "graft_dot: null element at index " + $i);""".stripMargin
        else ""
      s"""
         |if ($x.numElements() != $y.numElements())
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $x.numElements() +
         |    " vs " + $y.numElements() + ")");
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorMath {

  /** Codegen dot product of two array<double> columns. Sums left-to-right
    * in element order — the same order the HOF formulation and the DuckDB
    * oracle use, so results are bit-identical.
    */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm via the codegen dot. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))
}
