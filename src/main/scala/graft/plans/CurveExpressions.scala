package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling-curve index expressions — the layout
  * alternative to bit-interleaved Z-values (Layout.zValue): one long per
  * row from 2-4 bucket indices, where consecutive curve positions are
  * always grid neighbors (Z-order jumps across the space at quadrant
  * boundaries, so a Hilbert sort keeps per-file min/max ranges at least
  * as narrow on every dimension at the same write cost).
  *
  * Same discipline as HashExpressions: interpreted eval and generated
  * code both call the one [[Kernels]] kernel; `doGenCode` is a static
  * call that participates in whole-stage codegen.
  */
case class Hilbert2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    Kernels.hilbert2(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.plans.Kernels.hilbert2($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class Hilbert3Expr(first: Expression, second: Expression, third: Expression, bits: Int)
    extends TernaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    Kernels.hilbert3(bits,
      x.asInstanceOf[Long], y.asInstanceOf[Long], z.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y, z) => s"graft.plans.Kernels.hilbert3($bits, $x, $y, $z)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

case class Hilbert4Expr(
    first: Expression, second: Expression, third: Expression, fourth: Expression,
    bits: Int)
    extends QuaternaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(x: Any, y: Any, z: Any, w: Any): Any =
    Kernels.hilbert4(bits, x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y, z, w) => s"graft.plans.Kernels.hilbert4($bits, $x, $y, $z, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object CurveExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Hilbert index of 2-4 long bucket-index columns on a 2^bits-per-side
    * grid. 2-D follows the canonical xy2d orientation (SQL-oracle
    * reproducible); 3-/4-D use Skilling's transpose algorithm.
    */
  def hilbertIndex(bucketCols: Seq[Column], bits: Int): Column = {
    require(bits >= 1 && bits <= 15, s"bits must be in [1,15], got $bits")
    val es = bucketCols.map(c => expression(c.cast("long")))
    es.size match {
      case 2 => column(Hilbert2Expr(es(0), es(1), bits))
      case 3 => column(Hilbert3Expr(es(0), es(1), es(2), bits))
      case 4 => column(Hilbert4Expr(es(0), es(1), es(2), es(3), bits))
      case n => throw new IllegalArgumentException(
        s"Hilbert index needs 2-4 dimensions, got $n")
    }
  }
}
