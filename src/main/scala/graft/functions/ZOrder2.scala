package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative LONG keys — the
  * multi-dimensional clustering primitive: sorting by z-value keeps rows
  * close in BOTH key dimensions physically close, so parquet row-group
  * min/max stats prune scans filtered on EITHER key (a single-column sort
  * clusters only its own column). This is how a 100 TB table serves
  * point-ish predicates on two independent columns without two copies of
  * the data.
  *
  * Bits 0..20 of each input interleave (a in even positions, b in odd) —
  * 21+21 = 42 result bits, headroom for any fixture key and for
  * dictionary-encoded values at scale. Inputs are masked to 21 bits; a
  * production build would validate the range at write time. Codegen'd
  * via the branch-free parallel-bit-spread ([[ZOrder2Util.interleave]]),
  * O(1) per row.
  */
@ExpressionDescription(
  usage = "z_order2(a, b) - Morton interleave of the low 21 bits of two LONG keys")
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType) match {
      case Seq(LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "z_order2 needs two BIGINT inputs, got " +
          other.map(_.simpleString).mkString(" / "))
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2Util.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder2Util.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Column wrapper, resolved through the session registry
    * ([[graft.plans.GraftExtensions]] injects `z_order2`).
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("z_order2", a, b)
}

/** Static kernel (top-level object ⇒ Java static forwarder, callable from
  * generated code).
  */
object ZOrder2Util {
  /** Spread the low 21 bits of v to even bit positions (0,2,4,...,40) —
    * the classic parallel bit-deposit ladder, branch-free.
    */
  def spread(v: Long): Long = {
    var x = v & 0x1FFFFFL                    // 21 bits
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}
