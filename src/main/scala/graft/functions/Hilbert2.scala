package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve distance of two non-negative LONG keys on a 2^16 × 2^16
  * grid — the second multi-dimensional clustering primitive beside
  * [[ZOrder2]]'s Morton interleave, and the one production layouts prefer
  * when scan predicates are RANGES rather than points: consecutive
  * Hilbert distances are always grid-NEIGHBORS (unit steps — no Morton
  * "seams" where the curve jumps across the keyspace), so a sort by
  * Hilbert distance gives each file/row group a tighter bounding box in
  * (key1, key2) space than the same-size z-sort, and range predicates on
  * either key touch fewer files.
  *
  * Algorithm: the classic per-bit quadrant walk (Hilbert 1891; the
  * iterative xy2d formulation popularized by the Wikipedia "Hilbert
  * curve" article and used by Iceberg/Delta layout implementations —
  * public knowledge): for each bit plane s from 2^15 down to 1, the
  * quadrant index (3·rx)⊕ry contributes s²·index to the distance and the
  * frame reflects/transposes so the child quadrant is walked in the
  * right orientation. Reflection uses n−1 = 65535, keeping x and y in
  * [0, 2^16) at every step — no negative intermediates, so the DuckDB
  * oracle's replay (a 16-step recursive CTE of the same integer
  * arithmetic) is sign-semantics-proof. Inputs are masked to 16 bits;
  * 32 distance bits out. O(16) per row, codegen'd via a static kernel
  * call exactly like [[ZOrder2]].
  */
@ExpressionDescription(
  usage = "hilbert2(a, b) - Hilbert-curve distance of the low 16 bits of two LONG keys")
case class Hilbert2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType) match {
      case Seq(LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "hilbert2 needs two BIGINT inputs, got " +
          other.map(_.simpleString).mkString(" / "))
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert2Util.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Hilbert2Util.xy2d($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Hilbert2 =
    copy(left = newLeft, right = newRight)
}

object Hilbert2 {
  /** Column wrapper, resolved through the session registry
    * ([[graft.plans.GraftExtensions]] injects `hilbert2`).
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("hilbert2", a, b)
}

/** Static kernel (top-level object ⇒ Java static forwarder, callable from
  * generated code).
  */
object Hilbert2Util {
  /** Order-16 Hilbert xy→distance. Every intermediate stays in
    * [0, 2^16) (reflection by 65535 of a 16-bit value), so the identical
    * arithmetic replays on any engine with plain non-negative integers.
    */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & 0xFFFFL
    var y = yIn & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0L) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
