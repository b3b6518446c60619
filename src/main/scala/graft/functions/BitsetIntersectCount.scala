package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** popcount(A & B) for two BITSET columns stored as ARRAY<BIGINT> word
  * arrays, as a native Catalyst expression with whole-stage codegen —
  * [[SortedIntersectCount]]'s sibling for the dense (saturated-universe)
  * set representation the round-12 dedup regime pick introduces.
  *
  * Why not `aggregate(zip_with(a, b, (x, y) -> bit_count(x & y)), 0L,
  * (acc, v) -> acc + v)`: higher-order functions evaluate INTERPRETED —
  * per-row lambda closures and a materialized zip_with array — and the
  * verify stage runs one intersect per candidate pair, millions at probe
  * scale. The first bitset-verify probe shipped the HOF form and the l2b
  * 16× rung read 120 s where the array representation's codegen'd merge
  * read ~95: the byte win of bitsets was being paid back as interpreted
  * CPU. This expression is the ~10-word AND/popcount loop the
  * representation was priced on, inside the surrounding
  * WholeStageCodegen stage.
  *
  * Word counts normally agree (both sides built from one universe); the
  * loop runs to the shorter length defensively — missing high words are
  * all-zero by construction.
  */
@ExpressionDescription(
  usage = "bitset_intersect_count(a, b) - popcount of the AND of two ARRAY<BIGINT> bitsets")
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType) match {
      // containsNull must be false: eval/codegen call getLong per element
      // unchecked (a null element would read garbage from UnsafeArrayData
      // or NPE from GenericArrayData). Internal bitsets are built from
      // Array[Long] encoders (containsNull = false by construction); a
      // SQL caller with a nullable-element array is rejected at analysis
      // instead of corrupting counts at runtime (r12 ADVICE).
      case Seq(ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bitset_intersect_count needs two ARRAY<BIGINT> inputs with " +
            s"non-nullable elements, got " +
            other.map(_.simpleString).mkString(" / "))
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var i = 0; var c = 0L
    while (i < n) {
      c += java.lang.Long.bitCount(xs.getLong(i) & ys.getLong(i))
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BitsetIntersectCount =
    copy(left = newLeft, right = newRight)
}

object BitsetIntersectCount {
  /** Column wrapper: popcount(a & b) for ARRAY<BIGINT> bitset columns.
    * Resolved through the session function registry
    * ([[graft.plans.GraftExtensions]] injects `bitset_intersect_count`).
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("bitset_intersect_count", a, b)
}
