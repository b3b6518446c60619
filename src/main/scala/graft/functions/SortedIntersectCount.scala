package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two SORTED ARRAY<BIGINT> columns, as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Why not `size(array_intersect(a, b))`: the built-in builds a hash set
  * per row AND materializes the intersection as an `UnsafeArrayData` only
  * to take its length — profiled at microseconds per call, which dominates
  * near-dup verification when candidates number in the millions (L2 at
  * sf0.1). A two-pointer merge over pre-sorted arrays needs no per-row
  * allocation at all: ~100 ns for 300-element sets, >10× faster, and the
  * generated code stays inside the surrounding WholeStageCodegen stage.
  *
  * Preconditions: both inputs sorted ascending (the dedup pipeline builds
  * them with `sort_array`), null-free elements. Duplicate elements are
  * counted min(multiplicity) times — sets in practice.
  */
@ExpressionDescription(
  usage = "sorted_intersect_count(a, b) - count of common elements of two sorted BIGINT arrays")
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType) match {
      case Seq(ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count needs two ARRAY<BIGINT> inputs, got " +
            other.map(_.simpleString).mkString(" / "))
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = xs.numElements(); val m = ys.numElements()
    while (i < n && j < m) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $i = 0, $j = 0;
         |final int $n = $a.numElements(), $m = $b.numElements();
         |long ${ev.value}_acc = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}_acc++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column wrapper: |a ∩ b| for sorted ARRAY<BIGINT> columns. Resolved
    * through the session function registry ([[graft.plans.GraftExtensions]]
    * injects `sorted_intersect_count` via `spark.sql.extensions`).
    */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)
}
