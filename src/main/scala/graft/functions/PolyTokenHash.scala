package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's SQL-replayable polynomial token hash
  * `acc ← (acc·mult + codepoint) mod 1000003` over a token's code points,
  * as a native codegen expression.
  *
  * Replaces the former higher-order-function spelling
  * `aggregate(sequence(1, length(t)), 0L, (acc, i) -> …ascii(substring…))`
  * — Catalyst HOFs are `CodegenFallback` and evaluate their lambda
  * INTERPRETED per element, with a per-character `substring` allocation on
  * top; profiled on the corpus-wide hash consumers (l45, l14's k-lane
  * fingerprints) the lambda walk dominated the whole query. This loop is
  * branch-free per character, allocation-free, and stays inside the
  * surrounding WholeStageCodegen stage. Semantics are pinned to the HOF
  * spelling by `LlmSpec` (code-point iteration ≡ `ascii(substring(t,i,1))`
  * per character, including non-ASCII BMP and astral input), and the
  * DuckDB oracles replay the identical recurrence with `list_reduce`.
  */
@ExpressionDescription(
  usage = "poly_token_hash(tok, mult) - (((0·m + cp1)·m + cp2)…) mod 1000003 over tok's code points")
case class PolyTokenHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"poly_token_hash needs (STRING, BIGINT), got $other")
    }

  override def nullSafeEval(tok: Any, mult: Any): Any = {
    val s = tok.asInstanceOf[UTF8String].toString
    val m = mult.asInstanceOf[Long]
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * m + cp) % 1000003L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tok, mult) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |final String $s = $tok.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int $cp = $s.codePointAt($i);
         |  $acc = ($acc * $mult + $cp) % 1000003L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyTokenHash =
    copy(left = newLeft, right = newRight)
}
