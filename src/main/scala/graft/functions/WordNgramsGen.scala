package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram GENERATOR — a native Catalyst UDTF (one input row → n-gram
  * rows), completing the engine's custom-function triple: scalar
  * expressions ([[VecDot]], [[RollingMinHash]], …), the [[VectorMean]]
  * Aggregator, and this `Generator`. Registered as `word_ngrams(text, n)`
  * through `SparkSessionExtensions` ([[graft.plans.GraftExtensions]]), it
  * plans as a `Generate` node — the same operator `explode` rides — so
  * downstream aggregation sees ordinary rows and the n-gram array is
  * never materialized per row (the `transform`+`explode` formulation
  * allocates the full array before exploding it; the generator streams
  * windows straight out of the token split). Output multiplicity and
  * empty-handling match [[TextFunctions.wordNgrams]] exactly (spec-pinned):
  * multi-space tokens dropped, fewer-than-n tokens → no rows, NULL text →
  * no rows.
  *
  * Generators evaluate row-at-a-time inside `GenerateExec` (Spark's own
  * `explode` is special-cased; user generators are eval-based), so this is
  * `CodegenFallback` by design — the surrounding plan stages still codegen.
  */
@ExpressionDescription(
  usage = "word_ngrams(text, n) - emit one row per space-token n-gram of text")
case class WordNgramsGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1 && n <= 8, s"ngram width must be in [1, 8], got $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects STRING, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val toks = raw.asInstanceOf[UTF8String].toString
      .split(' ').filter(_.nonEmpty)
    if (toks.length < n) Nil
    else (0 to toks.length - n).map { i =>
      InternalRow(UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsGen =
    copy(child = newChild)
}
