package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * canonicalization step every dedup/fingerprint pipeline needs BEFORE
  * hashing: "é" as one code point and "e"+U+0301 are the same text to a
  * reader but different bytes to sha256/MinHash/SimHash, so un-normalized
  * corpora silently under-deduplicate. Spark has no normalization builtin
  * (SPARK-fn gap vs DuckDB's nfc_normalize); a Scala UDF would pay
  * serialization per row and break whole-stage codegen, so this is a
  * one-call `UnaryExpression` ([[NfcNormalizeUtil.nfc]]) inside the
  * generated stage.
  *
  * The kernel takes the JDK's `Normalizer.isNormalized` fast path first:
  * for already-composed text — in practice the overwhelming bulk of a
  * crawl, and ALL pure-ASCII text — it is a cheap scan with zero
  * allocation, so at 100 TB the normalization pass costs about as much as
  * a length() over the corpus.
  */
@ExpressionDescription(
  usage = "nfc_normalize(text) - canonical-composition (NFC) normalization of a STRING")
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a STRING input, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column wrapper, resolved through the session registry
    * ([[graft.plans.GraftExtensions]] injects `nfc_normalize`).
    */
  def apply(text: Column): Column =
    org.apache.spark.sql.functions.call_function("nfc_normalize", text)
}

/** Static kernel (top-level object ⇒ Java static forwarder, callable from
  * generated code).
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
