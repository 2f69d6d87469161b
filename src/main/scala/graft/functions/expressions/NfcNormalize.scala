package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization: `nfc(text)` — canonical composition, the
  * first step of every text-cleaning pipeline (a decomposed `e` +
  * COMBINING ACUTE and a precomposed `é` must hash, shingle, and dedup
  * identically; without NFC every digest-based operator in this engine
  * treats them as different documents). Spark has no native
  * normalization function; this wraps `java.text.Normalizer` (the
  * JDK's ICU-derived implementation) as a codegen'd unary expression,
  * so it runs inside whole-stage codegen like the sibling text
  * expressions. DuckDB's `nfc_normalize` is the oracle restatement
  * (q148).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real corpus text (ASCII is always NFC) —
  * only strings that actually need composing pay the rewrite.
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - Unicode NFC (canonical composition) normalization.")
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"text must be string, got $other")
    }

  override def nullSafeEval(textVal: Any): Any =
    NfcNormalize.compute(textVal.asInstanceOf[UTF8String])

  // Result is never null for non-null input — no null flag needed;
  // nullSafeCodeGen handles the input-null branch.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
        ${ev.value} =
          graft.functions.expressions.NfcNormalize.compute($t);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static so generated code can call it without captured references. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
