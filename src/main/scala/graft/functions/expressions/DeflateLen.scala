package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)` — byte length of the raw-DEFLATE compression of
  * the text's UTF-8 bytes (zlib level 6, no header/checksum). The
  * compression RATIO `deflate_len(text) / octet_length(text)` is the
  * classic model-free quality signal for corpus curation (used by the
  * Gopher/MassiveText pipeline, Rae et al. 2021, arXiv:2112.11446):
  * boilerplate, tag soup and template spam compress far below natural
  * prose, and highly repetitive generator junk compresses below that —
  * a cheap complement to the heuristic quality screens (q44-family)
  * that needs no wordlists and no trained model.
  *
  * Engine shape: a codegen'd unary expression over the JDK's bundled
  * zlib — runs inside whole-stage codegen, one pass, no UDF. The
  * Deflater is THREAD-LOCAL and reset per row (allocating a native
  * zlib stream per row would dominate the cost); only the output
  * LENGTH is accumulated, the compressed bytes are never materialized.
  * Determinism: exact output length is a property of the JDK's zlib
  * and the fixed level — stable within a deployment, pinned by spec,
  * but deliberately NOT oracle-gated against another engine (DuckDB's
  * zlib build may differ); downstream thresholds treat it as a signal,
  * not a portable hash input.
  */
@ExpressionDescription(
  usage = "_FUNC_(text) - raw-DEFLATE compressed byte length of the text.")
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_len"

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
    DeflateLen.compute(textVal.asInstanceOf[UTF8String])

  // Result is never null for non-null input — local-null-flag pattern
  // not needed; nullSafeCodeGen handles the input-null branch.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
        ${ev.value} =
          graft.functions.expressions.DeflateLen.compute($t);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  val Level = 6 // zlib default: the ratio-vs-speed knee, and a constant
                // so every row of every run measures the same codec

  // One native zlib stream per executor thread, reset per row — the
  // allocation-free steady state a full-corpus scan needs.
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, true) // raw: no header/checksum
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Static so generated code can call it without captured references. */
  def compute(text: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    val buf = scratch.get()
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }
}
