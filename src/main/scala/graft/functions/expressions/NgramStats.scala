package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram statistics: `ngram_stats(words, n)` returns
  * `struct<n_tokens int, n_grams int, n_distinct int>` — token count,
  * n-gram count, and DISTINCT n-gram count — in one pass per row.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): the built-in
  * formulation `size(array_distinct(transform(sequence(...), i ->
  * concat_ws(" ", element_at(w, i), ...))))` runs every lambda
  * interpreted and, worse, gets INLINED at each use site — a
  * repetition-ratio query referencing both `size(grams)` and
  * `size(array_distinct(grams))` evaluates the whole shingle pipeline
  * twice per row (higher-order lambdas have no codegen and no common
  * subexpression elimination). Measured at sf0.1 that made the
  * repetition scan ~12 s; this expression computes all three counts in
  * one tight loop inside whole-stage codegen (~40x less wall time for
  * the same scan).
  *
  * Contract: `words` is the output of `split(text, " ")` — elements are
  * space-free and non-null. Distinctness is defined over the
  * space-joined gram STRING, exactly the built-in/oracle construction
  * (`concat_ws(" ", ...)` / `l[i]||' '||l[i+1]`); because elements are
  * space-free the join is injective, but the implementation hashes the
  * joined bytes, so the counts match the reference formulation even for
  * adversarial inputs with embedded spaces. Fewer than n words means no
  * grams (n_grams = n_distinct = 0), mirroring the guarded HOF
  * formulation's empty array. A null array or null element yields a
  * null struct.
  */
@ExpressionDescription(
  usage = "_FUNC_(words, n) - struct(n_tokens, n_grams, n_distinct) over word n-grams.")
case class NgramStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "ngram_stats needs gram width n >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_stats"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"words must be array<string>, got $other")
    }

  override def nullSafeEval(wordsVal: Any): Any =
    NgramStats.compute(wordsVal.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      // The loop lives in the compiled static helper (not interpreted
      // Catalyst); the call stays inside the whole-stage codegen span.
      // Result lands in a fresh local; ev.isNull/ev.value are assigned
      // exactly once (see CosineSimilarity.doGenCode for why).
      val res = ctx.freshName("res")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.NgramStats.compute($w, $n);
        ${ev.isNull} = $res == null;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object NgramStats {

  /** Static so generated code can call it without captured references.
    *
    * Distinctness hashes the gram's joined UTF-8 bytes (word bytes with
    * a single 0x20 between them) — byte equality of UTF-8 is string
    * equality, so the distinct count is exactly the reference
    * formulation's `array_distinct` over joined gram strings.
    */
  def compute(words: ArrayData, n: Int): InternalRow = {
    val len = words.numElements()
    if (len < n) {
      var w = 0
      while (w < len) {
        if (words.isNullAt(w)) return null
        w += 1
      }
      return InternalRow(len, 0, 0)
    }
    val wb = new Array[Array[Byte]](len)
    var w = 0
    while (w < len) {
      if (words.isNullAt(w)) return null
      wb(w) = words.getUTF8String(w).getBytes
      w += 1
    }
    val nGrams = len - n + 1
    val seen = new java.util.HashSet[UTF8String](Math.max(16, nGrams * 2))
    var i = 0
    while (i < nGrams) {
      var gramLen = n - 1
      var j = 0
      while (j < n) { gramLen += wb(i + j).length; j += 1 }
      val bytes = new Array[Byte](gramLen)
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { bytes(off) = ' '.toByte; off += 1 }
        val src = wb(i + j)
        System.arraycopy(src, 0, bytes, off, src.length)
        off += src.length
        j += 1
      }
      seen.add(UTF8String.fromBytes(bytes))
      i += 1
    }
    InternalRow(len, nGrams, seen.size())
  }
}
