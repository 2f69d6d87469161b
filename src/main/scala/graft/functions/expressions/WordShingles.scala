package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle generator: `word_shingles(words, n)` returns the
  * array of space-joined n-grams — `["a b c","b c d",…]` for n = 3.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): the gram STREAM
  * (not just gram counts — that is [[NgramStats]]) feeds every
  * dedup/decontamination join, and both built-in formulations are
  * wrong at scale. The HOF form (`transform(sequence(...), i ->
  * concat_ws(...))`) runs interpreted per element with no codegen and
  * no CSE; the posexplode + window-`lead` form compiles but SHUFFLES
  * the whole exploded token stream on doc id just to reassemble
  * adjacency that was free before the explode. This expression emits
  * the gram array in one tight per-row loop inside whole-stage
  * codegen; `explode` (a generator, no exchange) then yields the
  * stream — the corpus-scale gram pipeline becomes zero-shuffle.
  *
  * Contract mirrors the HOF formulation exactly: fewer than n words →
  * EMPTY array (the guarded `when(size >= n, …).otherwise(array())`);
  * a null array or null element → null. Grams join word bytes with a
  * single 0x20, identical to `concat_ws(" ", …)` / the oracles'
  * `l[i]||' '||l[i+1]`.
  */
@ExpressionDescription(
  usage = "_FUNC_(words, n) - array of space-joined word n-grams.")
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "word_shingles needs gram width n >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles"

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
    WordShingles.compute(wordsVal.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      // The loop lives in the compiled static helper (not interpreted
      // Catalyst); the call stays inside the whole-stage codegen span.
      // Result lands in a fresh local; ev.isNull/ev.value are assigned
      // exactly once (see CosineSimilarity.doGenCode for why).
      val res = ctx.freshName("res")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.WordShingles.compute($w, $n);
        ${ev.isNull} = $res == null;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Static so generated code can call it without captured references.
    * Byte-level join (word bytes + single 0x20 separators) — identical
    * output to `concat_ws(" ", …)` for any input, including embedded
    * spaces.
    */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    var w = 0
    while (w < len) {
      if (words.isNullAt(w)) return null
      w += 1
    }
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val wb = new Array[Array[Byte]](len)
    w = 0
    while (w < len) {
      wb(w) = words.getUTF8String(w).getBytes
      w += 1
    }
    val nGrams = len - n + 1
    val out = new Array[Any](nGrams)
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
      out(i) = UTF8String.fromBytes(bytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}
