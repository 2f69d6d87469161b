package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-n-gram statistics: `char_ngram_stats(text, n)`
  * returns `struct<n_chars int, n_grams int, n_distinct int>` — the
  * code-point count, sliding char-n-gram count, and DISTINCT
  * char-n-gram count — in one pass per row.
  *
  * Purpose: a PORTABLE compressibility proxy. DEFLATE's gain comes from
  * repeated substrings; the distinct-char-4-gram / total-char-4-gram
  * ratio tracks the same repetition signal but is exactly reproducible
  * in any SQL engine (a substring comprehension + list_distinct in
  * DuckDB), unlike the raw deflate byte length, which depends on the
  * zlib build (see [[DeflateLen]]). The q180b gate bands documents with
  * this ratio so the banding logic of the q180 compression screen gets
  * a hash-matched oracle.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): same rationale as
  * [[NgramStats]] — the built-in `transform(sequence(...), i ->
  * substring(...))` formulation runs interpreted with no CSE, and a
  * query needing both the total and the distinct count would evaluate
  * the whole gram pipeline twice per row. One tight loop inside
  * whole-stage codegen instead.
  *
  * Contract: grams are windows of n Unicode CODE POINTS (matching
  * DuckDB's character-based `substr`; surrogate pairs count once).
  * Fewer than n code points → n_grams = n_distinct = 0. Null text →
  * null struct. Distinctness is exact (hash-set of gram strings), not
  * probabilistic — an oracle hash-compare needs exact counts.
  */
@ExpressionDescription(
  usage = "_FUNC_(text, n) - struct(n_chars, n_grams, n_distinct) over char n-grams.")
case class CharNgramStats(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "char_ngram_stats needs gram width n >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "char_ngram_stats"

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
    CharNgramStats.compute(textVal.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      // The loop lives in the compiled static helper (not interpreted
      // Catalyst); the call stays inside the whole-stage codegen span.
      // Result lands in a fresh local; ev.isNull/ev.value are assigned
      // exactly once (see CosineSimilarity.doGenCode for why).
      val res = ctx.freshName("res")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.CharNgramStats.compute($t, $n);
        ${ev.isNull} = $res == null;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgramStats =
    copy(child = newChild)
}

object CharNgramStats {

  /** Static so generated code can call it without captured references.
    *
    * Decodes once to a code-point array, then hashes each n-code-point
    * window as a String. String equality over identical code-point
    * windows is exact, so the distinct count equals the reference
    * `list_distinct([substr(text, i, n) ...])` formulation.
    */
  def compute(text: UTF8String, n: Int): InternalRow = {
    val s = text.toString
    val cps = s.codePoints().toArray
    val len = cps.length
    if (len < n) return InternalRow(len, 0, 0)
    val nGrams = len - n + 1
    val seen = new java.util.HashSet[String](Math.max(16, nGrams * 2))
    var i = 0
    while (i < nGrams) {
      seen.add(new String(cps, i, n))
      i += 1
    }
    InternalRow(len, nGrams, seen.size())
  }
}
