package graft.functions.expressions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a word array: `minhash_sig(words, k, n)`
  * returns the k-column signature as `array<string>` — element i is the
  * lexicographic minimum over all word-n-grams of
  * `substring(md5(i + ":" + gram), 1, 16)` — or null when the document
  * has fewer than n words (it has no shingles).
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): signature extraction
  * is per-document — it needs no other row — yet every built-in
  * formulation either shuffles (posexplode → window-lead shingles →
  * min-aggregate per id: one full word-stream exchange + sort) or runs
  * interpreted (higher-order `transform`/`aggregate` lambdas have no
  * codegen, measured ~5× slower). This expression makes the whole
  * signature a tight per-row loop inside whole-stage codegen: ZERO
  * shuffle, and LSH banding downstream then needs only one exchange
  * (the band-bucket groupBy) end to end.
  *
  * Hash values are 16-hex-char strings (lexicographic min == numeric
  * min) so signatures stay portable across engines — identical to the
  * aggregate formulation in [[graft.operators.Dedup.minhashSignatures]]
  * and the DuckDB oracle restatement.
  */
@ExpressionDescription(
  usage = "_FUNC_(words, k, n) - MinHash signature (k hashes, word n-grams).")
case class MinHashSignature(child: Expression, k: Int, n: Int)
    extends UnaryExpression {

  require(k >= 1 && n >= 1, "minhash_sig needs k >= 1 hash seeds and n >= 1 gram width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

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
    MinHashSignature.compute(wordsVal.asInstanceOf[ArrayData], k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      // The loop lives in the compiled static helper (not interpreted
      // Catalyst); the call stays inside the whole-stage codegen span.
      // Result lands in a fresh local; ev.isNull/ev.value are assigned
      // exactly once (see CosineSimilarity.doGenCode for why).
      val res = ctx.freshName("res")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.MinHashSignature.compute($w, $k, $n);
        ${ev.isNull} = $res == null;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  private val HEX = "0123456789abcdef".toCharArray

  /** First 8 digest bytes as 16 lowercase hex chars — the
    * `substring(md5(x), 1, 16)` the aggregate formulation takes.
    */
  private def hex16(d: Array[Byte]): String = {
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static so generated code can call it without captured references.
    *
    * Works on raw UTF-8 bytes: each word is decoded once (not once per
    * gram appearance × seed), and the digested byte stream
    * `"<seed>:" ++ w(i) ++ ' ' ++ … ++ w(i+n-1)` is byte-identical to
    * UTF-8 of the string concatenation the contract (and the oracle's
    * `md5('<seed>:'||gram)`) specifies — UTF-8 of a concatenation is
    * the concatenation of UTF-8.
    */
  def compute(words: ArrayData, k: Int, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) return null
    val wb = new Array[Array[Byte]](len)
    var w = 0
    while (w < len) {
      // A null element makes the whole signature null: there is no
      // defined gram over a missing word, and the SQL surface accepts
      // containsNull arrays (the DataFrame path's split() never
      // produces them).
      if (words.isNullAt(w)) return null
      wb(w) = words.getUTF8String(w).getBytes
      w += 1
    }
    val prefixes = Array.tabulate(k)(s => (s.toString + ":").getBytes(UTF_8))
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i <= len - n) {
      var s = 0
      while (s < k) {
        md.reset()
        md.update(prefixes(s))
        var j = 0
        while (j < n) {
          if (j > 0) md.update(' '.toByte)
          md.update(wb(i + j))
          j += 1
        }
        val h = hex16(md.digest())
        if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): AnyRef))
  }
}
