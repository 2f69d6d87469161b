package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash signature over a word array: `simhash(words, bits)`
  * returns the `bits`-char '0'/'1' signature string. Signature bit j
  * weighs digest bit `(64/bits)·j` of `md5(word)` (so bits = 64 reads
  * the digest's first 64 bits sequentially, and bits = 16 reads each
  * nibble's high bit — exactly the two published formulations in
  * [[graft.operators.Dedup]]), term-frequency weighted: each word
  * OCCURRENCE contributes +1 to bit j when its digest bit is set, -1
  * otherwise, and bit j of the signature is '1' iff the sum is > 0.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): signature
  * extraction is per-document, yet the aggregate formulation
  * (explode words → groupBy id → 64 conditional sums) shuffles the
  * ENTIRE word stream once per corpus and pays 64 substring/isin
  * evaluations per word. This expression is a per-row digest loop
  * inside whole-stage codegen: ZERO shuffle, one md5 per distinct word
  * per row (memoized within the row), and banding downstream needs
  * only its own exchange. The aggregate formulation survives as the
  * spec differential ([[graft.operators.Dedup.simhashSignaturesAgg]]).
  *
  * Null semantics mirror the aggregate formulation exactly: a null
  * ARRAY yields a null signature (the exploded row set is empty, so
  * the id vanishes — callers filter on the body column, see
  * [[graft.operators.Dedup.simhashSignatures]]); a null ELEMENT
  * contributes -1 to every bit (its md5 is null, so every
  * `when(...isin...)` falls to the -1 branch).
  */
@ExpressionDescription(
  usage = "_FUNC_(words, bits) - SimHash bitstring (bits of md5, stride 64/bits).")
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64 && 64 % bits == 0,
    "simhash needs bits in {1,2,4,8,16,32,64} (a divisor of the digest's first 64 bits)")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash"

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
    SimHashBits.compute(wordsVal.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      // The loop lives in the compiled static helper (not interpreted
      // Catalyst); the call stays inside the whole-stage codegen span.
      // Result lands in a fresh local; ev.isNull/ev.value are assigned
      // exactly once (see CosineSimilarity.doGenCode for why).
      val res = ctx.freshName("res")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.SimHashBits.compute($w, $bits);
        ${ev.isNull} = $res == null;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {

  /** Static so generated code can call it without captured references. */
  def compute(words: ArrayData, bits: Int): UTF8String = {
    val len = words.numElements()
    val stride = 64 / bits
    val counters = new Array[Int](bits)
    val memo = new java.util.HashMap[UTF8String, Array[Byte]]()
    val md = MessageDigest.getInstance("MD5")
    var w = 0
    while (w < len) {
      if (words.isNullAt(w)) {
        // null word: md5 is null, every when(...isin...) falls to -1.
        var j = 0
        while (j < bits) { counters(j) -= 1; j += 1 }
      } else {
        val word = words.getUTF8String(w)
        var d = memo.get(word)
        if (d == null) {
          md.reset()
          d = md.digest(word.getBytes)
          memo.put(word, d)
        }
        var j = 0
        while (j < bits) {
          val bitIdx = stride * j
          val bit = (d(bitIdx >>> 3) >>> (7 - (bitIdx & 7))) & 1
          counters(j) += (if (bit == 1) 1 else -1)
          j += 1
        }
      }
      w += 1
    }
    val out = new Array[Char](bits)
    var j = 0
    while (j < bits) {
      out(j) = if (counters(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}
