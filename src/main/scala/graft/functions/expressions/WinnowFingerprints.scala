package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selector: `winnow_fp(text, k, w)`
  * returns the DISTINCT selected fingerprints (md5 hex of char
  * `k`-grams, minimum per `w`-gram window, first-occurrence order —
  * exactly `array_distinct(transform(windows, j ->
  * array_min(slice(grams, j, w))))`, the HOF restatement kept as the
  * spec differential in [[graft.operators.Dedup]]).
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): the HOF chain
  * runs interpreted per row and re-scans every window — O(n·w)
  * UTF8String comparisons plus a slice allocation per window; q120
  * was the suite's slowest query on it (8.6 s at sf0.1). This is one
  * per-row loop in whole-stage codegen: each gram hashed once, the
  * sliding minimum maintained by a monotonic deque (amortized O(n)
  * total comparisons), zero shuffle.
  *
  * Contract mirrors the HOF form exactly: text shorter than
  * k + w − 1 chars (or null) yields an EMPTY array on the callers'
  * length guard — here null text → null, and the operator's `where`
  * drops it identically.
  */
@ExpressionDescription(
  usage = "_FUNC_(text, k, w) - winnowing fingerprints (md5 of char k-grams, min per w-window).")
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 2, "winnow_fp needs k >= 2 and w >= 2")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fp"

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
    WinnowFingerprints.compute(textVal.asInstanceOf[UTF8String], k, w)

  // Null-result flag is a fresh LOCAL, copied into ev.isNull exactly
  // once at the end (the DivModLike convention shared by every sibling
  // expression — see CosineSimilarity's scaladoc): ev.isNull must never
  // be assigned from computed sub-expressions of a snippet, because
  // codegen contexts that resolve isNull to a non-local (split methods,
  // literal false under refined nullability) can't compile the
  // assignment and silently fall back to interpretation.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val res = ctx.freshName("res")
      val resNull = ctx.freshName("resNull")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.WinnowFingerprints.compute($t, $k, $w);
        boolean $resNull = ($res == null);
        ${ev.isNull} = $resNull;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Position-aware winnowing selector: `winnow_fp_pos(text, k, w)`
  * returns the DISTINCT selected gram positions as
  * `array<struct<fp: string, pos: int>>` — `pos` the 1-based char
  * index where the selected `k`-gram starts, `fp` its md5 hex. Same
  * selection rule (and the same monotonic-deque O(n) loop) as
  * [[WinnowFingerprints]]; the positions are what substring-span
  * REMOVAL needs — a fingerprint hit at `pos` is evidence that chars
  * `[pos, pos+k-1]` are duplicated, and
  * [[graft.operators.Dedup.removeDuplicatedSpans]] merges those
  * ranges into excisable spans. Null text → null; text shorter than
  * k + w − 1 → empty array (the callers' length guard).
  */
@ExpressionDescription(
  usage = "_FUNC_(text, k, w) - winnowing fingerprints with 1-based char positions.")
case class WinnowFingerprintPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 2, "winnow_fp_pos needs k >= 2 and w >= 2")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fp", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fp_pos"

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
    WinnowFingerprints.computePositions(textVal.asInstanceOf[UTF8String], k, w)

  // Local null-flag convention — see [[WinnowFingerprints.doGenCode]].
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val res = ctx.freshName("res")
      val resNull = ctx.freshName("resNull")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.WinnowFingerprints.computePositions($t, $k, $w);
        boolean $resNull = ($res == null);
        ${ev.isNull} = $resNull;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprintPositions =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val HEX = "0123456789abcdef".toCharArray

  /** md5-hex char k-grams, 1-based substr semantics (the HOF form's
    * `md5(substr(text, i, k))`). Returns null when the text yields
    * fewer than `w` grams.
    */
  private def hashGrams(text: UTF8String, k: Int, w: Int): Array[UTF8String] = {
    val n = text.numChars()
    val nGrams = n - k + 1
    if (nGrams < w) return null
    val md = MessageDigest.getInstance("MD5")
    val grams = new Array[UTF8String](nGrams)
    var i = 0
    while (i < nGrams) {
      // substringSQL is 1-based and char-indexed — identical to the
      // HOF form's `substr(text, i, k)`.
      md.reset()
      val d = md.digest(text.substringSQL(i + 1, k).getBytes)
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HEX((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HEX(d(b) & 0xf)
        b += 1
      }
      grams(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    grams
  }

  /** Static so generated code can call it without captured references. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val grams = hashGrams(text, k, w)
    if (grams == null) return new GenericArrayData(Array.empty[Any])
    val nGrams = grams.length
    // Monotonic deque of candidate indices: front always holds the
    // index of the window minimum. Ties keep the EARLIER index (strict
    // > pops), matching array_min which returns the min VALUE — equal
    // values are identical strings, so tie choice cannot differ.
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)).compareTo(grams(i)) > 0)
        tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(grams(deque(head)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** [[compute]]'s selection with POSITIONS: distinct selected gram
    * indices in first-selection order, emitted as (fp, 1-based char
    * pos) structs. The same deque keeps the EARLIEST index among equal
    * minima (strict > pops), so the selected index set is exactly the
    * HOF restatement's `j + list_position(window, min) - 1`.
    */
  def computePositions(text: UTF8String, k: Int, w: Int): ArrayData = {
    val grams = hashGrams(text, k, w)
    if (grams == null) return new GenericArrayData(Array.empty[Any])
    val nGrams = grams.length
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[Integer]()
    var i = 0
    while (i < nGrams) {
      while (tail > head && grams(deque(tail - 1)).compareTo(grams(i)) > 0)
        tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(deque(head))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      val idx = it.next().intValue()
      out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](grams(idx), idx + 1))
      o += 1
    }
    new GenericArrayData(out)
  }
}
