package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro–Winkler similarity over two string columns — the
  * record-linkage scorer (Winkler 1990, public algorithm; standard
  * parameters: scaling p = 0.1, prefix cap 4, boost threshold 0.7,
  * applied only when jaro > 0.7). Matches DuckDB's
  * `jaro_winkler_similarity` so the q176 linkage gate can hash-match
  * on the 1e-9 grid.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): the two-buffer
  * match/transposition scan is imperative — inexpressible as built-in
  * column functions without exploding characters — and it is the hot
  * loop of a blocked linkage join (one call per candidate pair). The
  * loop lives in a static JVM method invoked from generated code:
  * whole-stage codegen keeps the row pipeline (no UDF serialization,
  * no Row boxing), and the JIT compiles the scan once.
  *
  * Null semantics: null if either side is null (standard binary
  * expression). Either side empty → 0.0 unless BOTH are empty → 1.0
  * (DuckDB convention is 0.0 for '' vs ''; see [[compute]] — we match
  * DuckDB, so '' vs '' is 0.0). Comparison is by UTF-16 code unit,
  * which coincides with code points on the BMP (the fixtures are
  * ASCII; supplementary-plane text compares consistently with
  * DuckDB's byte-wise scan only for equal strings).
  */
@ExpressionDescription(
  usage = "_FUNC_(s1, s2) - Jaro-Winkler similarity in [0, 1].")
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"both sides must be string, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(newLeft, newRight)
}

object JaroWinkler {

  // Per-thread scratch for the two matched-flag arrays: a linkage scan
  // evaluates this expression millions of times per task, and two
  // heap allocations per pair dominated the profile (q176 at sf0.1:
  // ~8M pairs). Grown on demand, cleared only on the used prefix.
  private final class Scratch {
    var m1: Array[Boolean] = new Array[Boolean](64)
    var m2: Array[Boolean] = new Array[Boolean](64)
    def ensure(l1: Int, l2: Int): Unit = {
      if (m1.length < l1) m1 = new Array[Boolean](math.max(l1, m1.length * 2))
      else java.util.Arrays.fill(m1, 0, l1, false)
      if (m2.length < l2) m2 = new Array[Boolean](math.max(l2, m2.length * 2))
      else java.util.Arrays.fill(m2, 0, l2, false)
    }
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** Static entry the generated code calls — one virtual-free scan per
    * pair. Standard Jaro: match window = max(|a|,|b|)/2 − 1 (floor,
    * ≥ 0), transpositions = half the out-of-order matched pairs;
    * Winkler bonus: + ℓ·0.1·(1 − jaro) for the common prefix
    * ℓ ≤ 4, only when jaro > 0.7.
    *
    * ASCII inputs (the overwhelming case for name/key linkage) run
    * directly on the UTF8String bytes — no String materialization, no
    * char decode; multi-byte inputs take the String path, which the
    * ASCII path mirrors exactly (spec-pinned both ways).
    */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val n1 = a.numBytes
    val n2 = b.numBytes
    if (n1 == 0 || n2 == 0) return 0.0 // DuckDB: '' vs anything (incl '') = 0
    if (a.equals(b)) return 1.0
    val s = scratch.get()
    if (a.numChars == n1 && b.numChars == n2) {
      // ASCII fast path: code points ARE the bytes — no String
      // materialization, no decode, no per-call closures (a monomorphic
      // byte-array kernel; the char kernel below is its exact mirror).
      s.ensure(n1, n2)
      jaroWinklerBytes(a, n1, b, n2, s.m1, s.m2)
    } else {
      val s1 = a.toString
      val s2 = b.toString
      s.ensure(s1.length, s2.length)
      jaroWinklerChars(s1, s1.length, s2, s2.length, s.m1, s.m2)
    }
  }

  // The two kernels are structural mirrors — byte[] for ASCII, String
  // for multi-byte — kept as separate monomorphic loops deliberately:
  // an accessor-lambda abstraction costs two closure allocations and a
  // virtual call per character, which is the cost class this hot path
  // exists to avoid. CodegenHealthSpec pins both against the same
  // textbook vectors (including a multi-byte case).
  // UTF8String.getByte reads the (possibly shared) backing buffer in
  // place — getBytes would copy every slice-backed string per call.
  private def jaroWinklerBytes(a: UTF8String, l1: Int,
      b: UTF8String, l2: Int,
      m1: Array[Boolean], m2: Array[Boolean]): Double = {
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && a.getByte(i) == b.getByte(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - trans / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && a.getByte(prefix) == b.getByte(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private def jaroWinklerChars(s1: String, l1: Int, s2: String, l2: Int,
      m1: Array[Boolean], m2: Array[Boolean]): Double = {
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // Transpositions: walk both matched subsequences in order.
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - trans / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
