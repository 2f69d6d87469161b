package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native fast Walsh–Hadamard transform: `fwht(v)` returns H·v for the
  * d×d Hadamard matrix (UNNORMALIZED — callers divide by √d for the
  * orthogonal rotation), d the array length, required to be a power of
  * two.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): the butterfly
  * needs RANDOM ACCESS to the intermediate array between passes, which
  * the declarative formulations cannot express without catastrophic
  * cost. Chained `transform(sequence(0,d-1), i -> el[i] ± el[i xor b])`
  * projections get merged by CollapseProject into one nested
  * expression, and interpreted ArrayTransform then re-evaluates the
  * ENTIRE inner array for every element access — 2^passes-fold
  * recomputation that turns a 500-row corpus into minutes (observed
  * live before this expression existed). A dense H-matrix join is
  * O(d²) per row plus an explode/groupBy shuffle. This expression is
  * the textbook in-place O(d log d) butterfly in one tight loop inside
  * whole-stage codegen, zero shuffle, zero recomputation.
  *
  * Null semantics: null input or null element → null; a
  * non-power-of-two length → null (the caller's dimension guard owns
  * the loud failure; a silent partial transform would be worse than
  * either). d = 1 is the identity.
  */
@ExpressionDescription(
  usage = "_FUNC_(v) - unnormalized fast Walsh-Hadamard transform of a" +
    " power-of-two-length double vector.")
case class Fwht(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "fwht"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"fwht needs array<double>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Fwht.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // Loop lives in the compiled static helper; fresh local, single
      // ev.isNull/ev.value assignment (CosineSimilarity convention).
      val res = ctx.freshName("res")
      s"""
        ${CodeGenerator.javaType(dataType)} $res =
          graft.functions.expressions.Fwht.compute($v);
        ${ev.isNull} = $res == null;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Fwht =
    copy(child = newChild)
}

object Fwht {

  /** Static so generated code can call it without captured references.
    * In-place butterfly over a fresh primitive array: pass `bit`
    * combines partner pairs i ↔ i|bit as (lo', hi') = (lo+hi, lo−hi)
    * — plain IEEE-754 double adds in a fixed order, so results are
    * bit-reproducible across engines restating the same sequence.
    */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if ((n & (n - 1)) != 0 || n == 0) return null
    val a = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      a(i) = v.getDouble(i)
      i += 1
    }
    var bit = 1
    while (bit < n) {
      var lo = 0
      while (lo < n) {
        if ((lo & bit) == 0) {
          val hi = lo | bit
          val x = a(lo)
          val y = a(hi)
          a(lo) = x + y
          a(hi) = x - y
        }
        lo += 1
      }
      bit <<= 1
    }
    new GenericArrayData(a)
  }
}
