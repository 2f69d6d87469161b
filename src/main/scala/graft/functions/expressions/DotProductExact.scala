package graft.functions.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_exact(a, b)`: dot product of two `array<float>` columns with
  * order-independent DECIMAL(38,18) accumulation, returned as double.
  *
  * Why a custom expression (SURVEY.md §7.3 tier b): cross-engine float
  * parity requires the decimal-accumulated sum (a plain double fold's
  * low bits depend on evaluation order, which differs between engines),
  * but the built-in formulation — `aggregate(zip_with(...cast decimal))`
  * — runs interpreted: higher-order lambdas have no codegen, and the
  * per-element Catalyst-tree walk dominated the embedding near-dup
  * scan. This expression keeps the exact-decimal contract (each
  * float×float product is exact in double, then rounded to 18 fractional
  * digits HALF_UP — the same rule as Spark's double→DECIMAL(38,18) cast
  * and the DuckDB oracle's `CAST(v1*v2 AS DECIMAL(38,18))` — then summed
  * exactly) as a tight per-row loop inside whole-stage codegen.
  *
  * Null/shape semantics match the zip_with formulation with
  * null-coalesced products: a null element on either side contributes
  * zero, positions past the shorter array contribute zero, and the
  * whole result is null only when an input array is null.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - decimal-exact dot product of two float vectors.")
case class DotProductExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_exact"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (!ok(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"left side must be array<float>, got ${left.dataType}")
    else if (!ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right side must be array<float>, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExact.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      // The decimal loop lives in the compiled static helper; the call
      // stays inside the whole-stage codegen span.
      s"${ev.value} = graft.functions.expressions.DotProductExact.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExact =
    copy(left = newLeft, right = newRight)
}

object DotProductExact {

  /** Static so generated code can call it without captured references. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble
        // NaN/Infinity products contribute 0, matching the HOF fold it
        // replaces: Spark's non-ANSI double→decimal cast yields null for
        // non-finite values, which that formulation coalesces to 0.
        // (BigDecimal.valueOf would throw NumberFormatException.)
        if (java.lang.Double.isFinite(p))
          // Exactly Spark's double→DECIMAL(38,18) cast: canonical decimal
          // repr of the double, rounded to 18 fractional digits HALF_UP.
          acc = acc.add(JBigDecimal.valueOf(p).setScale(18, RoundingMode.HALF_UP))
      }
      i += 1
    }
    acc.doubleValue
  }
}
