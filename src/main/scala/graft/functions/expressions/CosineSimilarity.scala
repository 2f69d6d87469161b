package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * Why a custom Catalyst expression (SURVEY.md §7.3 tier b): the
  * built-in formulation `aggregate(zip_with(a, b, *), 0.0, +)` runs
  * interpreted — higher-order lambdas have no codegen — and allocates
  * an intermediate array per row. For ANN ranking the dot product IS
  * the hot loop over every candidate row, so this expression brings it
  * back into whole-stage codegen as a primitive float loop: no
  * allocation, no virtual calls, auto-vectorizable.
  *
  * Null semantics: null if either side is null (standard binary
  * expression), or if lengths differ / either norm is zero (no valid
  * cosine). Accumulation is double in fixed array order, matching
  * [[graft.operators.Similarity.dot]]'s fold order exactly.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two float vectors.")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, true) ||
        left.dataType == ArrayType(FloatType, false)) {
      if (right.dataType == ArrayType(FloatType, true) ||
          right.dataType == ArrayType(FloatType, false))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right side must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"left side must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // Null-result flag is a fresh LOCAL, copied into ev.isNull exactly
  // once at the end (the DivModLike convention): ev.isNull must never
  // be assigned from nested branches of a snippet, because codegen
  // contexts that resolve isNull to a non-local (split methods,
  // literal false under refined nullability) can't compile scattered
  // assignments. See signBucket's scaladoc for the observed failure
  // mode in Spark's own ElementAt.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val resNull = ctx.freshName("resNull")
      val res = ctx.freshName("res")
      s"""
        boolean $resNull = false;
        double $res = 0.0;
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          $resNull = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = (double) $x.getFloat($i);
            double $yi = (double) $y.getFloat($i);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          if ($na == 0.0 || $nb == 0.0) {
            $resNull = true;
          } else {
            $res = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
          }
        }
        ${ev.isNull} = $resNull;
        ${ev.value} = $res;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
