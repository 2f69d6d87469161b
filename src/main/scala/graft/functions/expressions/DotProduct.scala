package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native inner product over two `array<float>` columns — the
  * norm-free sibling of [[CosineSimilarity]], for score paths that
  * rank on the raw dot (ADC over PQ reconstructions, pre-normalized
  * embeddings). Same rationale: the HOF fold
  * `aggregate(zip_with(a, b, *), 0.0, +)` runs interpreted and
  * allocates per row; this is a primitive double loop inside
  * whole-stage codegen, accumulating in the SAME fixed array order as
  * [[graft.operators.Similarity.dot]] — bit-identical results, so the
  * two formulations are interchangeable mid-pipeline.
  *
  * Null semantics: null if either side is null or lengths differ.
  * A zero vector is a valid input with dot 0.0 (unlike cosine, no
  * normalization exists to divide by).
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - inner product of two float vectors.")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

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
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  // Fresh local null flag, single ev.isNull/ev.value assignment at the
  // end (DivModLike convention) — see [[CosineSimilarity.doGenCode]].
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val resNull = ctx.freshName("resNull")
      s"""
        boolean $resNull = false;
        double $dot = 0.0;
        int $n = $x.numElements();
        if ($n != $y.numElements()) {
          $resNull = true;
        } else {
          for (int $i = 0; $i < $n; $i++) {
            $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
          }
        }
        ${ev.isNull} = $resNull;
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
