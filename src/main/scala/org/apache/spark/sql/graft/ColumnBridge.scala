package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.internal.{Literal => LiteralNode, UnresolvedFunction => FunctionNode}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4's `Column` wraps a connect-compatible `ColumnNode`; the
  * classic converter ([[ExpressionUtils]]) and `Column.node` are
  * `private[sql]`, so a library that needs plan-time introspection
  * (e.g. "is this column a constant query vector?") must live under
  * `org.apache.spark.sql` to reach them. This is the standard
  * extension-library idiom; keep this object as the single crossing
  * point so the rest of graft stays on public API.
  */
object ColumnBridge {
  /** Catalyst expression behind a (classic-mode) Column. Note the
    * result may be a lazy `ColumnNodeExpression` wrapper whose
    * `foldable` is false even for constants — use
    * [[constantFloatArray]] for constant detection.
    */
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a Catalyst expression back into a Column. */
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)

  /** Element values of a CONSTANT `array<float>` Column, or None when
    * the column isn't recognizably constant. Null elements come back
    * as null entries; a null array yields None (callers fall back to
    * the expression form, which propagates the null).
    *
    * Recognized shapes, in order:
    *  1. `functions.array(lit(f), ...)` — an sql-api UnresolvedFunction
    *     node over Literal nodes. This is the common single-query
    *     shape, and it is NOT foldable pre-analysis (the analyzer only
    *     later rewrites it to CreateArray), so `exprOf(c).foldable`
    *     alone can never catch it.
    *  2. `typedLit(Array[Float](...))` / `lit` of a float collection —
    *     a single sql-api Literal node.
    *  3. Any already-resolved foldable catalyst expression of type
    *     array<float> (callers composing raw Expressions).
    */
  def constantFloatArray(c: Column): Option[Array[java.lang.Float]] = c.node match {
    case fn: FunctionNode
        if fn.functionName.equalsIgnoreCase("array") && !fn.isDistinct &&
          fn.arguments.nonEmpty && fn.arguments.forall {
            case l: LiteralNode =>
              l.value == null || l.value.isInstanceOf[java.lang.Float]
            case _ => false
          } =>
      Some(fn.arguments.map { case l: LiteralNode =>
        l.value.asInstanceOf[java.lang.Float]
      }.toArray)
    case l: LiteralNode =>
      l.value match {
        case a: Array[Float] => Some(a.map(java.lang.Float.valueOf))
        case s: scala.collection.Seq[_]
            if s.nonEmpty && s.forall(_.isInstanceOf[Float]) =>
          Some(s.map(x => java.lang.Float.valueOf(x.asInstanceOf[Float])).toArray)
        case _ => None
      }
    case _ =>
      val e = exprOf(c)
      val isFloatArray = e.resolved && e.foldable && (e.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (!isFloatArray) None
      else Option(e.eval(null)).map { v =>
        val arr = v.asInstanceOf[ArrayData]
        Array.tabulate[java.lang.Float](arr.numElements()) { i =>
          if (arr.isNullAt(i)) null else java.lang.Float.valueOf(arr.getFloat(i))
        }
      }
  }
}
