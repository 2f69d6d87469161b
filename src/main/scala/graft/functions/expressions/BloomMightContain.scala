package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, BooleanType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native probe of a pre-built [[BloomFilter]]: `true` when the key
  * MIGHT be in the builder's key set, `false` when it definitely is
  * not. The filter object rides along with the expression (a few MB —
  * the whole point is a summary small enough to ship to every fact
  * scan when the dim side is too big to broadcast-join).
  *
  * Key hashing mirrors `DataFrameStatFunctions.bloomFilter`'s build
  * side exactly: integral types probe as long, strings/binary probe
  * the raw bytes — so a filter built with the public API never yields
  * a false negative here.
  *
  * Null semantics: null key → null (a null key can never match an
  * equi-join, so callers filtering on this expression drop the row —
  * identical to what the downstream join would do).
  *
  * Codegen: one virtual call on a plan-referenced filter object, fully
  * inside the whole-stage span (no interpreted fallback; fresh-local
  * null-flag pattern per CosineSimilarity).
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
        BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain key must be integral, string, or binary, got $other")
  }

  /** Probe entry the generated code calls; also the interpreted path. */
  def probe(key: Any): Boolean = key match {
    case l: java.lang.Long => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.longValue())
    case s: java.lang.Short => bloom.mightContainLong(s.longValue())
    case b: java.lang.Byte => bloom.mightContainLong(b.longValue())
    case u: UTF8String => bloom.mightContainBinary(u.getBytes)
    case a: Array[Byte] => bloom.mightContainBinary(a)
    case other => throw new IllegalArgumentException(
      s"bloom_might_contain: unsupported key $other")
  }

  override def nullSafeEval(key: Any): Any = probe(key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key => {
      val self = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContain].getName)
      s"${ev.value} = $self.probe($key);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
