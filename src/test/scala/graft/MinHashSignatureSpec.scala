package graft

import graft.operators.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

class MinHashSignatureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("native expression ≡ shuffle-based aggregate formulation") {
    val docs = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val native = Dedup.minhashSignatures(docs, "doc_id", "text", k = 4, n = 3)
    val agg = Dedup.minhashSignaturesAgg(docs, "doc_id", "text", k = 4, n = 3)
    assert(native.count() > 0, "fixture must produce signatures")
    assert(rowSet(native) == rowSet(agg),
      "per-row codegen signature must equal the explode/groupBy formulation")
  }

  test("interpreted eval ≡ codegen'd DataFrame result") {
    import graft.functions.expressions.MinHashSignature
    val text = "the quick brown fox jumps over the lazy dog"
    val arr: ArrayData = new GenericArrayData(
      text.split(" ").map(UTF8String.fromString(_): AnyRef))
    val evald = MinHashSignature(
        Literal.create(arr, ArrayType(StringType)), 4, 3)
      .eval(null).asInstanceOf[ArrayData]
    val viaDf = df("t STRING", Row(text))
      .select(call_function("minhash_sig", split(col("t"), " "), lit(4), lit(3)).as("s"))
      .head().getSeq[String](0)
    assert(evald.numElements() == 4)
    assert((0 until 4).map(i => evald.getUTF8String(i).toString) == viaDf)
  }

  test("documents shorter than n words yield null (and drop from signatures)") {
    val out = df("doc_id BIGINT, text STRING",
        Row(Long.box(1), "just two"),
        Row(Long.box(2), "now three words"))
    val sigs = Dedup.minhashSignatures(out, "doc_id", "text", k = 2, n = 3)
    assert(sigs.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val raw = out.select(
        call_function("minhash_sig", split(col("text"), " "), lit(2), lit(3)).as("s"))
      .collect()
    assert(raw.count(_.isNullAt(0)) == 1)
  }

  test("signature extraction is zero-shuffle and stays in whole-stage codegen") {
    val docs = Tables.table(spark, sfDir, "documents")
    val plan = Dedup.minhashSignatures(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"native minhash signatures must not shuffle:\n$plan")
    assert(plan.contains("*(1)"),
      s"minhash_sig must stay inside whole-stage codegen:\n$plan")
  }

  test("expression is callable from SQL") {
    val r = spark.sql(
      "SELECT minhash_sig(split('a b c d e', ' '), 2, 3) AS s").head()
    val s = r.getSeq[String](0)
    assert(s.length == 2 && s.forall(_.matches("[0-9a-f]{16}")))
  }

  test("a null array element yields a null signature, not an NPE") {
    val r = spark.sql(
      "SELECT minhash_sig(array('a', NULL, 'b'), 2, 1) AS s").head()
    assert(r.isNullAt(0))
  }
}
