package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` computing the MinHash signature of
  * the UNION of document shingle-sets across a group (SURVEY.md §2.10:
  * the signature-union aggregator). Because min is associative and
  * commutative, the union's signature is the element-wise minimum of
  * the members' signatures — so group-level Jaccard similarity can be
  * estimated from per-document signatures without ever re-shingling,
  * e.g. cluster-vs-cluster near-dup checks after LSH grouping.
  *
  * IN  = one document's signature (k hex strings, as produced by
  *       [[graft.operators.Dedup.minhashSignatures]]);
  * BUF = element-wise running minima;
  * OUT = the union signature.
  *
  * Registered as a UDAF via `functions.udaf` — usable from the Column
  * API and SQL; merge is a k-element min, so partial aggregation
  * (map-side combine) applies as with any built-in aggregate.
  */
object MinHashUnionAgg {

  final case class Buf(mins: Seq[String])

  def aggregator(k: Int): Aggregator[Seq[String], Buf, Buf] =
    new Aggregator[Seq[String], Buf, Buf] {
      override def zero: Buf = Buf(Seq.fill(k)(null))
      private def minOf(a: String, b: String): String =
        if (a == null) b else if (b == null) a else if (a <= b) a else b
      override def reduce(b: Buf, in: Seq[String]): Buf =
        if (in == null) b
        else Buf(b.mins.zipAll(in, null, null).map { case (x, y) => minOf(x, y) })
      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.mins.zipAll(b.mins, null, null).map { case (x, y) => minOf(x, y) })
      override def finish(b: Buf): Buf = b
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
    }

  /** Column-API form: `unionSignature(array(h0..hk-1))` → a struct whose
    * `mins` field is the union signature.
    */
  def unionSignature(k: Int)(sig: Column): Column =
    udaf(aggregator(k)).apply(sig).getField("mins")
}
