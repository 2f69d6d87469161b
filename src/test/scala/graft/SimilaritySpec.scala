package graft

import graft.operators.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def vecs = df("vec_id BIGINT, embedding ARRAY<FLOAT>",
    Row(Long.box(1), Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    Row(Long.box(2), Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    Row(Long.box(3), Seq(1.0f, 1.0f, 0.0f, 0.0f)),
    Row(Long.box(4), Seq(-1.0f, 0.0f, 0.0f, 0.0f)))

  test("dot / cosine on known vectors") {
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f), lit(0.0f))
    val out = vecs.select(col("vec_id"),
        Similarity.cosine(col("embedding"), q).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(out(4L) == -1.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f), lit(0.0f))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 3L, 2L))
  }

  test("signBucket is deterministic and annTopK returns a bucket-pruned subset") {
    val pairs = Seq((1, 2), (3, 4))
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f), lit(0.0f)) // bucket "10"
    val bucketed = Similarity.signLshBuckets(vecs, "embedding", pairs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bucketed(1L) == "10") // 1>0, 0==0
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding", q, 10, pairs)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(ann.subsetOf(brute))
    assert(ann.contains(1L), "same-bucket exact match must be found")
  }
}
