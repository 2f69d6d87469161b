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

  private def emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
  private def embQueries = emb.filter(col("vec_id") % 97 === 0)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("batchAnnTopK plan: bucket hash join + bounded heaps, no nested loop, no sort") {
    val out = Similarity.batchAnnTopK(emb, embQueries,
      "vec_id", "embedding", "qid", "qvec", k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucketed retrieval must never plan an all-pairs nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"queries must reach candidates via a bucket-key hash join:\n$plan")
    assert(plan.contains("TopKPerGroupFinal") && !plan.contains("Sort"),
      s"per-query cut must run on the bounded-heap plan:\n$plan")
  }

  test("batchAnnTopK: every neighbor shares its query's bucket; ranks match the gate query") {
    val out = Similarity.batchAnnTopK(emb, embQueries,
      "vec_id", "embedding", "qid", "qvec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.nonEmpty)
    val buckets = Similarity.signLshBuckets(emb, "embedding")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    out.foreach { case (qid, vid) =>
      assert(buckets(qid) == buckets(vid),
        s"neighbor $vid of query $qid crossed buckets")
      assert(qid != vid, "a query must not retrieve itself")
    }
    // On THIS corpus the double-scored operator and the decimal-exact
    // gate restatement (q48) retrieve the same neighbor sets. That is
    // a property of the data, not an invariant: a rank-3/4 pair whose
    // exact cosines straddle a 1e-9 rounding tie is cut by vec_id in
    // the gate but by magnitude in the operator. The fixture has no
    // such pair, so this pins the two paths against silent drift here.
    val gate = SparkEntry.queries("q48_batch_ann_bucketed")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == gate)
  }
}
