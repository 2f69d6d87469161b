package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")

  test("hashSplit: disjoint, exhaustive, and within tolerance of the fractions") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.hashSplit(docs, "doc_id", "s1", splits)
    val n = docs.count().toDouble
    val byName = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.values.sum == n.toLong, "every row lands in exactly one split")
    splits.foreach { case (name, frac) =>
      val got = byName.getOrElse(name, 0L) / n
      assert(math.abs(got - frac) < 0.1,
        s"$name: got $got, wanted ~$frac (md5 buckets are uniform)")
    }
  }

  test("sampling is deterministic and retry-stable (partitioning-independent)") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3, "seed")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3, "seed")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same keys selected regardless of physical layout")
    assert(a.nonEmpty && a.size < docs.count())
    // A different salt draws a different (overlapping but not equal) set.
    val c = Sampling.deterministicSample(docs, "doc_id", 0.3, "seed2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("mixture: per-source weights, schema drift tolerated, keys independent per source") {
    val s1 = docs.select(col("doc_id"), col("text"))
    val s2 = docs.select(col("doc_id"), col("text"), lit("web").as("source"))
    val out = Sampling.mixture(Seq(s1 -> 1.0, s2 -> 0.5), "doc_id", "mix")
    val n = docs.count()
    val total = out.count()
    // all of s1 + ~half of s2
    assert(total > n && total < 2 * n)
    assert(out.columns.contains("source"), "unionByName keeps the wider schema")
    // weight-1.0 source passes through complete
    assert(out.filter(col("source").isNull).count() == n)
  }

  test("stratifiedFixedN: exact per-stratum counts, deterministic, heap plan") {
    val out = Sampling.stratifiedFixedN(docs, Seq("source", "lang"),
      "doc_id", "s9", 2)
    val sizes = out.groupBy("source", "lang").count()
      .collect().map(_.getLong(2))
    assert(sizes.forall(_ <= 2), "never more than n per stratum")
    val strata = docs.select("source", "lang").distinct().count()
    assert(out.groupBy("source", "lang").count().count() == strata,
      "every non-empty stratum is represented")
    // Deterministic across physical layouts (the retry-stability contract).
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedFixedN(docs.repartition(13),
        Seq("source", "lang"), "doc_id", "s9", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // The cut runs on the bounded-heap plan, not a per-stratum sort
    // window (which would full-sort the corpus).
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"expected the heap plan:\n$plan")
    assert(!plan.contains("Window"), s"no window sort expected:\n$plan")
  }

  test("split membership is a pure projection: no shuffle in the plan") {
    val plan = Sampling.hashSplit(docs, "doc_id", "s1",
        Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash split must not shuffle:\n$plan")
  }

  test("deterministicShuffle assigns window-free global positions") {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select("doc_id")
    val out = Sampling.deterministicShuffle(d, "doc_id", "ord1")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // The positions are exactly the unpartitioned-window row numbers.
    val expect = d
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        Window.orderBy(
          md5(concat(lit("ord1:"), col("doc_id").cast("string"))),
          col("doc_id"))).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "positions must equal the global total order")
    // Deterministic across physical layouts (retry-stability contract):
    // partition boundaries must not leak into the assigned values.
    val relaid = Sampling.deterministicShuffle(
        d.repartition(13), "doc_id", "ord1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relaid == got, "positions must not depend on input layout")
    // The scalable plan: a range-partitioned sort feeding zipWithIndex —
    // never a global Window (which would funnel the corpus through one
    // task).
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no global window expected:\n$plan")
  }
}
