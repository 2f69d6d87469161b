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

  test("groupAwareSplit: groups never straddle; singletons split by own key") {
    import org.apache.spark.sql.Row
    // 30 docs, clustered into 10 groups of 3 (group id = min member).
    val d = spark.range(30).toDF("doc_id")
    val groups = spark.range(30)
      .select(col("id").as("doc_id"), (col("id") / 3).cast("long") * 3)
      .toDF("doc_id", "component")
    val out = Sampling.groupAwareSplit(d, "doc_id", groups, "component",
      "s1", Seq("train" -> 0.5, "test" -> 0.5))
    val bySplit = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bySplit.size == 30)
    // every group's 3 members share one split
    (0 until 30 by 3).foreach { g =>
      assert(Set(g, g + 1, g + 2).map(i => bySplit(i.toLong)).size == 1,
        s"group $g straddles splits")
    }
    // split = hashSplit of the group key (the mechanism, pinned)
    val viaKey = Sampling.hashSplit(
        groups.select(concat(lit("grp:"), col("component").cast("string"))
          .as("k")), "k", "s1", Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (0 until 30).foreach { i =>
      assert(bySplit(i.toLong) == viaKey(s"grp:${i / 3 * 3}"))
    }
    // rows absent from the mapping are singletons under a DISJOINT
    // keyspace: doc 100 splits by 'solo:100', never by a group hash
    val solo = Sampling.groupAwareSplit(
        df("doc_id BIGINT", Row(Long.box(100))), "doc_id", groups,
        "component", "s1", Seq("train" -> 0.5, "test" -> 0.5))
      .head().getString(1)
    val soloKey = Sampling.hashSplit(
        df("k STRING", Row("solo:100")), "k", "s1",
        Seq("train" -> 0.5, "test" -> 0.5)).head().getString(1)
    assert(solo == soloKey)
  }

  test("sampleQuantiles: merge == direct; nearest-rank picks real values") {
    import org.apache.spark.sql.Row
    val rows = (1 to 300).map(i =>
      Row(s"t${i % 2}", s"d${i % 5}", Long.box(i), Double.box((i * 37 % 300).toDouble)))
    val ev = df("typ STRING, d STRING, id BIGINT, v DOUBLE", rows: _*)
    val k = 32
    // merge property: per-(typ, d) samples re-sampled per typ ==
    // sampling per typ directly (the bottom-k-by-hash mergeability)
    val merged = Sampling.stratifiedFixedN(
      Sampling.stratifiedFixedN(ev, Seq("typ", "d"), "id", "s", k),
      Seq("typ"), "id", "s", k)
    val direct = Sampling.stratifiedFixedN(ev, Seq("typ"), "id", "s", k)
    def ids(x: org.apache.spark.sql.DataFrame) =
      x.select("typ", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids(merged) == ids(direct),
      "union-of-samples re-sampled must equal the direct sample")
    // quantiles come off the sample as real data values at fixed ranks
    val q = Sampling.sampleQuantiles(direct, Seq("typ"), "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    q.foreach { case (typ, (n, p0, p50, p100)) =>
      assert(n == k)
      val vs = direct.filter(col("typ") === typ).select("v")
        .collect().map(_.getDouble(0)).sorted
      assert(p0 == vs.head && p100 == vs.last && p50 == vs((k - 1) / 2))
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

  test("tokenBudgetSample: monotone in budget, boundary-exact, stable") {
    import graft.Tables
    val d = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    def take(b: Long) = Sampling
      .tokenBudgetSample(d, "doc_id", "n_tokens", b, "bud1")
      .collect().map(_.getLong(0)).toSet
    val small = take(3000); val big = take(9000)
    assert(small.subsetOf(big), "a bigger budget must contain the smaller slice")
    assert(small.nonEmpty && big.size > small.size)
    // Boundary-exact: kept tokens ≤ budget, and adding the FIRST
    // excluded doc (in shuffle order) would overflow it.
    val ordered = Sampling.deterministicShuffle(d, "doc_id", "bud1")
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getLong(1)))
    val keptTok = ordered.filter(r => small(r._1)).map(_._2).sum
    val firstOut = ordered.find(r => !small(r._1)).get
    assert(keptTok <= 3000 && keptTok + firstOut._2 > 3000)
    assert(take(3000) == small, "same budget + salt must reproduce the slice")
  }

  test("lengthBucketedBatches: equal-length grouping, no global window") {
    import graft.Tables
    val d = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val out = Sampling.lengthBucketedBatches(d, "doc_id", "n_tokens", 8)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Every batch is full (last may be ragged) and batches partition
    // the corpus in non-increasing length order.
    val byBatch = rows.groupBy(_._3).toSeq.sortBy(_._1)
    byBatch.init.foreach { case (b, rs) =>
      assert(rs.length == 8, s"batch $b has ${rs.length} rows") }
    val mins = byBatch.map(_._2.map(_._2).min)
    val maxs = byBatch.map(_._2.map(_._2).max)
    mins.zip(maxs.tail).foreach { case (lo, nextHi) =>
      assert(nextHi <= lo, "later batches must not hold longer docs") }
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "batch layout must not use a global window")
  }

  test("sqrtFlattenSample: smallest group keeps all, kept ∝ √N, stable") {
    import graft.Tables
    val d = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang")
    val kept = Sampling.sqrtFlattenSample(d, "doc_id", "lang", "t1")
      .localCheckpoint(true)
    // Subset of the input, schema unchanged.
    assert(kept.columns.toSeq == Seq("doc_id", "lang"))
    assert(kept.join(d, Seq("doc_id", "lang"), "left_anti").count() == 0)
    val tot = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kc = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = tot.minBy(_._2)._1
    // The smallest group is never down-sampled (p = 1 exactly: the
    // md5 fraction is < 1 by construction).
    assert(kc(minLang) == tot(minLang), "smallest group must keep 100%")
    // Every group's kept count is within binomial noise of p·N, i.e.
    // kept/√N is roughly constant (3σ tolerance).
    val target = math.sqrt(tot(minLang).toDouble)
    tot.foreach { case (l, n) =>
      val expect = target * math.sqrt(n.toDouble)
      val sigma = math.sqrt(expect) max 1.0
      assert(math.abs(kc.getOrElse(l, 0L) - expect) <= 4 * sigma,
        s"$l kept ${kc.getOrElse(l, 0L)}, expected ~$expect")
    }
    // Deterministic: same salt, same rows — on any partitioning.
    val again = Sampling.sqrtFlattenSample(
      d.repartition(7), "doc_id", "lang", "t1")
    assert(rowSet(again) == rowSet(kept))
  }

  test("epochCappedAllocation: waterfilling invariants hold") {
    import org.apache.spark.sql.Row
    val counts = df("g STRING, n BIGINT",
      Row("tiny", Long.box(100)), Row("small", Long.box(500)),
      Row("mid", Long.box(2000)), Row("big", Long.box(10000)))
    // budget 6000, maxEpochs 2: capacities 200/1000/4000/20000 sorted
    // asc. The boundary is checked via the waterfilling INVARIANTS
    // (budget exhausted, caps respected, one shared λ, capped ≤ λ)
    // rather than a hand-picked expected table.
    val out = Sampling.epochCappedAllocation(counts, "g", "n", 6000L, 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val allocs = out.values.map(_._3)
    // budget exhausted exactly (ΣC = 25200 > T)
    assert(math.abs(allocs.sum - 6000.0) < 1e-6)
    // nobody exceeds its capacity or the cap on epochs
    assert(out.values.forall { case (_, cap, a, e) =>
      a <= cap + 1e-6 && e <= 2.0 + 1e-9 })
    // capped groups sit exactly at capacity; uncapped share one λ
    val lambda = out.values.filter { case (_, cap, a, _) => a < cap - 1e-6 }
      .map(_._3).toSeq
    assert(lambda.distinct.size <= 1, s"uncapped shares differ: $lambda")
    // every capped capacity ≤ λ (waterfilling optimality)
    if (lambda.nonEmpty)
      assert(out.values.filter { case (_, cap, a, _) => a >= cap - 1e-6 }
        .forall(_._2 <= lambda.head + 1e-6))
  }

  test("epochCappedAllocation: budget above total capacity caps everyone") {
    import org.apache.spark.sql.Row
    val counts = df("g STRING, n BIGINT",
      Row("a", Long.box(10)), Row("b", Long.box(20)))
    val out = Sampling.epochCappedAllocation(counts, "g", "n", 1000L, 3L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") === ((30L, 30.0)) && out("b") === ((60L, 60.0)))
  }

  test("dsirLogWeights: target-like docs score higher; features exact") {
    import org.apache.spark.sql.Row
    val corpus = df("doc_id BIGINT, source STRING, text STRING",
      Row(Long.box(1), "tgt", "alpha beta gamma"),
      Row(Long.box(2), "tgt", "alpha beta delta"),
      Row(Long.box(3), "raw", "alpha beta gamma"),
      Row(Long.box(4), "raw", "omega psi chi"),
      Row(Long.box(5), "raw", "omega psi chi"))
    val w = Sampling.dsirLogWeights(corpus, "doc_id", "text",
        col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // n_feats = unigrams + bigrams = 3 + 2 for every 3-word doc
    assert(w.values.forall(_._1 == 5L))
    // identical text ⇒ identical weight, regardless of membership
    assert(w(1L)._2 === w(3L)._2)
    // target-vocabulary doc outscores the off-domain docs
    assert(w(1L)._2 > w(4L)._2 && w(2L)._2 > w(4L)._2)
    // deterministic under repartitioning (integer micro-nat sums)
    val again = Sampling.dsirLogWeights(corpus.repartition(5), "doc_id",
        "text", col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.map { case (k, v) => k -> v._2 } === again)
  }

  test("negativeSamples: k non-positives per user, deterministic, slot-ordered") {
    import org.apache.spark.sql.Row
    // 3 users over a 50-item space; user 30 has MANY positives so some
    // candidate draws must collide and be anti-joined away.
    val posRows =
      (0L until 40L).map(i => Row(Long.box(30), Long.box(i))) ++
        Seq(Row(Long.box(10), Long.box(3)), Row(Long.box(10), Long.box(7)),
          Row(Long.box(20), Long.box(0)))
    val pos = df("user_id BIGINT, item BIGINT", posRows: _*)
    def run(p: org.apache.spark.sql.DataFrame) =
      Sampling.negativeSamples(p, "user_id", "item", nItems = 50L, k = 4,
        salt = "t", overdraw = 8)
    val out = run(pos).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byUser = out.groupBy(_._1)
    assert(byUser.keySet == Set(10L, 20L, 30L))
    val posSet = posRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (u, item, _) =>
      assert(!posSet((u, item)), s"negative ($u, $item) is a positive")
      assert(item >= 0 && item < 50)
    }
    byUser.values.foreach { rows =>
      assert(rows.length == 4, s"want k=4 negatives: ${rows.toSeq}")
      // no duplicate items per user; slots strictly increase in output order
      assert(rows.map(_._2).distinct.length == 4)
      assert(rows.map(_._3).sorted.toSeq == rows.map(_._3).toSeq.sorted)
    }
    // Deterministic under repartitioning — same rows, same slots.
    val again = run(pos.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == out.toSet)
  }

  test("weightedSampleK: matches the A-ES formula, exact k, retry-stable") {
    import org.apache.spark.sql.Row
    val rows = (1L to 40L).map(i => Row(Long.box(i),
      if (i <= 20) "g1" else "g2", Double.box(if (i % 5 == 0) 50.0 else 1.0)))
    val d = df("id BIGINT, grp STRING, w DOUBLE", rows: _*)
    val got = Sampling.weightedSampleK(d, "id", col("w"), "s", k = 4,
        strataCols = Seq("grp"))
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // Reference restatement of the competition key in plain Scala.
    def aesKey(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"s:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
        4503599627370496.0
      math.pow(u, 1.0 / w)
    }
    val want = rows.groupBy(_.getString(1)).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-aesKey(r.getLong(0), r.getDouble(2)), r.getLong(0)))
        .take(4).map(r => (g, r.getLong(0)))
    }.toSet
    assert(got == want, s"selection diverged from the A-ES formula:\n$got\n$want")
    assert(got.count(_._1 == "g1") == 4 && got.count(_._1 == "g2") == 4)
    // Heavy weights dominate: all four w=50 rows of each group win over
    // the sixteen w=1 rows with overwhelming probability — and with
    // this fixed salt, deterministically.
    assert(got.forall { case (_, id) => id % 5 == 0 },
      s"w=50 rows should displace w=1 rows: $got")
    // Retry/layout stability.
    val again = Sampling.weightedSampleK(d.repartition(7), "id", col("w"),
        "s", k = 4, strataCols = Seq("grp"))
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(again == got)
    // Global (no strata) path: k largest keys overall, via TakeOrdered.
    val global = Sampling.weightedSampleK(d, "id", col("w"), "s", k = 3)
      .collect().map(_.getLong(0)).toSet
    val wantGlobal = rows.sortBy(r => (-aesKey(r.getLong(0), r.getDouble(2)),
      r.getLong(0))).take(3).map(_.getLong(0)).toSet
    assert(global == wantGlobal)
    // A non-positive weight fails loudly instead of silently dropping.
    val bad = df("id BIGINT, grp STRING, w DOUBLE",
      Row(Long.box(1), "g", Double.box(0.0)))
    intercept[Exception] {
      Sampling.weightedSampleK(bad, "id", col("w"), "s", k = 1).collect()
    }
  }
}
