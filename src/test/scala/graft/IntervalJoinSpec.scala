package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Bucketized interval-overlap join ≡ the naive theta join, with each
  * overlapping pair emitted exactly once — across random data, varied
  * bucket widths, equi-keys, and boundary/degenerate intervals.
  */
class IntervalJoinSpec extends SparkSpec {

  private def rnd(seed: Int, n: Int, keyed: Boolean) = {
    val r = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = r.nextInt(10000).toLong
      Row(i.toLong, (if (keyed) s"k${r.nextInt(3)}" else "k0"),
        Long.box(s), Long.box(s + 1 + r.nextInt(500)))
    }
  }

  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, keyed: Boolean) = {
    val cond = (l("ls") < r("re")) && (r("rs") < l("le")) &&
      (if (keyed) l("k") === r("rk") else lit(true))
    l.join(r, cond).select(l("lid"), r("rid"))
  }

  test("overlap ≡ naive theta join; each pair exactly once (several widths)") {
    val l = df("lid BIGINT, k STRING, ls BIGINT, le BIGINT",
      rnd(1, 200, keyed = false): _*)
    val r = df("rid BIGINT, rk STRING, rs BIGINT, re BIGINT",
      rnd(2, 200, keyed = false): _*)
    val want = naive(l, r, keyed = false).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    for (w <- Seq(7L, 100L, 512L, 100000L)) {
      val got = IntervalJoin.overlap(l, r, "ls", "le", "rs", "re",
          bucketWidth = w)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got === want, s"width $w diverges from the theta join")
    }
  }

  test("equi-keys scope the join per key") {
    val l = df("lid BIGINT, k STRING, ls BIGINT, le BIGINT",
      rnd(3, 150, keyed = true): _*)
    val r0 = df("rid BIGINT, rk STRING, rs BIGINT, re BIGINT",
      rnd(4, 150, keyed = true): _*)
    val want = naive(l, r0, keyed = true).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val r = r0.withColumnRenamed("rk", "k")
    val got = IntervalJoin.overlap(l, r, "ls", "le", "rs", "re",
        keys = Seq("k"), bucketWidth = 64L)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got === want)
  }

  test("half-open semantics: touching intervals do not overlap") {
    val l = df("lid BIGINT, ls BIGINT, le BIGINT",
      Row(Long.box(1), Long.box(0), Long.box(10)))
    val r = df("rid BIGINT, rs BIGINT, re BIGINT",
      Row(Long.box(1), Long.box(10), Long.box(20)),   // touches: no
      Row(Long.box(2), Long.box(9), Long.box(20)),    // overlaps by 1
      Row(Long.box(3), Long.box(5), Long.box(5)))     // empty: no
    val got = IntervalJoin.overlap(l, r, "ls", "le", "rs", "re",
      bucketWidth = 4L).select("rid").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("null and inverted intervals match nothing") {
    val l = df("lid BIGINT, ls BIGINT, le BIGINT",
      Row(Long.box(1), null, Long.box(10)),
      Row(Long.box(2), Long.box(20), Long.box(10)))
    val r = df("rid BIGINT, rs BIGINT, re BIGINT",
      Row(Long.box(1), Long.box(0), Long.box(100)))
    assert(IntervalJoin.overlap(l, r, "ls", "le", "rs", "re",
      bucketWidth = 16L).count() === 0)
  }

  test("oversized interval raises loudly instead of exploding") {
    val l = df("lid BIGINT, ls BIGINT, le BIGINT",
      Row(Long.box(1), Long.box(0), Long.box(10000000L)))
    val r = df("rid BIGINT, rs BIGINT, re BIGINT",
      Row(Long.box(1), Long.box(0), Long.box(10)))
    val e = intercept[Exception] {
      IntervalJoin.overlap(l, r, "ls", "le", "rs", "re",
        bucketWidth = 2L, maxBucketsPerInterval = 1000).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("buckets at width")), e.toString)
  }

  test("colliding non-key columns are rejected") {
    val l = df("id BIGINT, s BIGINT, e BIGINT", Row(Long.box(1), Long.box(0), Long.box(1)))
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(l, l, "s", "e", "s", "e", bucketWidth = 8L)
    }
  }
}
