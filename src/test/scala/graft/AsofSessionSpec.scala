package graft

import graft.operators.{AsofJoin, Sessionize}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AsofSessionSpec extends SparkSpec {

  private def trades = df("sym STRING, t BIGINT, qty BIGINT",
    Row("A", Long.box(100), Long.box(1)),
    Row("A", Long.box(205), Long.box(2)),
    Row("A", Long.box(50), Long.box(3)),   // before any quote
    Row("B", Long.box(100), Long.box(4)))  // key with no quotes

  private def quotes = df("sym STRING, t BIGINT, px DOUBLE",
    Row("A", Long.box(100), Double.box(10.0)),  // exact tie with trade t=100
    Row("A", Long.box(200), Double.box(20.0)))

  test("asof: latest at-or-before match per key; no match → null") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "t")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out(("A", 100L)) == 10.0, "tie at the same instant matches")
    assert(out(("A", 205L)) == 20.0, "latest earlier quote wins")
    assert(out(("A", 50L)) == null, "no quote yet → null")
    assert(out(("B", 100L)) == null, "keyless right side → null")
  }

  test("asof honors tolerance") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "t",
        tolerance = Some(4L))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out(("A", 100L)) == 10.0)   // gap 0 <= 4
    assert(out(("A", 205L)) == null)   // gap 5 > 4 → voided
  }

  test("asof carries the latest right ROW, not per-column latest non-null") {
    // Latest quote has a null px: the match must surface that null, not
    // stitch in the px from an older row.
    val q2 = df("sym STRING, t BIGINT, px DOUBLE",
      Row("A", Long.box(100), Double.box(10.0)),
      Row("A", Long.box(200), null))
    val out = AsofJoin.asof(trades, q2, Seq("sym"), "t", "t")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out(("A", 205L)) == null, "null value of the latest row wins")
    assert(out(("A", 100L)) == 10.0)
    // With tolerance, staleness is judged on the matched row's time.
    val tol = AsofJoin.asof(trades, q2, Seq("sym"), "t", "t", tolerance = Some(10L))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(tol(("A", 205L)) == null) // matched row ts=200, gap 5 <= 10, px null
  }

  test("asof ignores right rows with a null time column in every direction") {
    // A timeless right row must never be carried as a match: unfiltered,
    // NULLS FIRST ordering would make it the unbounded backward window's
    // "latest" value for early trades when tolerance is None.
    val q3 = df("sym STRING, t BIGINT, px DOUBLE",
      Row("A", null, Double.box(99.0)),           // no effective time
      Row("A", Long.box(200), Double.box(20.0)))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsofJoin.asof(trades, q3, Seq("sym"), "t", "t", direction = dir)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
      assert(!out.values.exists(_ == 99.0),
        s"direction=$dir leaked a null-time right row as a match")
      assert(out(("B", 100L)) == null, s"direction=$dir")
    }
    // Backward specifically: the early trade has no real match left.
    val back = AsofJoin.asof(trades, q3, Seq("sym"), "t", "t")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(back(("A", 50L)) == null && back(("A", 205L)) == 20.0)
  }

  test("asof preserves all left rows and columns") {
    val out = AsofJoin.asof(trades, quotes, Seq("sym"), "t", "t")
    assert(out.count() == 4)
    assert(out.columns.toSeq == Seq("sym", "t", "qty", "px"))
  }

  private def px(d: org.apache.spark.sql.DataFrame): Map[(String, Long), Any] =
    d.collect().map(r => (r.getString(0), r.getLong(1)) ->
      (if (r.isNullAt(3)) null else r.getDouble(3))).toMap

  test("asof forward: earliest at-or-after match per key") {
    val out = px(AsofJoin.asof(trades, quotes, Seq("sym"), "t", "t",
      direction = "forward"))
    assert(out(("A", 100L)) == 10.0, "tie at the same instant matches")
    assert(out(("A", 50L)) == 10.0, "earliest later quote wins")
    assert(out(("A", 205L)) == null, "nothing after → null")
    assert(out(("B", 100L)) == null)
  }

  test("asof forward honors tolerance") {
    val out = px(AsofJoin.asof(trades, quotes, Seq("sym"), "t", "t",
      direction = "forward", tolerance = Some(40L)))
    assert(out(("A", 50L)) == null, "gap 50 > 40 → voided")
    assert(out(("A", 100L)) == 10.0)
  }

  test("asof nearest: closer side wins; exact tie → backward") {
    // trade t=150 sits exactly between quotes at 100 and 200.
    val tr = df("sym STRING, t BIGINT",
      Row("A", Long.box(150)), Row("A", Long.box(160)), Row("A", Long.box(140)))
    val out = tr.transform(l =>
        AsofJoin.asof(l, quotes, Seq("sym"), "t", "t", direction = "nearest"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(out(150L) == 10.0, "exact tie picks the backward match")
    assert(out(160L) == 20.0, "forward closer")
    assert(out(140L) == 10.0, "backward closer")
  }

  test("asof nearest falls back across tolerance asymmetrically") {
    // backward gap 55 (too old), forward gap 50 (within) → forward.
    val tr = df("sym STRING, t BIGINT", Row("A", Long.box(155)))
    val out = px2(AsofJoin.asof(tr, quotes, Seq("sym"), "t", "t",
      direction = "nearest", tolerance = Some(50L)))
    assert(out(155L) == 20.0)
    // neither side in tolerance → null.
    val far = px2(AsofJoin.asof(
      df("sym STRING, t BIGINT", Row("A", Long.box(260))),
      quotes, Seq("sym"), "t", "t",
      direction = "nearest", tolerance = Some(10L)))
    assert(far(260L) == null)
  }

  private def px2(d: org.apache.spark.sql.DataFrame): Map[Long, Any] =
    d.collect().map(r => r.getLong(1) ->
      (if (r.isNullAt(2)) null else r.getDouble(2))).toMap

  test("asof rejects unknown directions") {
    intercept[IllegalArgumentException] {
      AsofJoin.asof(trades, quotes, Seq("sym"), "t", "t",
        direction = "sideways")
    }
  }

  test("sessionize splits on gaps strictly greater than gapMs") {
    val ev = df("u STRING, t BIGINT",
      Row("x", Long.box(0)), Row("x", Long.box(100)),   // session 0
      Row("x", Long.box(300)),                          // gap 200 > 100 → session 1
      Row("x", Long.box(400)),
      Row("y", Long.box(0)))                            // separate key
    val out = Sessionize.summarize(ev, "u", "t", gapMs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(out(("x", 0L)) == (0L, 100L, 2L))
    assert(out(("x", 1L)) == (300L, 400L, 2L))
    assert(out(("y", 0L)) == (0L, 0L, 1L))
    // boundary: gap == gapMs stays in-session
    val b = Sessionize.summarize(
      df("u STRING, t BIGINT", Row("z", Long.box(0)), Row("z", Long.box(100))),
      "u", "t", gapMs = 100L)
    assert(b.count() == 1)
  }
}
