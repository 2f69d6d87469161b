package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair every left interval with every right
  * interval it overlaps — `l.start < r.end AND r.start < l.end`
  * (half-open, the calendar/maintenance-window convention).
  *
  * Spark plans a raw inequality join as a broadcast-nested-loop or a
  * cartesian product — |L|·|R| comparisons, the classic 100 TB
  * cliff. This operator turns it into an EQUI-join: each interval
  * explodes into the fixed-width time buckets it covers, candidates
  * meet on (bucket [, keys]) in an ordinary shuffled hash join, and
  * the exact predicate filters bucket-mates that don't truly overlap.
  * Cost: Σ intervals·(span/W) exploded rows and a hash join whose
  * volume is per-bucket density — never |L|·|R|.
  *
  * A pair sharing several buckets would surface once per shared
  * bucket; instead of a `distinct` (a second full shuffle of the
  * matched pairs) each pair is emitted ONLY from the first bucket the
  * two intervals share — `bucket == max(floor(l.start/W),
  * floor(r.start/W))` — which is exact and join-local.
  *
  * `bucketWidth` tunes the explode factor vs bucket density: W of the
  * typical interval length gives ~2 buckets per interval. Unbounded
  * (open-ended) intervals don't fit this scheme — cap them upstream.
  */
object IntervalJoin {

  /** @param left      intervals with `lStart`/`lEnd` (numeric, same unit)
    * @param right     intervals with `rStart`/`rEnd`
    * @param lStart    left interval start column name
    * @param lEnd      left interval end column name (exclusive)
    * @param rStart    right interval start column name
    * @param rEnd      right interval end column name (exclusive)
    * @param keys      optional equi-key column names present on both
    *                  sides (co-partitioning keys; bucket join runs
    *                  per key)
    * @param bucketWidth fixed bucket width in the interval unit
    * @param maxBucketsPerInterval loud-failure guard: an interval
    *                  spanning more buckets than this raises at
    *                  runtime instead of silently exploding the row
    *                  (the 100 TB failure mode of an unbounded
    *                  interval is an OOM three stages later — fail at
    *                  the source with the offending span in the
    *                  message)
    */
  def overlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      keys: Seq[String] = Nil, bucketWidth: Long,
      maxBucketsPerInterval: Int = 100000): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val dup = (lCols.toSet & rCols.toSet) -- keys
    require(dup.isEmpty,
      s"column collision between sides: ${dup.mkString(", ")} — rename first")

    // Integer-exact floor division: `c / lit(w)` would be DOUBLE true
    // division, whose floor can land one bucket off when c is an exact
    // multiple of w; subtracting the pmod first makes the quotient an
    // exact integer in double (both operands < 2^53).
    def idiv(c: Column, w: Long): Column =
      ((c - pmod(c, lit(w))) / lit(w)).cast("long")

    def buckets(s: Column, e: Column): Column = {
      // [s div W, (e-1) div W] — half-open intervals never touch the
      // bucket their exclusive end lands on. Empty/negative-length or
      // null intervals explode to nothing and match nothing.
      val span = idiv(e - lit(1), bucketWidth) - idiv(s, bucketWidth) + lit(1)
      when(s.isNotNull && e.isNotNull && s < e,
        when(span > maxBucketsPerInterval,
          // assert_true raises with the offending span; the array
          // branch below is never reached for such a row.
          assert_true(span <= maxBucketsPerInterval,
            concat(lit(s"interval spans more than $maxBucketsPerInterval " +
              s"buckets at width $bucketWidth (span="), span,
              lit(") — widen bucketWidth or cap open-ended intervals")))
            .cast("array<bigint>"))
          .otherwise(sequence(idiv(s, bucketWidth), idiv(e - lit(1), bucketWidth))))
    }

    val lb = left.withColumn("__bkt",
      explode(buckets(col(lStart), col(lEnd))))
    val rb = right.withColumn("__bkt",
      explode(buckets(col(rStart), col(rEnd))))
    val joinCond = (keys.map(k => lb(k) === rb(k)) :+
      (lb("__bkt") === rb("__bkt")) :+
      (lb(lStart) < rb(rEnd)) :+ (rb(rStart) < lb(lEnd)) :+
      // emit each overlapping pair exactly once: from the FIRST bucket
      // both cover, which is the later of the two start buckets.
      (lb("__bkt") === greatest(idiv(lb(lStart), bucketWidth),
        idiv(rb(rStart), bucketWidth)))).reduce(_ && _)
    lb.join(rb, joinCond)
      .select((lCols.map(lb(_)) ++ rCols.filterNot(keys.contains).map(rb(_))): _*)
  }
}
