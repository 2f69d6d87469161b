package graft.operators

import graft.functions.ColumnLib.freeColumn
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-out sequence packing (the pre-training "lay docs end-to-end,
  * cut at a token budget" recipe — reference semantics in
  * graft.queries.TextOps q44).
  *
  * The single-window formulation partitions by group only: a corpus
  * with FEW huge groups serializes each group through one task, and the
  * cumulative offset cannot simply be salted (it would restart per salt
  * bucket). This operator is the two-pass fix promised in q44's notes:
  *
  *  1. bucket each row by an equi-width slice of its ORDER-key domain
  *     (monotone in the order key, so bucket-local prefix sums compose
  *     into the global one — a hash bucket would not compose);
  *  2. aggregate per-(group, bucket) token totals — a tiny relation,
  *     bounded by groups x buckets — prefix-sum it on the driver, and
  *     broadcast the resulting base offsets back;
  *  3. run the cumulative window per (group, bucket) and add the base:
  *     parallelism is groups x buckets, each window sees ~1/buckets of
  *     its group.
  *
  * Three column-pruned passes over the input: the per-group order-key
  * min/max (reads two columns; the bucketing needs it before any total
  * can be formed), the totals pass, and the output pass. The driver
  * materialization is the per-(group, bucket) TOTALS — a bounded
  * summary, never row data (same posture as the IVF centroid ranking).
  * Group keys may be NULL (the joins are null-safe, matching the
  * window formulation where a NULL group is its own partition); the
  * order key must be numeric, non-null, and unique per group (the same
  * total-order contract as the window formulation); NULL token counts
  * contribute zero to the bases, exactly as a window SUM skips them.
  */
object Packing {

  def packTwoPass(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "need at least one bucket")
    val spark = df.sparkSession
    val (gC, loC, hiC, bkC, baseC) = (freeColumn(df, "__g"),
      freeColumn(df, "__lo"), freeColumn(df, "__hi"),
      freeColumn(df, "__bucket"), freeColumn(df, "__base"))
    val mm = df.groupBy(col(groupCol).as(gC))
      .agg(min(col(orderCol)).cast(LongType).as(loC),
        max(col(orderCol)).cast(LongType).as(hiC))
    // Bucket width is computed by DIVISION, not ((key-lo)*buckets) DIV
    // range: the multiplication form overflows Long for key ranges
    // wider than MaxValue/buckets and wraps into NON-monotone buckets
    // silently. width >= 1 and (hi-lo)/width < nBuckets by
    // construction, so buckets stay monotone in the order key for any
    // Long range.
    val bucketed = df
      .join(broadcast(mm), col(groupCol) <=> col(gC))
      .withColumn(bkC,
        expr(s"CAST((($orderCol - $loC) DIV " +
          s"(($hiC - $loC) DIV $nBuckets + 1)) AS INT)"))
      .drop(gC)
    val totals = bucketed
      .groupBy(col(groupCol), col(bkC))
      .agg(sum(coalesce(col(tokensCol), lit(0L))).cast(LongType).as("__t"))
      .collect()
    val baseRows = totals.groupBy(_.get(0)).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      sorted.zip(sorted.scanLeft(0L)(_ + _.getLong(2)).init)
        .map { case (r, base) => Row(r.get(0), r.getInt(1), base) }
    }
    val totalsSchema = StructType(
      Seq(bucketed.schema(groupCol).copy(name = gC),
        bucketed.schema(bkC),
        StructField(baseC, LongType, nullable = false)))
    val baseDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(baseRows).asJava), totalsSchema)
    val w = Window.partitionBy(col(groupCol), col(bkC))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(baseDf),
        col(groupCol) <=> col(gC) && bucketed(bkC) === baseDf(bkC))
      .drop(baseDf(bkC)).drop(gC)
      .withColumn("end_offset",
        sum(col(tokensCol)).over(w) + col(baseC))
      .drop(bkC, loC, hiC, baseC)
  }
}
