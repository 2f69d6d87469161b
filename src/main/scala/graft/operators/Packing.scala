package graft.operators

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
  * The driver materialization is the per-(group, bucket) TOTALS — a
  * bounded summary, never row data (same posture as the IVF centroid
  * ranking). The order key must be numeric and unique per group (the
  * same total-order contract as the window formulation).
  */
object Packing {

  def packTwoPass(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "need at least one bucket")
    val spark = df.sparkSession
    val mm = df.groupBy(col(groupCol))
      .agg(min(col(orderCol)).cast(LongType).as("__lo"),
        max(col(orderCol)).cast(LongType).as("__hi"))
    val bucketed = df.join(broadcast(mm), groupCol)
      .withColumn("__bucket",
        expr(s"CAST((($orderCol - __lo) * $nBuckets) " +
          s"DIV (__hi - __lo + 1) AS INT)"))
    val totals = bucketed
      .groupBy(col(groupCol), col("__bucket"))
      .agg(sum(col(tokensCol)).cast(LongType).as("__t"))
      .collect()
    val baseRows = totals.groupBy(_.get(0)).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      sorted.zip(sorted.scanLeft(0L)(_ + _.getLong(2)).init)
        .map { case (r, base) => Row(r.get(0), r.getInt(1), base) }
    }
    val totalsSchema = StructType(
      bucketed.select(col(groupCol), col("__bucket")).schema.fields.toSeq :+
        StructField("__base", LongType, nullable = false))
    val baseDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(baseRows).asJava), totalsSchema)
    val w = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(baseDf), Seq(groupCol, "__bucket"))
      .withColumn("end_offset",
        sum(col(tokensCol)).over(w) + col("__base"))
      .drop("__bucket", "__lo", "__hi", "__base")
  }
}
