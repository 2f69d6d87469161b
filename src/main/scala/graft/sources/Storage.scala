package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet table storage layer (SURVEY.md §2.1 S9-S11): the engine's
  * load/DDL surface over date-partitioned parquet directories.
  *
  *  - [[loadAppend]] ⇔ WRITE_APPEND with ALLOW_FIELD_ADDITION/
  *    RELAXATION + autodetect (reference bigquery_service.py:265-300):
  *    parquet append with `mergeSchema` on read gives the same
  *    fixed-with-evolution schema model (SURVEY.md §1.1.3).
  *  - [[loadTruncate]] ⇔ WRITE_TRUNCATE (bigquery_service.py:302-309).
  *  - [[ensureTable]] ⇔ the idempotent DDL bootstrap
  *    (bigquery_service.py:97-260): DAY partitioning becomes
  *    `partitionBy(dateCol)`, clustering fields become
  *    `sortWithinPartitions` on write — at 100 TB this is what makes
  *    per-day pruning + within-file key locality (min/max row-group
  *    skipping) work.
  */
object Storage {

  /** Append with schema evolution: new columns are allowed, readers see
    * the union schema via mergeSchema.
    */
  def loadAppend(df: DataFrame, path: String,
      partitionCol: Option[String] = None,
      clusterBy: Seq[String] = Nil): Long = {
    val n = df.count()
    val sorted =
      if (clusterBy.nonEmpty)
        df.sortWithinPartitions(clusterBy.map(col): _*)
      else df
    val w = sorted.write.mode("append").option("mergeSchema", "true")
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
    n
  }

  /** Full overwrite (snapshot semantics). */
  def loadTruncate(df: DataFrame, path: String): Long = {
    val n = df.count()
    df.localCheckpoint(eager = true) // tolerate overwriting our own input
      .write.mode("overwrite").parquet(path)
    n
  }

  /** Evolution-aware read: union schema across files. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Bucketed managed table: pre-shuffled layout on the join/agg key.
    * Two tables bucketed on the same key with the same count join with
    * NO exchange on either side — the co-located join that at 100 TB
    * removes the dominant cost of repeated fact-fact joins
    * (SURVEY.md §4 "Clustering / data layout"). `sortBy` gives
    * sort-merge joins pre-sorted runs and row-group locality.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .option("path",
        df.sparkSession.conf.get("spark.sql.warehouse.dir") + "/" + table)
      .saveAsTable(table)

  /** A table "exists" when its directory holds data files (a bare
    * _SUCCESS marker from an empty write doesn't count — there is no
    * separate DDL in a parquet warehouse; the first data write declares
    * the layout, see [[graft.operators.Upsert.applyToPartitionedParquet]]).
    */
  def exists(path: String): Boolean = {
    val dir = new java.io.File(path)
    dir.exists() && Option(dir.listFiles()).exists(_.exists(f =>
      f.getName.endsWith(".parquet") || f.getName.contains("=")))
  }
}
