package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Persisted stable token vocabulary — the id-assignment artifact a
  * training pipeline freezes: once a token has an id, that id must
  * never change (checkpoints, packed shards, and eval sets all bake
  * ids in), and new tokens must get fresh ids ABOVE every existing id
  * so an embedding table grows by concatenation, never by reindexing.
  *
  * Layout: `(token, id)` parquet rows partitioned by `batch` (build
  * writes `batch=build`), plus a `__meta` ledger row per batch
  * `(batch, n_tokens, max_id)` — the fourth artifact family on the
  * [[IndexCommit]] protocol (text postings, vector clusters, LSH
  * bands, now ids): the ledger row is the COMMIT POINT, a torn append
  * is invisible, a retry replaces the failed batch's dirs, a
  * committed batch id is exactly-once, and the writer lock excludes
  * concurrent assignment (two uncoordinated appends would mint
  * colliding ids — the one failure mode this artifact exists to
  * prevent).
  *
  * Id order: build assigns 0..V−1 by (count DESC, token ASC) — the
  * frequency convention every tokenizer uses, so frequent tokens get
  * small ids and downstream tables can be truncated by id. Appends
  * assign maxId+1.. to NEW tokens only, same order within the batch.
  * Assignment is a global order, realized with `zipWithIndex` over
  * the sorted frame (order-preserving and distributed — never a
  * one-partition row_number window).
  */
object Vocab {

  private val metaSchema = "batch STRING, n_tokens LONG, max_id LONG"

  /** (token, id) from a token-occurrence stream (one row per
    * occurrence; counting is internal). Overwrites any existing vocab
    * at `path` and resets the ledger.
    */
  def build(toks: DataFrame, tokenCol: String, path: String): Unit = {
    val spark = toks.sparkSession
    val ids = assignIds(counts(toks, tokenCol), startId = 0L)
      .localCheckpoint(true) // write + the max-id aggregate
    ids.withColumn("batch", lit("build"))
      .write.mode("overwrite").option("partitionOverwriteMode", "static")
      .partitionBy("batch").parquet(path)
    writeMetaRow(spark, path, "build", ids, overwrite = true)
  }

  /** Mint ids for the batch's NEW tokens only (anti-join against the
    * committed vocab), starting at maxId+1. O(batch + one vocab
    * anti-join): existing rows are never read into the write path,
    * let alone rewritten.
    */
  def append(toks: DataFrame, tokenCol: String, path: String,
      batch: String): Unit =
    Upsert.withWriterLock(toks.sparkSession, path) {
      val spark = toks.sparkSession
      IndexCommit.requireSaneBatchId(batch)
      val meta = readMeta(spark, path)
      IndexCommit.requireNotCommitted(batch, meta.batches, s"${path}__meta")
      IndexCommit.dropOrphanDirs(spark, path, s"batch=$batch")
      val existing = committedRows(spark, path, meta).select("token")
      val fresh = counts(toks, tokenCol)
        .join(existing, Seq("token"), "left_anti")
      val ids = assignIds(fresh, startId = meta.maxId + 1)
        .localCheckpoint(true) // write + the max-id aggregate
      ids.withColumn("batch", lit(batch))
        .write.mode("append").option("partitionOverwriteMode", "static")
        .partitionBy("batch").parquet(path)
      // COMMIT POINT: the batch's ids exist once this row is durable.
      writeMetaRow(spark, path, batch, ids, overwrite = false)
    }

  /** The committed vocabulary: (token, id), torn appends invisible. */
  def read(spark: SparkSession, path: String): DataFrame =
    committedRows(spark, path, readMeta(spark, path)).select("token", "id")

  /** Map a token column to its stable id (left join: out-of-vocabulary
    * tokens get a null id — the caller decides between dropping and
    * an UNK id). Adds `idCol` to `df`.
    */
  def encode(df: DataFrame, tokenCol: String, idCol: String,
      spark: SparkSession, path: String): DataFrame =
    df.join(read(spark, path)
        .select(col("token").as(tokenCol), col("id").as(idCol)),
      Seq(tokenCol), "left")

  private def counts(toks: DataFrame, tokenCol: String): DataFrame =
    toks.filter(col(tokenCol).isNotNull)
      .groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("__c"))

  /** Dense ids in (count DESC, token ASC) order from `startId`.
    * zipWithIndex preserves the sort order across partitions and
    * never funnels the vocab into one task.
    */
  private def assignIds(cnt: DataFrame, startId: Long): DataFrame = {
    val spark = cnt.sparkSession
    val sorted = cnt.orderBy(col("__c").desc, col("token").asc)
    val schema = StructType.fromDDL("token STRING, id LONG")
    spark.createDataFrame(
      sorted.select("token").rdd.zipWithIndex().map {
        case (r, i) => Row(r.getString(0), startId + i)
      }, schema)
  }

  private final case class Meta(maxId: Long, batches: Set[String])

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val rows = spark.read.parquet(s"${path}__meta").collect()
    require(rows.nonEmpty, s"empty vocab ledger at ${path}__meta")
    Meta(rows.map(_.getLong(2)).max, rows.map(_.getString(0)).toSet)
  }

  private def committedRows(spark: SparkSession, path: String,
      meta: Meta): DataFrame =
    spark.read.parquet(path)
      .filter(col("batch").cast("string").isin(meta.batches.toSeq: _*))

  private def writeMetaRow(spark: SparkSession, path: String, batch: String,
      ids: DataFrame, overwrite: Boolean): Unit = {
    val st = ids.agg(count(lit(1)).as("n"),
      coalesce(max(col("id")), lit(-1L)).as("mx")).head()
    spark.createDataFrame(
        java.util.List.of(Row(batch, st.getLong(0), st.getLong(1))),
        StructType.fromDDL(metaSchema))
      .coalesce(1)
      .write.mode(if (overwrite) "overwrite" else "append")
      .parquet(s"${path}__meta")
  }
}
