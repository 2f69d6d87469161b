package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted text index with partition-pruned BM25 serving —
  * the sparse-retrieval analog of the dense-index ladder
  * ([[Similarity.ivfWrite]]/`ivfSearch`): build once, append batches,
  * then serve a query reading ONLY the token shards its terms hash
  * into, never the corpus. q136 scores one probe query with a full
  * corpus pass; this is the shape a repeated-query curation workload
  * wants.
  *
  * Layout: posting rows `(token, doc, tf, dl, df)` partitioned by
  * `shard = pmod(xxhash64(token), nShards)`. Because sharding is by
  * token HASH, every posting of a term — build-time or appended —
  * lands in the same shard, so a probe read of a term's shard sees
  * that term's COMPLETE posting list. Serving therefore derives the
  * authoritative document frequency from the probed postings
  * themselves (`count over token`), which makes the stored `df`
  * column a build-time cache that appends cannot go stale against.
  * Corpus constants live in `path + "__meta"` as an APPEND-ONLY
  * ledger — one row per batch `(batch, n_docs, sum_dl, n_postings,
  * n_tokens, n_shards)`, the [[Similarity.ivfStats]] convention —
  * and serving sums them; no read-modify-write on any sidecar.
  *
  * Scale: the build is two token-keyed exchanges (tf groupBy, df
  * count + join-back — the second join lands on the same token
  * partitioning) and a `repartition(shard)` write (one file per
  * shard, no partitionBy small-file explosion). [[append]] is
  * O(batch): the existing index is never read or rewritten, new
  * postings ride `mode("append")` into their shards. A query touches
  * |terms| shards = a |terms|/nShards fraction of the index bytes;
  * the per-doc score sum accumulates 1e-9-snapped contributions in
  * DECIMAL so the aggregation is shuffle-order-independent (plain
  * double summation over a groupBy is not associativity-safe).
  *
  * What appending CANNOT freeze: avgdl. BM25's length normalization
  * is calibrated to the corpus mean document length, so a drifting
  * batch shifts every score slightly — the ledger's per-batch
  * `sum_dl/n_docs` vs the build row ([[indexStats]]) is the rebuild
  * trigger, the text analog of the IVF assignment-tightness drift.
  */
object TextIndex {

  val K1 = 1.2
  val B = 0.75

  private val metaSchema =
    "batch STRING, n_docs LONG, sum_dl LONG, n_postings LONG, " +
      "n_tokens LONG, n_shards INT"

  /** One corpus scan → postings frame + its 1-row batch stats. */
  private def tokenize(docs: DataFrame, id: String, body: String)
      : (DataFrame, DataFrame) = {
    val base = docs.select(col(id).as("doc"), words(col(body)).as("__ws"))
      .select(col("doc"), col("__ws"), size(col("__ws")).cast("long").as("dl"))
      .localCheckpoint(true) // postings AND stats read it: one corpus scan
    val postings = base
      .select(col("doc"), col("dl"), explode(col("__ws")).as("token"))
      .groupBy("token", "doc", "dl").agg(count(lit(1)).as("tf"))
    (postings,
      base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
  }

  private def writeMetaRow(postings: DataFrame, batchStats: DataFrame,
      batch: String, nShards: Int, path: String, overwrite: Boolean): Unit = {
    // Postings are already materialized under the shard write; this
    // aggregate re-reads the (cheap, localCheckpointed) lineage once.
    val p = postings.agg(count(lit(1)).as("n_postings"),
      count_distinct(col("token")).as("n_tokens")).head()
    val b = batchStats.head()
    val row = org.apache.spark.sql.Row(batch,
      b.getLong(0), if (b.isNullAt(1)) 0L else b.getLong(1),
      p.getLong(0), p.getLong(1), nShards)
    postings.sparkSession.createDataFrame(
        java.util.List.of(row),
        org.apache.spark.sql.types.StructType.fromDDL(metaSchema))
      .coalesce(1)
      .write.mode(if (overwrite) "overwrite" else "append")
      .parquet(s"${path}__meta")
  }

  def write(docs: DataFrame, id: String, body: String, path: String,
      nShards: Int = 16): Unit = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val (postings, stats) = tokenize(docs, id, body)
    val df = postings.groupBy("token").agg(count(lit(1)).as("df"))
    postings.join(df, "token")
      .withColumn("shard", pmod(xxhash64(col("token")), lit(nShards)))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // nShards rides in the ledger: serving and appends MUST hash with
    // the build's shard count — a mismatch would silently prune live
    // postings. A rebuild overwrites the ledger = resets the baseline.
    writeMetaRow(postings, stats, "build", nShards, path, overwrite = true)
  }

  /** Append a document batch into an existing index — the frozen-layout
    * ingest face ([[Similarity.ivfAppend]]'s pattern): token-hash
    * routing is frozen by the build's `n_shards` (read from the
    * ledger, never a parameter), new postings land in their terms'
    * shards via `mode("append")`, and one ledger row records the
    * batch. O(batch) — the existing postings are never read or
    * rewritten. The per-posting `df` recorded for the batch is
    * batch-local (a cache; serving recomputes df live), and the
    * writer lock enforces the same single-writer contract as
    * [[Upsert.applyToPartitionedParquet]].
    */
  def append(docs: DataFrame, id: String, body: String, path: String,
      batch: String): Unit =
    Upsert.withWriterLock(docs.sparkSession, path) {
      require(batch != "build", "batch id 'build' is reserved for the build row")
      val nShards = readMeta(docs.sparkSession, path)._3
      val (postings, stats) = tokenize(docs, id, body)
      val df = postings.groupBy("token").agg(count(lit(1)).as("df"))
      postings.join(df, "token")
        .withColumn("shard", pmod(xxhash64(col("token")), lit(nShards)))
        .repartition(col("shard"))
        .write.mode("append").partitionBy("shard").parquet(path)
      writeMetaRow(postings, stats, batch, nShards, path, overwrite = false)
    }

  /** Compact an append-heavy index: every [[append]] leaves one file
    * per touched shard, and probe cost at scale is file-count-
    * dominated (footer reads + task scheduling), so compaction is
    * part of the index lifecycle — exactly the [[graft.sources.Storage.compact]]
    * discipline, applied to the shard layout under the same writer
    * lock as [[append]]. Postings are byte-identical afterwards and
    * the ledger sidecar is untouched, so search results cannot change
    * (TextIndexSpec pins search-after-compact ≡ search-before).
    */
  def compact(spark: SparkSession, path: String): Unit =
    Upsert.withWriterLock(spark, path) {
      graft.sources.Storage.compact(spark, path, Some("shard"))
    }

  /** (n_docs, sum_dl, n_shards) summed over the batch ledger. */
  private def readMeta(spark: SparkSession, path: String): (Long, Long, Int) = {
    val m = spark.read.parquet(s"${path}__meta")
      .agg(sum(col("n_docs")), sum(col("sum_dl")),
        min(col("n_shards")), max(col("n_shards"))).head()
    require(m.getInt(2) == m.getInt(3),
      s"corrupt index meta: inconsistent n_shards ${m.getInt(2)}/${m.getInt(3)}")
    (m.getLong(0), m.getLong(1), m.getInt(2))
  }

  /** Per-batch ledger with `avgdl_drift` = batch mean doc length −
    * build mean doc length (the quantity BM25's b-normalization is
    * calibrated against) and `new_dl_frac`, the batch's share of all
    * indexed tokens. The ledger is one row per batch — broadcast.
    */
  def indexStats(spark: SparkSession, path: String): DataFrame = {
    val s = spark.read.parquet(s"${path}__meta")
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
    val base = s.filter(col("batch") === "build")
      .select(col("avgdl").as("__build_avgdl"))
    // 1-row totals broadcast (the stats-broadcast idiom) — an
    // unpartitioned window would funnel the ledger into one partition
    // and warn; the ledger is tiny but the plan shape should still be
    // the one that scales.
    val total = s.agg(sum(col("sum_dl")).cast("double").as("__total_dl"))
    s.join(broadcast(base), lit(true), "left")
      .join(broadcast(total), lit(true), "left")
      .withColumn("avgdl_drift", col("avgdl") - col("__build_avgdl"))
      .withColumn("new_dl_frac",
        col("sum_dl").cast("double") / col("__total_dl"))
      .drop("__build_avgdl", "__total_dl")
  }

  /** Okapi BM25 top-k for `terms` (k1=1.2, b=0.75, q136's exact
    * formula and 1e-9 idf snapping). Only documents containing at
    * least one term appear — the posting lists ARE the candidate set.
    * df is derived from the probed postings (complete per term, see
    * layout note), so results after N appends are IDENTICAL to a
    * fresh rebuild over the union — TextIndexSpec pins it.
    */
  def searchBM25(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    // Corpus constants and the shard modulus come from the index's OWN
    // ledger — taking nShards as a parameter again would let a
    // build/search mismatch silently prune live postings.
    val (nDocsL, sumDl, nShards) = readMeta(spark, path)
    val nDocs = nDocsL.toDouble
    val avgdl = sumDl.toDouble / nDocs
    // Shard ids computed with the SAME expression the build used, on a
    // tiny in-memory frame — no hand-rolled reimplementation of
    // xxhash64 to drift out of sync.
    val shards = spark.createDataFrame(
        terms.map(Tuple1(_))).toDF("token")
      .select(pmod(xxhash64(col("token")), lit(nShards)).as("shard"))
      .distinct().collect().map(_.getLong(0))
    val posts = spark.read.parquet(path)
      .filter(col("shard").isin(shards.toIndexedSeq: _*) &&
        col("token").isin(terms: _*))
      // Live df: every posting of a probed term is in the probed rows,
      // so this token-keyed count IS the current document frequency —
      // exact across any append history, stale-proof by construction.
      .withColumn("df_live",
        count(lit(1)).over(Window.partitionBy(col("token"))))
    val idf = round(log(
      (lit(nDocs) - col("df_live").cast("double") + 0.5) /
        (col("df_live").cast("double") + 0.5) + 1.0), 9)
    val tf = col("tf").cast("double")
    val contrib = idf * (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) +
        lit(B) * col("dl").cast("double") / lit(avgdl)))
    posts
      .select(col("doc"), round(contrib, 9).cast("decimal(38,18)").as("c"))
      .groupBy("doc")
      .agg(sum(col("c")).as("sc"))
      .select(col("doc"), round(col("sc").cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc"))
      .limit(k)
  }
}
