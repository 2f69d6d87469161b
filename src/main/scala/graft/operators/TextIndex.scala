package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted text index with partition-pruned BM25 serving —
  * the sparse-retrieval analog of the dense-index ladder
  * ([[Similarity.ivfWrite]]/`ivfSearch`): build once, then serve a
  * query reading ONLY the token shards its terms hash into, never the
  * corpus. q136 scores one probe query with a full corpus pass; this
  * is the shape a repeated-query curation workload wants.
  *
  * Layout: posting rows `(token, doc, tf, dl, df)` partitioned by
  * `shard = pmod(xxhash64(token), nShards)` — tf/dl/df denormalized
  * into the posting so SERVING NEEDS ZERO JOINS (the BM25 score of a
  * (term, doc) pair is a pure function of the posting row plus two
  * corpus constants). Corpus constants (n_docs, sum_dl over ALL docs,
  * including empty ones) live in a 1-row `_meta` sidecar, exactly the
  * convention of the IVF stats ledger.
  *
  * Scale: the build is two token-keyed exchanges (tf groupBy, df
  * count + join-back — the second join lands on the same token
  * partitioning) and a `repartition(shard)` write (one file per
  * shard, no partitionBy small-file explosion). A query touches
  * |terms| shards = a |terms|/nShards fraction of the index bytes;
  * the per-doc score sum accumulates 1e-9-snapped contributions in
  * DECIMAL so the aggregation is shuffle-order-independent (plain
  * double summation over a groupBy is not associativity-safe).
  */
object TextIndex {

  val K1 = 1.2
  val B = 0.75

  def write(docs: DataFrame, id: String, body: String, path: String,
      nShards: Int = 16): Unit = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val base = docs.select(col(id).as("doc"), words(col(body)).as("__ws"))
      .select(col("doc"), col("__ws"), size(col("__ws")).cast("long").as("dl"))
      .localCheckpoint(true) // postings AND meta read it: one corpus scan
    val postings = base
      .select(col("doc"), col("dl"), explode(col("__ws")).as("token"))
      .groupBy("token", "doc", "dl").agg(count(lit(1)).as("tf"))
    val df = postings.groupBy("token").agg(count(lit(1)).as("df"))
    postings.join(df, "token")
      .withColumn("shard", pmod(xxhash64(col("token")), lit(nShards)))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // nShards rides in the sidecar: serving MUST hash with the build's
    // shard count — a mismatch would silently prune live postings.
    base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("n_shards", lit(nShards))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${path}__meta")
  }

  /** Okapi BM25 top-k for `terms` (k1=1.2, b=0.75, q136's exact
    * formula and 1e-9 idf snapping). Only documents containing at
    * least one term appear — the posting lists ARE the candidate set.
    */
  def searchBM25(spark: SparkSession, path: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    // The shard count comes from the index's OWN sidecar — taking it
    // as a parameter again would let a build/search mismatch silently
    // prune live postings (probe hashes mod the wrong modulus).
    val meta = spark.read.parquet(s"${path}__meta").head()
    val nDocs = meta.getLong(0).toDouble
    val avgdl = meta.getLong(1).toDouble / nDocs
    val nShards = meta.getAs[Int]("n_shards")
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
    val idf = round(log(
      (lit(nDocs) - col("df").cast("double") + 0.5) /
        (col("df").cast("double") + 0.5) + 1.0), 9)
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
