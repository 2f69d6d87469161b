package graft

import graft.operators.TextIndex
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextIndexSpec extends SparkSpec {

  private def corpus = df("doc_id BIGINT, text STRING",
    Row(Long.box(1), "spark runs fast spark scales"),
    Row(Long.box(2), "query planning in spark"),
    Row(Long.box(3), "merge statements update tables"),
    Row(Long.box(4), "unrelated words only here"))

  private def tmp(name: String) =
    sys.props("java.io.tmpdir") + s"/graft_tidx_spec_$name"

  test("index round-trip: BM25 from postings == direct corpus scoring") {
    val path = tmp("roundtrip")
    TextIndex.write(corpus, "doc_id", "text", path, nShards = 4)
    val got = TextIndex.searchBM25(spark, path, Seq("spark", "merge"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Direct restatement: same formula over the raw corpus.
    val rows = corpus.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = rows.length.toDouble
    val avgdl = rows.map(_._2.size).sum / n
    def dfOf(t: String) = rows.count(_._2.contains(t)).toDouble
    def score(toks: Seq[String]): BigDecimal =
      Seq("spark", "merge").map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) BigDecimal(0)
        else {
          val idf = BigDecimal(math.log((n - dfOf(t) + 0.5) / (dfOf(t) + 0.5)
            + 1.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          BigDecimal(idf * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
    val want = rows.map { case (id, toks) => id -> score(toks) }
      .filter(_._2 != BigDecimal(0))
      .map { case (id, s) =>
        id -> s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .toMap
    assert(got == want, s"index scores diverged:\n$got\n$want")
    assert(!got.contains(4L), "docs with no query term never surface")
  }

  test("serving prunes to the query terms' shards") {
    val path = tmp("prune")
    TextIndex.write(corpus, "doc_id", "text", path, nShards = 4)
    val plan = TextIndex.searchBM25(spark, path, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"shard partition filter must reach the scan:\n$plan")
    val shard = spark.range(1).select(
      pmod(xxhash64(lit("spark")), lit(4))).head().getLong(0)
    assert(plan.contains(s"shard#") && plan.contains(shard.toString),
      s"the probed shard id must appear in the partition filter:\n$plan")
  }

  test("absent term returns empty; rebuild overwrites cleanly") {
    val path = tmp("absent")
    TextIndex.write(corpus, "doc_id", "text", path, nShards = 4)
    assert(TextIndex.searchBM25(spark, path, Seq("zzz_nothere"), k = 5)
      .count() == 0)
    // Overwrite with a smaller corpus: old postings must not linger.
    TextIndex.write(corpus.filter(col("doc_id") === 3), "doc_id", "text",
      path, nShards = 4)
    val got = TextIndex.searchBM25(spark, path, Seq("merge"), k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L))
  }
}
