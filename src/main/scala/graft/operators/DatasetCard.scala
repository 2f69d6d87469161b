package graft.operators

import graft.functions.TextFunctions.tokenCountWs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Dataset card — the release manifest every corpus drop ships with
  * (the "datasheet/data card" practice of Gebru et al. 2018,
  * arXiv:1803.09010, as practiced by large-corpus releases): one row
  * per facet value summarizing population, token mass, duplication
  * and length shape, so a consumer can audit composition without
  * scanning the data.
  *
  * Everything is computed in ONE grouping-sets pass over the corpus
  * (facet rollups and the all-corpus row share the scan; Spark plans
  * grouping sets as a single expand + aggregate), and every metric is
  * deterministic and engine-portable: exact counts, decimal-snapped
  * token sums, digest-based dup detection (two-level exact count
  * distinct), and R-7 interpolated medians on the same 1e-9 grid the
  * rest of the battery uses. Duplication is EXACT-text duplication
  * (md5 digest); the near-dup rate is a pipeline-level number that
  * composes from the dedup operators, not a scan statistic.
  *
  * Scale: one shuffle keyed on the expanded grouping sets; the
  * exact median is the only per-group sort — the scan-friendly
  * substitute at extreme facet cardinality is approx_percentile,
  * traded in by the caller, as q92's family documents.
  */
object DatasetCard {

  /** @param facets  facet columns (e.g. lang, source); the card holds
    *                one row per (facet, value) plus the `corpus/all`
    *                row — grouping-sets, not N scans.
    */
  def card(docs: DataFrame, idCol: String, textCol: String,
      facets: Seq[String]): DataFrame = {
    require(facets.nonEmpty, "need at least one facet column")
    val d = docs.select(
      (col(idCol) +: facets.map(col) :+
        tokenCountWs(col(textCol)).cast(LongType).as("__tok") :+
        length(col(textCol)).cast(LongType).as("__len") :+
        md5(col(textCol)).as("__dig")): _*)
    // Facet label/value per grouping set via grouping() markers — a
    // null-valued facet in the DATA stays distinguishable from the
    // aggregated-away column of another set.
    val facetName = facets.tail.foldLeft(
        when(grouping(col(facets.head)) === 0, lit(facets.head))) {
      case (acc, f) => acc.when(grouping(col(f)) === 0, lit(f))
    }.otherwise(lit("corpus"))
    val facetValue = coalesce(
      (facets.map(f =>
        when(grouping(col(f)) === 0, coalesce(col(f), lit("<null>")))) :+
        lit("all")): _*)
    d.groupingSets(
        facets.map(f => Seq(col(f))) :+ Seq.empty[org.apache.spark.sql.Column],
        facets.map(col): _*)
      .agg(
        facetName.as("facet"),
        facetValue.as("value"),
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).cast(LongType).as("n_tokens"),
        sum(col("__len")).cast(LongType).as("n_chars"),
        count_distinct(col("__dig")).as("n_distinct_texts"),
        round(percentile(col("__tok"), lit(0.5)), 9).as("median_tokens"),
        round(percentile(col("__len"), lit(0.5)), 9).as("median_chars"))
      .select(
        (Seq("facet", "value", "n_docs", "n_tokens", "n_chars",
          "n_distinct_texts", "median_tokens", "median_chars").map(col)): _*)
      .withColumn("exact_dup_pct",
        round((col("n_docs") - col("n_distinct_texts"))
          .cast(DecimalType(38, 18)) / col("n_docs").cast(DecimalType(38, 18))
          * 100, 6).cast(DoubleType))
  }
}
