package graft

import graft.operators.DatasetCard
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DatasetCardSpec extends SparkSpec {

  private def corpus = df("doc_id BIGINT, text STRING, lang STRING, src STRING",
    Row(Long.box(1), "one two three", "en", "web"),
    Row(Long.box(2), "one two three", "en", "web"),    // exact dup of 1
    Row(Long.box(3), "uno dos", "es", "web"),
    Row(Long.box(4), "eins", null, "books"))           // null facet value

  test("card: corpus row + per-facet rows, exact metrics, null facet kept") {
    val card = DatasetCard.card(corpus, "doc_id", "text", Seq("lang", "src"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(card.keySet == Set(
      ("corpus", "all"), ("lang", "en"), ("lang", "es"), ("lang", "<null>"),
      ("src", "web"), ("src", "books")))
    val all = card(("corpus", "all"))
    assert(all.getLong(2) == 4)                      // n_docs
    assert(all.getLong(3) == 3 + 3 + 2 + 1)          // n_tokens
    assert(all.getLong(5) == 3)                      // n_distinct_texts
    assert(all.getDouble(8) == 25.0)                 // exact_dup_pct
    val en = card(("lang", "en"))
    assert(en.getLong(2) == 2 && en.getLong(5) == 1) // both docs identical
    assert(en.getDouble(8) == 50.0)
    assert(en.getDouble(6) == 3.0)                   // median_tokens
    val nulls = card(("lang", "<null>"))
    assert(nulls.getLong(2) == 1 && nulls.getDouble(8) == 0.0)
  }

  test("card runs as ONE scan: grouping sets expand, no union of scans") {
    val q = DatasetCard.card(corpus, "doc_id", "text", Seq("lang", "src"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      s"facet rollups must share the scan via grouping-sets expand:\n$plan")
    assert(!plan.contains("Union"),
      s"a union of per-facet scans defeats the single-pass design:\n$plan")
  }

  test("facets are required and guarded") {
    intercept[IllegalArgumentException] {
      DatasetCard.card(corpus, "doc_id", "text", Nil)
    }
  }
}
