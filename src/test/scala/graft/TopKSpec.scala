package graft

import graft.operators.TopK
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private def docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    .select(col("source"), col("doc_id"), col("n_chars"))

  test("custom top-k operator ≡ window row_number formulation") {
    val viaOp = TopK.perGroup(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), k = 5)
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val viaWindow = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 5).drop("__rn")
    assert(rowSet(viaOp) == rowSet(viaWindow))
    assert(viaOp.count() > 0)
  }

  test("groups smaller than k pass through whole; ties cut by the tiebreaker") {
    val d = df("g STRING, id BIGINT, v BIGINT",
      Row("a", Long.box(1), Long.box(10)),
      Row("a", Long.box(2), Long.box(10)), // tie on v with id 1
      Row("a", Long.box(3), Long.box(5)),
      Row("b", Long.box(9), Long.box(1))) // group smaller than k
    val out = TopK.perGroup(d, Seq("g"),
        Seq(col("v").desc, col("id").asc), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }

  test("plan: no sort anywhere; partial prune below the exchange, final above") {
    val plan = TopK.perGroup(docs, Seq("source"),
        Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"bounded heaps must replace the sort:\n$plan")
    val finalIdx = plan.indexOf("TopKPerGroupFinal")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("TopKPerGroupPartial")
    // Tree print order: final (top) → hash exchange → partial (bottom):
    // the map-side prune runs BEFORE the shuffle.
    assert(finalIdx >= 0 && exchangeIdx > finalIdx && partialIdx > exchangeIdx,
      s"expected final → exchange → partial:\n$plan")
    // Column pruning still reaches the scan through the custom node.
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      s"scan must read only the three referenced columns:\n$plan")
  }

  test("k=1 heap plan ≡ latestWins window plan, nulls-last ordering included") {
    import graft.functions.ColumnLib
    val d = df("k STRING, t BIGINT, id BIGINT, v STRING",
      Row("a", Long.box(10), Long.box(1), "old"),
      Row("a", Long.box(20), Long.box(2), "new"),
      Row("b", null, Long.box(3), "only-null-t"),
      Row("c", null, Long.box(4), "null-t"),
      Row("c", Long.box(5), Long.box(5), "has-t"))
    val ordering = Seq(col("t").desc_nulls_last, col("id").asc)
    val viaOp = TopK.perGroup(d, Seq("k"), ordering, k = 1)
    val viaWin = ColumnLib.latestWins(d, Seq("k"), ordering)
    assert(rowSet(viaOp) == rowSet(viaWin))
    assert(viaOp.collect().map(r => r.getString(0) -> r.getString(3)).toMap ==
      Map("a" -> "new", "b" -> "only-null-t", "c" -> "has-t"))
  }

  test("deterministic under repartitioning (total order contract)") {
    val a = rowSet(TopK.perGroup(docs, Seq("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), k = 4))
    val b = rowSet(TopK.perGroup(docs.repartition(13), Seq("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), k = 4))
    assert(a == b)
  }
}
