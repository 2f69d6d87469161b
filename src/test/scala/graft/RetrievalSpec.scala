package graft

import graft.operators.Retrieval
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def ranked(pairs: (Long, Int)*) =
    df("id BIGINT, rank INT", pairs.map { case (i, r) =>
      Row(Long.box(i), Int.box(r)) }: _*)

  test("rrfFuse: plain-Scala restatement, absent ids contribute nothing") {
    // list A ranks 1..3 = ids 10,11,12; list B ranks 1..3 = ids 12,13,10
    val a = ranked(10L -> 1, 11L -> 2, 12L -> 3)
    val b = ranked(12L -> 1, 13L -> 2, 10L -> 3)
    val got = Retrieval.rrfFuse(Seq(a, b), k0 = 60, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    def rrf(rs: Seq[Int]) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      10L -> rrf(Seq(1, 3)), 11L -> rrf(Seq(2)),
      12L -> rrf(Seq(3, 1)), 13L -> rrf(Seq(2)))
      .sortBy { case (id, s) => (-s, id) }
    assert(got == want, s"\n$got\n$want")
    // both-lists ids beat single-list ids here (1/61+1/63 > 1/62)
    assert(got.take(2).map(_._1).toSet == Set(10L, 12L))
    // ties (11 and 13 both rank-2 singletons) break by id ascending
    assert(got.drop(2).map(_._1) == Seq(11L, 13L))
  }

  test("rrfFuse: topK cut, single list is identity order, guards") {
    val a = ranked(1L -> 1, 2L -> 2, 3L -> 3)
    assert(Retrieval.rrfFuse(Seq(a), k0 = 60, topK = 2)
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, k0 = 60, topK = 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), k0 = 0, topK = 5)
    }
  }

  test("rankOf: 1-based ranks under the given total order") {
    val d = df("k BIGINT, s DOUBLE",
      Row(Long.box(7), Double.box(0.5)), Row(Long.box(8), Double.box(0.9)),
      Row(Long.box(9), Double.box(0.5)))
    val r = Retrieval.rankOf(d, "k", Seq(col("s").desc, col("k").asc))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(8L -> 1, 7L -> 2, 9L -> 3))
  }
}
