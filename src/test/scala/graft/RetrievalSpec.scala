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

  test("mmrDiversify: plain-Scala greedy restatement; guards") {
    // Three near-identical docs (1,2,3: sim 0.99) and one distinct (4).
    // Pure relevance would pick 1,2,3; MMR must interleave 4 early.
    val cands = df("id BIGINT, rel DOUBLE",
      Row(Long.box(1), Double.box(0.95)), Row(Long.box(2), Double.box(0.94)),
      Row(Long.box(3), Double.box(0.93)), Row(Long.box(4), Double.box(0.60)))
    val simPairs = for {
      a <- Seq(1L, 2L, 3L); b <- Seq(1L, 2L, 3L) if a != b
    } yield Row(Long.box(a), Long.box(b), Double.box(0.99))
    val dis = for {
      a <- Seq(1L, 2L, 3L); b <- Seq(4L); s <- Seq(0.05)
      r <- Seq(Row(Long.box(a), Long.box(b), Double.box(s)),
        Row(Long.box(b), Long.box(a), Double.box(s)))
    } yield r
    val sims = df("a BIGINT, b BIGINT, sim DOUBLE", (simPairs ++ dis): _*)
    val got = graft.operators.Retrieval
      .mmrDiversify(cands, sims, lambda = 0.7, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // plain-Scala greedy restatement
    val rel = Map(1L -> 0.95, 2L -> 0.94, 3L -> 0.93, 4L -> 0.60)
    val sim = (a: Long, b: Long) =>
      if (a == b) 0.0
      else if (a <= 3 && b <= 3) 0.99
      else 0.05
    var sel = Seq.empty[Long]
    val want = (1 to 4).map { step =>
      val scored = rel.keys.toSeq.filterNot(sel.contains).map { d =>
        val ms = if (sel.isEmpty) 0.0 else sel.map(s => sim(d, s)).max
        d -> (0.7 * rel(d) - (1.0 - 0.7) * ms)
      }
      val (id, m) = scored.minBy { case (d, m) => (-m, d) }
      sel = sel :+ id
      (step, id, m)
    }
    assert(got.toSeq == want, s"\n${got.toSeq}\n$want")
    // doc 4 must be picked SECOND (diversity beats the near-dups)
    assert(got(1)._2 == 4L)
    // corpus-sized input refuses
    val err = intercept[IllegalArgumentException] {
      graft.operators.Retrieval.mmrDiversify(cands, sims, 0.7, 2,
        maxCandidates = 2)
    }
    assert(err.getMessage.contains("maxCandidates"))
  }

  test("prfExpandTerms: tf-ordered, query terms excluded, tie by token") {
    val corpus = df("doc_id BIGINT, text STRING",
      Row(Long.box(1), "spark merge delta delta lake lake lake"),
      Row(Long.box(2), "spark delta iceberg iceberg"),
      Row(Long.box(3), "unrelated words never counted"))
    val top = df("doc_id BIGINT", Row(Long.box(1)), Row(Long.box(2)))
    val got = graft.operators.Retrieval.prfExpandTerms(
      corpus, "doc_id", "text", top, Seq("spark", "merge"), nExpand = 2)
    // counts over docs 1+2: delta=3, lake=3, iceberg=2; tie delta<lake
    assert(got == Seq("delta", "lake"), got.toString)
    // doc 3's tokens never leak into the expansion
    assert(!got.contains("unrelated"))
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
