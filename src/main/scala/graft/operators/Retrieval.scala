package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a sparse (BM25) and a
  * dense (vector) ranking is the standard serving shape of a modern
  * retrieval stack, and reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009 — public result) is the fusion rule that
  * needs no score calibration between the lists: only RANKS enter,
  * score(d) = Σ_lists 1/(k0 + rank_list(d)), ids absent from a list
  * contribute nothing.
  *
  * Portability: ranks are integers from each list's own total order;
  * each reciprocal is one IEEE divide of identical integers, and the
  * fusion sum is a FIXED left-to-right expression tree over the
  * per-list columns of one full-outer join (never a shuffle-order
  * aggregate), so the fused scores are bit-identical in any engine
  * that restates the same expression.
  *
  * Scale: inputs are top-k serving outputs — bounded by construction
  * (tens to thousands of rows); the rank window and the join cost
  * nothing. This is a SERVING-side operator, not a corpus-side one.
  */
object Retrieval {

  /** Attach 1-based ranks to a bounded result list under a TOTAL order
    * (pass a unique tiebreaker — a non-total order would make the rank,
    * and therefore the fusion, nondeterministic). Unpartitioned window
    * on purpose: the input is a top-k list, not a corpus.
    */
  def rankOf(df: DataFrame, idCol: String, order: Seq[Column]): DataFrame =
    df.select(col(idCol).as("id"),
      row_number().over(Window.orderBy(order: _*)).as("rank"))

  /** Fuse ranked lists (each `(id, rank)`, from [[rankOf]]) by RRF and
    * return the top `topK` as (id, rrf) under the portable total order
    * (1e-9-rounded score desc, id asc). `k0` damps the head of each
    * list (60 is the paper's constant).
    */
  def rrfFuse(ranked: Seq[DataFrame], k0: Int = 60, topK: Int): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k0 >= 1, s"rrfFuse needs k0 >= 1, got $k0")
    val named = ranked.zipWithIndex.map { case (df, i) =>
      df.select(col("id"), col("rank").as(s"__r$i"))
    }
    val joined = named.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = ranked.indices
      .map(i => coalesce(lit(1.0) / (lit(k0.toLong) + col(s"__r$i")),
        lit(0.0)))
      .reduce(_ + _)
    joined.select(col("id"), round(score, 9).as("rrf"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topK)
  }
}
