package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Maximal Marginal Relevance diversification (Carbonell & Goldstein,
    * SIGIR'98 — public result): greedily re-rank a bounded candidate
    * list so each pick balances relevance against redundancy with what
    * is already picked, mmr(d) = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)
    * (empty-S max = 0, so pick 1 is the pure-relevance argmax scaled
    * by λ). The serving-side dedup: a near-dup cluster in the top-k
    * contributes ONE result instead of k copies.
    *
    * Inputs are SERVING-SIZED by contract — `cands` is a top-k list
    * (id, rel) and `sims` its pairwise similarities (a, b, sim; both
    * orientations or symmetric duplicates are fine, missing pairs
    * count as 0 similarity) — and the guard refuses a corpus-sized
    * list rather than running a greedy quadratic loop over it. Each
    * step is one tiny Spark job. The returned `mmr` is the RAW double
    * — every input is a shared-grid value, so the score is
    * bit-identical across engines and the argmax needs no rounding
    * (ties break by id ascending); callers snap it for display
    * (floored micro units, the repo's fixed-point convention) rather
    * than re-rounding, because round() edge behavior differs between
    * engines on near-half values.
    */
  /** Pseudo-relevance-feedback term expansion (the RM3-lite recipe,
    * public result): assume the first pass's top documents are
    * relevant, mine their most frequent terms, and append them to the
    * query for a second pass. Selection is deterministic — top
    * `nExpand` tokens by (total tf across the feedback docs DESC,
    * token ASC), original query terms excluded — so an independent
    * engine restates it exactly. The corpus scan is semi-joined to
    * the (bounded) feedback doc ids BEFORE the token explode; the
    * returned list is driver-side by design (a query is driver
    * state, exactly like the term list the caller already holds).
    */
  def prfExpandTerms(corpus: DataFrame, idCol: String, textCol: String,
      topDocs: DataFrame, exclude: Seq[String], nExpand: Int)
      : Seq[String] = {
    require(nExpand >= 1, s"prfExpandTerms needs nExpand >= 1, got $nExpand")
    corpus.join(topDocs.select(col(topDocs.columns.head).as(idCol)),
        Seq(idCol), "left_semi")
      .select(explode(graft.functions.TextFunctions.words(col(textCol)))
        .as("token"))
      .filter(!col("token").isin(exclude: _*))
      .groupBy("token").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("token").asc)
      .limit(nExpand)
      .collect().map(_.getString(0)).toSeq
  }

  def mmrDiversify(cands: DataFrame, sims: DataFrame, lambda: Double,
      k: Int, maxCandidates: Int = 4096): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmr lambda must be in [0,1], got $lambda")
    require(k >= 1, s"mmr needs k >= 1, got $k")
    val c = cands.select(col("id"), col("rel").cast("double").as("rel"))
      .localCheckpoint(true) // read once per greedy step
    val n = c.count()
    require(n <= maxCandidates,
      s"mmrDiversify: $n candidates exceeds maxCandidates=$maxCandidates " +
        "— this is a serving-list operator, not a corpus one")
    val sm = sims.select(col("a"), col("b"), col("sim").cast("double")
        .as("sim"))
      .localCheckpoint(true) // read once per greedy step
    val picks = scala.collection.mutable.ArrayBuffer[Row]()
    var selected = Seq.empty[Any]
    var step = 1
    while (step <= math.min(k, n)) {
      val remaining = c.filter(!col("id").isin(selected: _*))
      val scored =
        if (selected.isEmpty)
          remaining.select(col("id"),
            (lit(lambda) * col("rel")).as("mmr"))
        else {
          val maxSim = sm.filter(col("b").isin(selected: _*))
            .groupBy(col("a").as("id"))
            .agg(max(col("sim")).as("__ms"))
          remaining.join(maxSim, Seq("id"), "left")
            .select(col("id"),
              (lit(lambda) * col("rel") -
                lit(1.0 - lambda) * coalesce(col("__ms"), lit(0.0)))
                .as("mmr"))
        }
      val best = scored.orderBy(col("mmr").desc, col("id").asc).head()
      picks += Row(step, best.get(0), best.getDouble(1))
      selected = selected :+ best.get(0)
      step += 1
    }
    val idType = c.schema("id").dataType
    cands.sparkSession.createDataFrame(
      java.util.List.of(picks.toSeq: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pick",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("mmr",
          org.apache.spark.sql.types.DoubleType))))
  }
}
