package graft.operators

import graft.functions.ColumnLib.freeColumn
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scale-out sequence packing (the pre-training "lay docs end-to-end,
  * cut at a token budget" recipe — reference semantics in
  * graft.queries.TextOps q44).
  *
  * The single-window formulation partitions by group only: a corpus
  * with FEW huge groups serializes each group through one task, and the
  * cumulative offset cannot simply be salted (it would restart per salt
  * bucket). This operator is the two-pass fix promised in q44's notes:
  *
  *  1. bucket each row by an equi-width slice of its ORDER-key domain
  *     (monotone in the order key, so bucket-local prefix sums compose
  *     into the global one — a hash bucket would not compose);
  *  2. aggregate per-(group, bucket) token totals — a tiny relation,
  *     bounded by groups x buckets — prefix-sum it on the driver, and
  *     broadcast the resulting base offsets back;
  *  3. run the cumulative window per (group, bucket) and add the base:
  *     parallelism is groups x buckets, each window sees ~1/buckets of
  *     its group.
  *
  * Three column-pruned passes over the input: the per-group order-key
  * min/max (reads two columns; the bucketing needs it before any total
  * can be formed), the totals pass, and the output pass. The driver
  * materialization is the per-(group, bucket) TOTALS — a bounded
  * summary, never row data (same posture as the IVF centroid ranking).
  * Group keys may be NULL (the joins are null-safe, matching the
  * window formulation where a NULL group is its own partition); the
  * order key must be numeric, non-null, and unique per group (the same
  * total-order contract as the window formulation). NULL token counts
  * contribute zero in BOTH passes, so `end_offset` is never NULL —
  * this is deliberately TIGHTER than a plain window SUM, which returns
  * NULL over an all-NULL prefix; callers that need SQL-NULL window
  * semantics for NULL token counts should use the window form.
  */
object Packing {

  def packTwoPass(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, nBuckets: Int): DataFrame =
    packTwoPass(df, Seq(groupCol), orderCol, tokensCol, nBuckets)

  /** Multi-column grouping variant: the pack group is the tuple of
    * `groupCols` (e.g. (source, split) in the composed corpus build —
    * packs never span either). Same contract as the single-column
    * overload; the group tuple is matched null-safely throughout.
    */
  def packTwoPass(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "need at least one bucket")
    require(groupCols.nonEmpty, "need at least one group column")
    val spark = df.sparkSession
    val (loC, hiC, bkC, baseC) = (freeColumn(df, "__lo"),
      freeColumn(df, "__hi"), freeColumn(df, "__bucket"),
      freeColumn(df, "__base"))
    // Distinct bases yield distinct generated names, so the aliases
    // cannot collide with the input OR each other.
    val gCs = groupCols.indices.map(i => freeColumn(df, s"__g$i"))
    val nG = groupCols.length
    // Unresolved on purpose: binds groupCols against the left frame
    // and the gCs aliases against the (renamed) right frame at each
    // join site.
    val groupMatch: Column =
      groupCols.zip(gCs).map { case (g, a) => col(g) <=> col(a) }
        .reduce(_ && _)
    val mm = df.groupBy(groupCols.map(col): _*)
      .agg(min(col(orderCol)).cast(LongType).as(loC),
        max(col(orderCol)).cast(LongType).as(hiC))
      .select(groupCols.zip(gCs).map { case (g, a) => col(g).as(a) } ++
        Seq(col(loC), col(hiC)): _*)
    // Bucket width is computed by DIVISION, not ((key-lo)*buckets) DIV
    // range: the multiplication form overflows Long for key ranges
    // wider than MaxValue/buckets and wraps into NON-monotone buckets
    // silently. width >= 1 and (hi-lo)/width < nBuckets by
    // construction, so buckets stay monotone in the order key for any
    // Long range. Identifiers are backtick-quoted: an order column
    // named with spaces/dots/keywords must parse as the column, not as
    // SQL syntax (the generated names are identifier-safe regardless).
    val bucketed = df
      .join(broadcast(mm), groupMatch)
      .withColumn(bkC,
        expr(s"CAST(((`$orderCol` - `$loC`) DIV " +
          s"((`$hiC` - `$loC`) DIV $nBuckets + 1)) AS INT)"))
      .drop(gCs: _*)
    val totals = bucketed
      .groupBy(groupCols.map(col) :+ col(bkC): _*)
      .agg(sum(coalesce(col(tokensCol), lit(0L))).cast(LongType).as("__t"))
      .collect()
    val baseRows = totals
      .groupBy(r => (0 until nG).map(i => r.get(i)).toIndexedSeq)
      .toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_.getInt(nG))
        sorted.zip(sorted.scanLeft(0L)(_ + _.getLong(nG + 1)).init)
          .map { case (r, base) =>
            // Seq[Any], NOT Seq(...): an untyped Seq(Int, Long) lets
            // the compiler numeric-widen the bucket to Long, which the
            // int-typed LocalRelation schema then misreads at eval.
            Row.fromSeq((0 until nG).map(r.get) ++
              Seq[Any](r.getInt(nG), base)) }
      }
    val totalsSchema = StructType(
      groupCols.zip(gCs).map { case (g, a) =>
        bucketed.schema(g).copy(name = a) } ++
      Seq(bucketed.schema(bkC),
        StructField(baseC, LongType, nullable = false)))
    val baseDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(baseRows).asJava), totalsSchema)
    val w = Window.partitionBy(groupCols.map(col) :+ col(bkC): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(baseDf),
        groupMatch && bucketed(bkC) === baseDf(bkC))
      .drop(baseDf(bkC)).drop(gCs: _*)
      // coalesce mirrors the totals pass: a bucket-local all-NULL
      // prefix must yield 0 + base, not NULL + base = NULL — the
      // bucket cut may not change which rows have defined offsets.
      .withColumn("end_offset",
        sum(coalesce(col(tokensCol), lit(0L))).over(w) + col(baseC))
      .drop(bkC, loC, hiC, baseC)
  }

  /** Context-window slicing: the "concat and chunk" step that follows
    * packing in a pre-training pipeline. Documents are laid end-to-end
    * per group (offsets from [[packTwoPass]], so no group ever
    * serializes through one task) and the token stream is cut into
    * fixed `cap`-token windows; each document maps to the CLOSED span
    * of window ids its tokens land in:
    *
    *   first_window = start_offset DIV cap
    *   last_window  = (end_offset - 1) DIV cap
    *
    * A doc with last_window > first_window crosses a window boundary —
    * the fraction of such docs (and of windows containing a boundary)
    * is the attention-contamination statistic a packing config is
    * judged by. Zero-token rows are excluded (they occupy no window;
    * keeping them would need a degenerate empty span).
    *
    * Output: the input columns plus start_offset / end_offset /
    * first_window / last_window. Entirely map-side on top of the
    * packed frame — the span arithmetic adds no shuffle, so the scale
    * posture is exactly [[packTwoPass]]'s.
    */
  def windowSpans(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, cap: Long, nBuckets: Int): DataFrame = {
    require(cap > 0, "need a positive window capacity")
    val taken = Seq("start_offset", "end_offset", "first_window",
      "last_window").filter(df.columns.contains)
    require(taken.isEmpty,
      s"input already has ${taken.mkString(", ")}; rename first")
    val t = coalesce(col(tokensCol).cast(LongType), lit(0L))
    packTwoPass(df, groupCols, orderCol, tokensCol, nBuckets)
      .filter(t > 0)
      .withColumn("start_offset", col("end_offset") - t)
      .withColumn("first_window", floor(col("start_offset") / cap))
      .withColumn("last_window", floor((col("end_offset") - 1) / cap))
  }

  /** Per-window occupancy stats over [[windowSpans]]: explode each doc
    * span into its window ids (bounded fan-out: ceil(tokens/cap)+1 rows
    * per doc) and aggregate per (group, window):
    *
    *   n_docs     docs with ≥1 token in the window
    *   n_starts   docs whose first token is in the window
    *   win_tokens tokens of the window occupied (= cap except a
    *              group's last window — the padding-waste number)
    *   n_crossing docs continuing into the NEXT window
    *
    * The group-by keys (group, window id) are fine-grained and evenly
    * sized by construction — capacity bounds every window's token
    * count — so the aggregation has no skew at any corpus size.
    */
  def windowStats(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, cap: Long, nBuckets: Int): DataFrame = {
    val statNames = Seq("win", "n_docs", "n_starts", "win_tokens",
      "n_crossing")
    val clash = groupCols.filter(statNames.contains)
    require(clash.isEmpty,
      s"group columns collide with stat outputs: ${clash.mkString(", ")}")
    val spans = windowSpans(df, groupCols, orderCol, tokensCol, cap, nBuckets)
    val winC = freeColumn(df, "win")
    spans
      .withColumn(winC,
        explode(sequence(col("first_window"), col("last_window"))))
      .groupBy(groupCols.map(col) :+ col(winC).as("win"): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("first_window") === col(winC)).as("n_starts"),
        sum(least(col("end_offset"), (col(winC) + 1) * cap) -
          greatest(col("start_offset"), col(winC) * cap)).as("win_tokens"),
        count_if(col("last_window") > col(winC)).as("n_crossing"))
  }
}
