package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: dense calendar spines for sparse
  * per-period aggregates, and forward fill over the gaps — the
  * resample step every metric/feature pipeline runs before modeling
  * (a day with no events must be an explicit zero/carry row, not a
  * missing row, or downstream windows silently skip it).
  *
  * Scale: the spine is keys × days — generated, not shuffled: the
  * global [min, max] day bound is ONE 1-row aggregate broadcast into
  * a per-key `sequence()` explode (never a row-per-day driver loop),
  * and the fill join is a left join keyed on (key, day) whose right
  * side is the already-aggregated daily table. Forward fill is one
  * window pass per key ordered by day — day cardinality per key is
  * bounded by the calendar, so the window partition can never be
  * data-sized.
  */
object Resample {

  /** Dense (key, day) spine covering every key in `keys` crossed with
    * every day in the GLOBAL [min(dayCol), max(dayCol)] range of `df`.
    * Empty input yields an empty spine (no null-bound sequence).
    */
  def calendarSpine(df: DataFrame, keys: Seq[String], dayCol: String)
      : DataFrame = {
    val bounds = df.agg(min(col(dayCol)).as("__mn"), max(col(dayCol)).as("__mx"))
    df.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("__mn").isNotNull)
      .select(keys.map(col) :+
        explode(sequence(col("__mn"), col("__mx"), expr("interval 1 day")))
          .as(dayCol): _*)
  }

  /** Carry the last non-null value of each column in `fillCols`
    * forward along `order` within each `keys` partition (nulls before
    * the first observation stay null).
    */
  def forwardFill(df: DataFrame, keys: Seq[String], order: Seq[Column],
      fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }
}
