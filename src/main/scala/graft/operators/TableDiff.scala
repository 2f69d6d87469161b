package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: derive the CDC changelog two table versions imply —
  * the INVERSE of the apply direction the engine already has
  * ([[Upsert]] applies a batch; q151's CDC apply folds an I/U/D
  * stream). Given `before` and `after` keyed by `keys`, emit one row
  * per differing key with `op` ∈ {insert, delete, update} and, for
  * updates, the sorted list of changed column names. The audit/debug
  * primitive of every pipeline migration: "what did this rewrite
  * actually change?" — and the generator for incremental downstream
  * refresh (ship the diff, not the snapshot).
  *
  * Scale: one full-outer shuffle join on the key columns — the minimum
  * possible; column comparison is pure codegen'd expression work
  * (null-safe `<=>` per column, no per-row loops, no UDFs). Unchanged
  * rows are dropped BEFORE any downstream exchange. Schemas must
  * match on the compared columns; compared columns default to every
  * non-key column the two sides share, so schema evolution (a column
  * only one side has) is ignored rather than mis-read — pass
  * `compareCols` explicitly to fail instead.
  */
object TableDiff {

  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else before.columns.filterNot(keys.contains)
        .filter(after.columns.contains).toSeq
    val b = before.select((keys ++ cmp).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select((keys ++ cmp).map(c =>
        col(c).as(s"__a_$c")) :+ lit(1).as("__a"): _*)
    val joined = b.join(a,
      keys.map(k => col(k) <=> col(s"__a_$k")).reduce(_ && _), "full_outer")
    val changed = array_sort(filter(
      array(cmp.map(c =>
        when(!(col(c) <=> col(s"__a_$c")), lit(c))): _*),
      x => x.isNotNull))
    val op = when(col("__b").isNull, lit("insert"))
      .when(col("__a").isNull, lit("delete"))
      .when(size(changed) > 0, lit("update"))
    // changed_cols only means something for updates: an insert/delete
    // "changes" every column trivially, which would read as noise.
    val changedOut = when(op === "update", changed)
      .otherwise(array().cast("array<string>"))
    joined
      .select(keys.map(k => coalesce(col(s"__a_$k"), col(k)).as(k)) ++
        Seq(op.as("op"), changedOut.as("changed_cols")) ++
        cmp.flatMap(c => Seq(col(c).as(s"old_$c"),
          col(s"__a_$c").as(s"new_$c"))): _*)
      .filter(col("op").isNotNull)
  }
}
