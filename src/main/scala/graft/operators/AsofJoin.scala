package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for every left row, attach the latest right row whose
  * time is <= the left row's time, per key — the canonical
  * point-in-time enrichment (trades↔quotes, events↔dimension history).
  *
  * Spark has no native as-of join. The naive formulations are
  * quadratic (theta-join on `r.ts <= l.ts` explodes) or
  * shuffle-per-candidate. This implementation uses the union-sort
  * trick, which is the 100 TB-safe shape:
  *
  *   1. tag both sides and union them (no join!),
  *   2. one window over (key) ordered by (ts, side) carries the most
  *      recent right-side values forward via last_value(ignoreNulls),
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle on the key + a sort within partitions — the same
  * price as a single sort-merge join, with no row multiplication, no
  * skew amplification (a hot key sorts locally), and linear memory.
  * `tolerance` optionally voids matches older than `tolerance` ms.
  */
object AsofJoin {

  /** @param left       fact side (kept in full — left outer semantics)
    * @param right      history side providing the as-of values
    * @param keys       equi-join key columns present on both sides
    * @param leftTime   event-time column on `left` (numeric or timestamp)
    * @param rightTime  effective-time column on `right`
    * @param valueCols  right columns to carry (default: all non-key,
    *                   non-time columns)
    * @param tolerance  max time distance in the time column's units
    *                   (inclusive); None = unbounded
    * @param direction  `backward` (latest right ≤ t, the default),
    *                   `forward` (earliest right ≥ t), or `nearest`
    *                   (closer of the two; exact tie → backward, the
    *                   pandas merge_asof convention). Forward/nearest
    *                   add a second within-partition sort (opposite
    *                   tie order), never a second shuffle — both
    *                   windows share the key partitioning.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String] = Nil,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction must be backward|forward|nearest, got '$direction'")
    val values =
      if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => keys.contains(c) || c == rightTime).toSeq
    val leftCols = left.columns.toSeq
    val collisions = values.toSet & leftCols.toSet
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")} " +
        "— rename them on the right side before the as-of join")

    // Right rows sort before left rows at the same instant (side 0 < 1)
    // so a right row effective AT the event time is visible to it.
    // A right row with NULL effective time has no position on the
    // timeline and can never be a meaningful as-of match — drop it
    // up front. (Unfiltered, NULLS FIRST ordering would let it ride
    // the unbounded backward window as the "latest" match whenever
    // tolerance is None, and skew the nearest tie logic; the filter
    // makes all three directions treat it identically: absent.)
    val taggedRight = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(col(rightTime).as("__ts"), lit(0).as("__side")) ++
        values.map(c => col(c).as(s"__v_$c")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // Fast path for the dominant call shape (backward, no tolerance):
    // the carried struct needs NO `__rts` field (nothing filters on
    // match age) and the post-window acceptance check collapses to
    // plain field extraction (a null struct extracts null fields), so
    // the window carries the minimal payload and the projection is
    // branch-free. Row semantics are identical to the general path —
    // the struct wrapper still carries the WHOLE most-recent right row,
    // nulls included (AsofSessionSpec pins both paths).
    if (direction == "backward" && tolerance.isEmpty) {
      val rowNoTs = when(col("__side") === 0,
        struct(values.map(c => col(s"__v_$c")): _*))
      val wBackOnly = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("__ts").asc, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return unioned
        .withColumn("__back", last(rowNoTs, ignoreNulls = true).over(wBackOnly))
        .filter(col("__side") === 1)
        .select(leftCols.map(col) ++ values.map(c =>
          col("__back").getField(s"__v_$c").as(c)): _*)
    }

    // Carry the matched right ROW as one struct (never per-column): the
    // match must be the whole most-recent right row even when some of
    // its value columns are null — per-column last_value(ignoreNulls)
    // would stitch values from DIFFERENT rows and leak data older than
    // the tolerance.
    val rightRow = when(col("__side") === 0,
      struct(col("__ts").as("__rts") +: values.map(c => col(s"__v_$c")): _*))

    // Backward: right rows sort BEFORE left rows at the same instant
    // (side 0 < 1) so a right row effective AT the event time is
    // visible in the trailing frame. Forward mirrors it: left first at
    // equal instants, leading frame.
    val wBack = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = direction match {
      case "backward" => unioned
        .withColumn("__back", last(rightRow, ignoreNulls = true).over(wBack))
      case "forward" => unioned
        .withColumn("__fwd", first(rightRow, ignoreNulls = true).over(wFwd))
      case "nearest" => unioned
        .withColumn("__back", last(rightRow, ignoreNulls = true).over(wBack))
        .withColumn("__fwd", first(rightRow, ignoreNulls = true).over(wFwd))
    }

    val lts = col("__ts").cast("long")
    def okBack(c: Column): Column = tolerance match {
      case Some(t) => c.isNotNull && (lts - c.getField("__rts").cast("long")) <= t
      case None => c.isNotNull
    }
    def okFwd(c: Column): Column = tolerance match {
      case Some(t) => c.isNotNull && (c.getField("__rts").cast("long") - lts) <= t
      case None => c.isNotNull
    }
    val chosen = direction match {
      case "backward" => when(okBack(col("__back")), col("__back"))
      case "forward" => when(okFwd(col("__fwd")), col("__fwd"))
      case "nearest" =>
        val distBack = lts - col("__back").getField("__rts").cast("long")
        val distFwd = col("__fwd").getField("__rts").cast("long") - lts
        val bOk = okBack(col("__back"))
        val fOk = okFwd(col("__fwd"))
        when(bOk && (!fOk || distBack <= distFwd), col("__back"))
          .when(fOk, col("__fwd"))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ values.map(c =>
        chosen.getField(s"__v_$c").as(c)): _*)
  }
}
