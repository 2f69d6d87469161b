package graft

import graft.operators.Resample
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("calendarSpine: keys × global [min,max] days; empty input → empty") {
    val obs = df("k STRING, day DATE",
      Row("a", d("2024-01-02")), Row("a", d("2024-01-05")),
      Row("b", d("2024-01-03")))
    val spine = Resample.calendarSpine(obs, Seq("k"), "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    val days = (2 to 5).map(i => f"2024-01-$i%02d")
    assert(spine == (for (k <- Seq("a", "b"); dd <- days) yield (k, dd)).toSet,
      spine.toString)
    assert(Resample.calendarSpine(obs.limit(0), Seq("k"), "day").count() == 0)
  }

  test("forwardFill carries last non-null per key; leading nulls stay null") {
    val sparse = df("k STRING, day DATE, v DOUBLE",
      Row("a", d("2024-01-01"), null),
      Row("a", d("2024-01-02"), Double.box(2.0)),
      Row("a", d("2024-01-03"), null),
      Row("a", d("2024-01-04"), Double.box(4.0)),
      Row("b", d("2024-01-01"), null))
    val got = Resample.forwardFill(sparse, Seq("k"), Seq(col("day").asc),
        Seq("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(got(("a", "2024-01-01")).isEmpty)
    assert(got(("a", "2024-01-02")).contains(2.0))
    assert(got(("a", "2024-01-03")).contains(2.0), "gap carries previous")
    assert(got(("a", "2024-01-04")).contains(4.0))
    assert(got(("b", "2024-01-01")).isEmpty, "fill never crosses keys")
  }

  test("spine + left join + fill: no-event days exist as zero rows") {
    val obs = df("k STRING, day DATE, n BIGINT",
      Row("a", d("2024-01-01"), Long.box(3)),
      Row("a", d("2024-01-04"), Long.box(7)))
    val spine = Resample.calendarSpine(obs, Seq("k"), "day")
    val filled = spine.join(obs, Seq("k", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    assert(filled == Map("2024-01-01" -> 3L, "2024-01-02" -> 0L,
      "2024-01-03" -> 0L, "2024-01-04" -> 7L))
  }
}
