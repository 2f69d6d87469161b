package graft

import graft.operators.TableDiff
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {

  private def snap(rows: (Long, String, java.lang.Double)*) =
    df("k BIGINT, name STRING, bal DOUBLE",
      rows.map(r => Row(Long.box(r._1), r._2, r._3)): _*)

  test("diff emits exactly I/U/D with per-row changed columns") {
    val before = snap((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", null), (5L, "e", 50.0))
    val after = snap((1L, "a", 10.0),        // unchanged → absent
      (2L, "B", 20.0),                       // name changed
      (3L, "c", 31.0),                       // bal changed
      (4L, "D", 40.0),                       // both changed (null → value)
      (6L, "f", 60.0))                       // insert; 5 deleted
    val got = TableDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getSeq[String](2).toList))).toMap
    assert(got == Map(
      2L -> (("update", List("name"))),
      3L -> (("update", List("bal"))),
      4L -> (("update", List("bal", "name"))),
      5L -> (("delete", Nil)),
      6L -> (("insert", Nil))), got.toString)
    // Old/new value columns carry both sides for updates.
    val r3 = TableDiff.diff(before, after, Seq("k"))
      .filter(col("k") === 3).head()
    assert(r3.getAs[Double]("old_bal") == 30.0 &&
      r3.getAs[Double]("new_bal") == 31.0)
  }

  test("null == null is unchanged; value → null is a change") {
    val before = snap((1L, "a", null), (2L, "b", 2.0))
    val after = snap((1L, "a", null), (2L, "b", null))
    val got = TableDiff.diff(before, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](2).toList).toMap
    assert(got == Map(2L -> List("bal")), got.toString)
  }

  test("compareCols defaults to shared non-key columns; extras ignored") {
    val before = snap((1L, "a", 1.0)).withColumn("only_old", lit(9))
    val after = snap((1L, "a", 1.0)).withColumn("only_new", lit(7))
    // The one-sided columns must not read as changes.
    assert(TableDiff.diff(before, after, Seq("k")).count() == 0)
    // Explicit compareCols referencing a missing column fails loudly.
    intercept[Exception] {
      TableDiff.diff(before, after, Seq("k"),
        compareCols = Seq("only_old")).collect()
    }
  }

  test("diff → apply round-trip: applying the changelog rebuilds `after`") {
    val before = snap((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    val after = snap((2L, "b2", 21.0), (3L, "c", 30.0), (4L, "d", 40.0))
    val d = TableDiff.diff(before, after, Seq("k"))
    val deletes = d.filter(col("op") === "delete").select("k")
    val upserts = d.filter(col("op") =!= "delete")
      .select(col("k"), col("new_name").as("name"), col("new_bal").as("bal"))
    val rebuilt = before.join(deletes, Seq("k"), "left_anti")
      .join(upserts.select("k"), Seq("k"), "left_anti")
      .unionByName(upserts)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = after.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rebuilt == want, s"round-trip diverged:\n$rebuilt\n$want")
  }
}
