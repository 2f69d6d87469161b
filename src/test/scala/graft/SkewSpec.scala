package graft

import graft.operators.Skew
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private def facts = df("k STRING, v BIGINT",
    Row("hot", Long.box(1)), Row("hot", Long.box(2)), Row("hot", Long.box(3)),
    Row("cold", Long.box(4)), Row(null, Long.box(5)))

  private def dim = df("k STRING, label STRING",
    Row("hot", "H"), Row("cold", "C"))

  test("saltedJoin preserves inner-join semantics under salting") {
    val plain = facts.filter(col("k").isNotNull).join(dim, Seq("k"), "inner")
    val salted = Skew.saltedJoin(facts, dim, "k", salts = 7, joinType = "inner")
    assert(rowSet(salted.select("k", "v", "label")) ==
      rowSet(plain.select("k", "v", "label")))
  }

  test("saltedJoin left keeps unmatched and null-key rows exactly once") {
    val out = Skew.saltedJoin(facts, dim, "k", salts = 5, joinType = "left")
    assert(out.count() == 5)
    assert(out.filter(col("v") === 5).head().isNullAt(2)) // null key row kept
  }

  test("nullSafeLeftJoin routes null keys around the shuffle, same result") {
    val plain = facts.join(dim, Seq("k"), "left")
    val routed = Skew.nullSafeLeftJoin(facts, dim, "k")
    assert(rowSet(routed) == rowSet(plain))
  }
}
