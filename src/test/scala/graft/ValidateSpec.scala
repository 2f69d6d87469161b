package graft

import graft.operators.Validate
import org.apache.spark.sql.Row

class ValidateSpec extends SparkSpec {

  // QI groups: (A, x) -> 4 rows, (A, y) -> 2, (B, x) -> 1.
  private def people = df("region STRING, seg STRING, disease STRING",
    Row("A", "x", "flu"), Row("A", "x", "flu"),
    Row("A", "x", "cold"), Row("A", "x", "flu"),
    Row("A", "y", "flu"), Row("A", "y", "cold"),
    Row("B", "x", "covid"))

  test("kAnonymity: per-k risk counts and the global level") {
    val got = Validate.kAnonymity(people, Seq("region", "seg"), Seq(2, 3, 5))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // min group = 1 → k_anonymity 1; below k=2: {B,x}(1 row);
    // below k=3: {B,x} + {A,y} (3 rows); below k=5: all 3 groups.
    assert(got == Map(
      2 -> ((1L, 1L, 1L, false)),
      3 -> ((2L, 3L, 1L, false)),
      5 -> ((3L, 7L, 1L, false))), got.toString)
    // Dropping the singleton group makes k=2 pass.
    val ok = Validate.kAnonymity(
        people.filter(org.apache.spark.sql.functions.col("region") =!= "B"),
        Seq("region", "seg"), Seq(2))
      .head()
    assert(ok.getLong(3) == 2L && ok.getBoolean(4))
  }

  test("lDiversity: homogeneous groups flagged even when k passes") {
    // (A,x): 4 rows but 2 diseases; (A,y): 2 rows, 2 diseases;
    // (B,x): 1 row, 1 disease → l_diversity = 1.
    val got = Validate.lDiversity(people, Seq("region", "seg"), "disease",
        Seq(2, 3))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      2 -> ((1L, 1L, 1L, false)),
      3 -> ((3L, 7L, 1L, false))), got.toString)
  }

  test("kAnonymity refuses meaningless k") {
    intercept[IllegalArgumentException] {
      Validate.kAnonymity(people, Seq("region"), Seq(1))
    }
  }
}
