package graft

import graft.operators.Cascade
import graft.operators.Cascade.{Erased, Fk}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CascadeSpec extends SparkSpec {

  // Diamond FK graph: fact references BOTH dims, dims reference root.
  //   root(r) <- dima(a, r) ; root <- dimb(b, r) ; fact(f, a, b)
  private def root = df("r BIGINT",
    Row(Long.box(1)), Row(Long.box(2)), Row(Long.box(3)))
  private def dima = df("a BIGINT, r BIGINT",
    Row(Long.box(10), Long.box(1)), Row(Long.box(11), Long.box(2)),
    Row(Long.box(12), Long.box(3)))
  private def dimb = df("b BIGINT, r BIGINT",
    Row(Long.box(20), Long.box(2)), Row(Long.box(21), Long.box(3)))
  private def fact = df("f BIGINT, a BIGINT, b BIGINT",
    Row(Long.box(100), Long.box(10), Long.box(20)), // a-parent deleted
    Row(Long.box(101), Long.box(11), Long.box(20)), // BOTH parents deleted
    Row(Long.box(102), Long.box(12), Long.box(21))) // survives

  private val fks = Seq(
    Fk("dima", "r", "root", "r"), Fk("dimb", "r", "root", "r"),
    Fk("fact", "a", "dima", "a"), Fk("fact", "b", "dimb", "b"))

  private def tables = Map(
    "root" -> root, "dima" -> dima, "dimb" -> dimb, "fact" -> fact)

  test("deleteClosure: diamond closure, multi-parent child deleted once") {
    val seed = df("k BIGINT", Row(Long.box(1)), Row(Long.box(2)))
    val out = Cascade.deleteClosure(tables, fks, "root", "r", seed)
    assert(rowSet(out("root").deleted.select("r")) ==
      Set(Seq(1L), Seq(2L)))
    assert(rowSet(out("dima").deleted.select("a")) ==
      Set(Seq(10L), Seq(11L)))
    assert(rowSet(out("dimb").deleted.select("b")) == Set(Seq(20L)))
    // fact 101 matches through BOTH parents — must appear exactly once.
    assert(out("fact").deleted.count() == 2)
    assert(rowSet(out("fact").deleted.select("f")) ==
      Set(Seq(100L), Seq(101L)))
    assert(rowSet(out("fact").kept.select("f")) == Set(Seq(102L)))
    // kept + deleted partition each table.
    for ((n, Erased(kept, del)) <- out)
      assert(kept.count() + del.count() == tables(n).count(), n)
    // No orphans survive the cascade, on any edge.
    val orph = Cascade.orphanCounts(out, fks).collect()
    assert(orph.forall(_.getLong(1) == 0L), orph.mkString(","))
  }

  test("deleteClosure: untouched tables ride through; empty seed is no-op") {
    val seed = df("k BIGINT").limit(0)
    val out = Cascade.deleteClosure(tables, fks, "root", "r", seed)
    for ((n, e) <- out) {
      assert(e.deleted.count() == 0, n)
      assert(e.kept.count() == tables(n).count(), n)
    }
    // A table outside the reachable set passes through whole.
    val out2 = Cascade.deleteClosure(
      tables + ("island" -> df("i BIGINT", Row(Long.box(7)))), fks,
      "root", "r", df("k BIGINT", Row(Long.box(1))))
    assert(out2("island").kept.count() == 1 &&
      out2("island").deleted.count() == 0)
  }

  test("orphanCounts detects a broken edge when the cascade is skipped") {
    // Delete root rows WITHOUT cascading: children become orphans.
    val keptRoot = root.filter(col("r") =!= 1L)
    val broken = Map(
      "root" -> Erased(keptRoot, root.filter(col("r") === 1L)),
      "dima" -> Erased(dima, dima.limit(0)),
      "dimb" -> Erased(dimb, dimb.limit(0)),
      "fact" -> Erased(fact, fact.limit(0)))
    val orph = Cascade.orphanCounts(broken, fks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(orph("dima.r") == 1L) // dima(10,1) dangles
    assert(orph("dimb.r") == 0L)
  }

  test("guards: cyclic graph and self-FK refuse loudly") {
    val cyc = intercept[IllegalArgumentException] {
      Cascade.deleteClosure(tables,
        fks :+ Fk("root", "r", "fact", "f"), "root", "r",
        df("k BIGINT", Row(Long.box(1))))
    }
    assert(cyc.getMessage.contains("cycle"))
    val self = intercept[IllegalArgumentException] {
      Cascade.deleteClosure(tables,
        fks :+ Fk("dima", "r", "dima", "a"), "root", "r",
        df("k BIGINT", Row(Long.box(1))))
    }
    assert(self.getMessage.contains("self-referencing"))
  }
}
