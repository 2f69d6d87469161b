package graft

import graft.operators.Graph
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def edgeDf(pairs: (Long, Long)*) =
    df("a BIGINT, b BIGINT",
      pairs.map(p => Row(Long.box(p._1), Long.box(p._2))): _*)

  test("canonicalEdges: dedups, orients a<b, drops loops and nulls") {
    val raw = df("a BIGINT, b BIGINT",
      Row(Long.box(2), Long.box(1)), Row(Long.box(1), Long.box(2)),
      Row(Long.box(3), Long.box(3)), Row(null, Long.box(4)),
      Row(Long.box(4), Long.box(5)))
    val got = Graph.canonicalEdges(raw, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("triangleCounts: K4, square, pendant — matches brute force") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every vertex in 3.
    // Square {5,6,7,8} (no diagonal): zero triangles.
    // Pendant 9 hanging off 1: zero triangles.
    val edges = edgeDf(
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (5, 6), (6, 7), (7, 8), (5, 8),
      (1, 9))
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got.toString)
    // Brute-force differential on a denser random-ish graph (fixed
    // construction): all i<j with (i*7+j*13) % 3 == 0 over 12 vertices.
    val dense = edgeDf((for {
      i <- 1L to 12L; j <- (i + 1) to 12L if (i * 7 + j * 13) % 3 == 0
    } yield (i, j)): _*)
    val es = dense.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def adj(x: Long, y: Long) = es((x min y, x max y))
    val want = (for {
      x <- 1L to 12L; y <- (x + 1) to 12L; z <- (y + 1) to 12L
      if adj(x, y) && adj(y, z) && adj(x, z)
    } yield Seq(x, y, z)).flatten
      .groupBy(identity).map { case (v, l) => v -> l.size.toLong }
    val gotDense = Graph.triangleCounts(dense)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDense == want, s"dense graph diverged:\n$gotDense\n$want")
  }

  test("triangleCounts: hub star has none; orientation bounds hub fan-out") {
    // Star: hub 1 with 40 leaves — the skew case. Degree orientation
    // points every edge INTO the hub, so the hub generates zero wedges.
    val star = edgeDf((2L to 41L).map(l => (1L, l)): _*)
    assert(Graph.triangleCounts(star).count() == 0)
  }

  test("labelPropagation: two cliques + bridge, matches reference rounds") {
    // Clique A {1,2,3}, clique B {10,11,12}, bridge 3-10.
    val edges = edgeDf((1, 2), (1, 3), (2, 3), (10, 11), (10, 12),
      (11, 12), (3, 10))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    // Plain-Scala reference of the same deterministic sync rule.
    val nbrs = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (v, l) => v -> l.map(_._2) }
    def round(lab: Map[Long, Long]): Map[Long, Long] =
      nbrs.map { case (v, ns) =>
        val counts = ns.groupBy(lab).map { case (l, g) => l -> g.size }
        v -> counts.toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      }
    var ref = nbrs.keys.map(v => v -> v).toMap
    (1 to 2).foreach(_ => ref = round(ref))
    val got = Graph.labelPropagation(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, s"LPA diverged from reference:\n$got\n$ref")
    // Clique A keeps its own labels; with min-label tie-breaks the
    // bridge legitimately leaks A's labels into B (10 sees {3,11,12},
    // all count 1, min is 3) — so only assert the A side.
    assert(Set(1L, 2L, 3L).map(got).subsetOf(Set(1L, 2L, 3L)))
    // Determinism under layout changes.
    val again = Graph.labelPropagation(edges.repartition(5), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }
}
