package graft

import graft.operators.{Dedup, Rendezvous}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the two properties q127/q128 are built on: rendezvous hashing's
  * resize stability (the reason to use HRW over `hash % n` at all) and
  * containment's asymmetry (the reason it exists next to Jaccard).
  */
class RendezvousSpec extends SparkSpec {

  private def keys = spark.range(0, 2000).toDF("k")

  test("HRW shard lands in [0, n) and is deterministic") {
    val out = keys.select(Rendezvous.shard(col("k"), 5).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.map(_._1).toSet.subsetOf((0L until 5L).toSet))
    // every shard gets a non-trivial share of 2000 uniform keys
    assert(out.size == 5 && out.forall(_._2 > 200))
    val again = keys.select(Rendezvous.shard(col("k"), 5).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toMap == again.toMap)
  }

  test("HRW resize n -> n+1 moves keys ONLY onto the new shard") {
    // The defining invariant: a key relocates iff the NEW shard wins its
    // score race, so every mover lands on shard n — nothing reshuffles
    // between old shards (hash%n would scramble ~n-1/n of them).
    val moved = keys.select(
        Rendezvous.shard(col("k"), 5).as("s5"),
        Rendezvous.shard(col("k"), 6).as("s6"))
      .filter(col("s5") =!= col("s6"))
    val dest = moved.select("s6").distinct().collect().map(_.getLong(0)).toSet
    assert(dest == Set(5L), s"movers must all land on the new shard, got $dest")
    // and the moved fraction is ~1/6 of the keys, not ~5/6
    val frac = moved.count().toDouble / 2000
    assert(frac > 0.08 && frac < 0.26, s"moved fraction $frac far from 1/6")
  }

  test("salt namespaces independent assignments") {
    val diff = keys.select(
        Rendezvous.shard(col("k"), 8).as("a"),
        Rendezvous.shard(col("k"), 8, salt = "other").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff > 1000, "different salts must decorrelate assignments")
  }

  test("containment flags a sub-document duplicate Jaccard under-scores") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = ("w" + (1 to 60).mkString(" w")) + " " + small +
      " " + ("x" + (1 to 60).mkString(" x"))
    val d = df("doc_id BIGINT, text STRING",
      Row(Long.box(1L), small), Row(Long.box(2L), big))
    val out = Dedup.ngramContainmentPairs(d, "doc_id", "text", n = 3)
      .collect()
    assert(out.length == 1)
    val r = out.head
    val (contSmall, jaccardish) =
      (r.getAs[Double]("cont_12"),
        r.getAs[Long]("n_inter").toDouble /
          (r.getAs[Long]("sz1") + r.getAs[Long]("sz2") -
            r.getAs[Long]("n_inter")))
    assert(contSmall == 1.0, "small doc fully contained -> containment 1.0")
    assert(jaccardish < 0.1, "Jaccard stays tiny on the same pair")
  }
}
