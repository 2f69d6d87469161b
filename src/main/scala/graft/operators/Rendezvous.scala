package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — the stable assignment
  * scheme a 100 TB corpus wants for routing documents to a FIXED set of
  * downstream consumers (tokenizer shards, index segments, annotation
  * pools): each key independently scores every shard with a keyed hash
  * and lands on the argmax. Unlike `hash(key) % n`, resizing n → n+1
  * reassigns only ~1/(n+1) of the keys (exactly the keys whose new
  * shard wins the score race), so adding capacity doesn't re-shuffle
  * the corpus — the property q127 gates by computing the 8-shard and
  * 9-shard assignments side by side and counting movers.
  *
  * Pure column arithmetic: n md5 scores + an array_max over
  * (score, shard) structs, fully inside whole-stage codegen — no
  * shuffle, no UDF, no driver state. Struct ordering compares score
  * first, shard second, so ties (md5 collisions, i.e. never) would
  * break deterministically toward the HIGHER shard id — array_max of
  * equal-score structs picks the larger second field. md5 keeps the
  * score portable across engines (the oracle restates it in SQL);
  * swap in xxhash64 for pure-Spark deployments where hashing cost
  * matters more than portability.
  */
object Rendezvous {

  /** Shard id in [0, n) for `key` under highest-random-weight hashing.
    * `salt` namespaces independent assignments over the same keys.
    */
  def shard(key: Column, n: Int, salt: String = "hrw"): Column = {
    require(n >= 1 && n <= 4096, s"shard count out of range: $n")
    val scored = array((0 until n).map { s =>
      struct(
        md5(concat_ws(":", lit(salt), lit(s.toString), key.cast("string")))
          .as("score"),
        lit(s.toLong).as("shard"))
    }: _*)
    array_max(scored).getField("shard")
  }
}
