package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.expressions.BloomMightContain

/** Semi-join reduction via a bloom runtime filter — the standard lever
  * for the 100 TB join where the dim side is too big to broadcast-join
  * but its KEY SET summarizes into a few MB.
  *
  * Shape: one pass over the dim keys builds the filter distributively
  * (`df.stat.bloomFilter` → per-partition sketches, treeAggregate
  * merge — no key list ever lands on the driver), the probe expression
  * rides down to the fact scan and drops non-joining rows BEFORE the
  * shuffle, then the equi-join runs on the surviving fraction. With a
  * selective dim, the shuffle shrinks by orders of magnitude; false
  * positives (rate `fpp`) pass the pre-filter and are removed by the
  * join itself, so results are exactly the plain join's.
  *
  * Only join types where dropping provably-unmatched FACT rows is
  * sound are accepted: `inner`, `left_semi`, and `right` (the fact is
  * the left/stream side in all three). An outer type that must keep
  * unmatched fact rows would change results — rejected loudly.
  */
object BloomJoin {

  private val sound = Set("inner", "left_semi", "leftsemi", "right",
    "right_outer", "rightouter")

  /** Build a bloom filter over `dim`'s join-key column. `expectedItems`
    * is a capacity hint (distinct keys); oversizing costs bits, not
    * correctness. One distributed aggregate, driver holds only the
    * merged bitmap.
    */
  def buildKeyFilter(dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    // `stat.bloomFilter` NPEs on an EMPTY input (no partition ever
    // serializes a filter, and readFrom gets null bytes — Spark 4.1).
    // An empty key set is a legitimate dim (over-selective predicate),
    // so pre-check with a limit-1 probe and hand back a fresh zero-bit
    // filter: mightContain is then false everywhere — exactly right,
    // the reduced join is as empty as the plain join.
    if (dim.isEmpty) BloomFilter.create(expectedItems, fpp)
    else dim.stat.bloomFilter(dimKey, expectedItems, fpp)

  /** Probe column: true/false = maybe/definitely-not in the key set;
    * null key → null (matches equi-join semantics under a filter).
    */
  def mightContain(bloom: BloomFilter, key: Column): Column =
    ColumnBridge.columnOf(BloomMightContain(ColumnBridge.exprOf(key), bloom))

  /** `fact ⋈ dim` with the fact side pre-reduced by a bloom over the
    * dim keys. Result is EXACTLY the plain join (the join clears the
    * filter's false positives); only the shuffled volume changes.
    *
    * EAGER at call time, unlike a plain DataFrame transform: building
    * the bloom runs two Spark jobs here and now (an `isEmpty` probe
    * plus the distributed `stat.bloomFilter` aggregate), and the
    * resulting bitmap is frozen into the returned plan. Consequences:
    * callers pay the dim scan at DEFINITION time, not first action,
    * and if the dim's underlying source mutates between this call and
    * execution the pre-filter reflects the OLD key set. Keys DELETED
    * after the build stay harmless (the stale bloom admits their fact
    * rows, the live join drops them), but keys ADDED after the build
    * are rejected BEFORE the join — their matches silently vanish from
    * a result the plain join would contain. Build the filter as close
    * to the action as the pipeline allows, and never reuse it across
    * a dim refresh.
    */
  def reduceJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, joinType: String = "inner",
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(sound.exists(_.replace("_", "") == jt),
      s"bloom reduction drops fact rows pre-join; unsound for '$joinType' " +
        "(allowed: inner, left_semi, right_outer)")
    val bloom = buildKeyFilter(dim, dimKey, expectedItems, fpp)
    fact.filter(mightContain(bloom, fact(factKey)))
      .join(dim, fact(factKey) === dim(dimKey), joinType)
  }

  // ---- portable persisted bloom (cross-job membership artifact) -------
  // [[buildKeyFilter]]'s bitmap lives on the driver inside one plan;
  // the PERSISTED variant below is a (word, bits) parquet table built
  // from md5 bit positions — a membership artifact one job writes and
  // later jobs (or another engine: every operation is md5 + integer
  // arithmetic, restatable exactly in SQL) probe without re-reading
  // the key corpus. The decontamination shape: ship the benchmark's
  // digest bloom, screen every future crawl against kilobytes.
  // Mergeable by `bit_or` over word; 32-bit words keep every mask
  // positive in signed 64-bit arithmetic in any engine.

  /** Bit positions of `key`: k md5-derived values in [0, mBits). */
  private def bloomBits(key: Column, mBits: Int, kHashes: Int,
      salt: String): Seq[Column] =
    (0 until kHashes).map { i =>
      pmod(conv(substring(md5(concat(lit(s"$salt:$i:"),
        key.cast("string"))), 1, 12), 16, 10).cast("long"), lit(mBits.toLong))
    }

  /** Build the (word, bits) cell table over `keys`' distinct values:
    * ≤ mBits/32 rows regardless of corpus size (broadcast-small for
    * any practical mBits). One distributed bit_or aggregate. Building
    * block — the persisted artifact face is [[bloomWrite]]/[[bloomProbe]],
    * which FREEZES the geometry; probing cells with different
    * (mBits, kHashes, salt) than the build silently yields FALSE
    * NEGATIVES, so only the spec-differential tier may hold the
    * parameters by hand.
    */
  private[graft] def bloomCells(keys: DataFrame, keyCol: String, mBits: Int,
      kHashes: Int, salt: String): DataFrame = {
    require(mBits >= 32 && kHashes >= 1,
      s"need mBits >= 32 and kHashes >= 1, got $mBits/$kHashes")
    keys.filter(col(keyCol).isNotNull)
      .select(explode(array(
        bloomBits(col(keyCol), mBits, kHashes, salt): _*)).as("__bit"))
      .select((col("__bit") / 32).cast("int").as("word"),
        call_function("shiftleft", lit(1L),
          pmod(col("__bit"), lit(32L)).cast("int")).as("__m"))
      .groupBy("word").agg(bit_or(col("__m")).as("bits"))
  }

  /** Membership probe against a cell table: one row per DISTINCT probe
    * key, `might_contain` true iff every one of its k bits is set.
    * The cells broadcast (≤ mBits/32 rows); grouping is per probe key
    * — never a pass over the corpus the bloom summarizes. No false
    * negatives, by construction; false positives at the usual
    * (1-e^(-kn/m))^k rate.
    */
  private[graft] def bloomMightContainPortable(cells: DataFrame,
      probes: DataFrame,
      keyCol: String, mBits: Int, kHashes: Int, salt: String): DataFrame = {
    val need = probes.filter(col(keyCol).isNotNull)
      .select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array(
        bloomBits(col(keyCol), mBits, kHashes, salt): _*)).as("__bit"))
      .select(col(keyCol), (col("__bit") / 32).cast("int").as("word"),
        call_function("shiftleft", lit(1L),
          pmod(col("__bit"), lit(32L)).cast("int")).as("__m"))
      .groupBy(col(keyCol), col("word"))
      .agg(bit_or(col("__m")).as("__need"))
    need.join(broadcast(cells), Seq("word"), "left")
      .groupBy(col(keyCol))
      .agg(bool_and(
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("__need"))) ===
          col("__need")).as("might_contain"))
  }

  private val bloomMetaSchema = "m_bits INT, k_hashes INT, salt STRING"

  /** Persist the bloom artifact: the cell table plus a 1-row `__meta`
    * sidecar FREEZING the geometry (mBits, kHashes, salt). The
    * artifact is a cross-job interface, so the geometry must travel
    * with it — a probe hashed with different parameters than the
    * build would silently yield false negatives, the one failure a
    * bloom must never have. Probing therefore reads the geometry from
    * the artifact itself ([[bloomProbe]]), never from parameters —
    * the same frozen-contract convention as every index ledger.
    */
  def bloomWrite(keys: DataFrame, keyCol: String, mBits: Int,
      kHashes: Int, salt: String, path: String): Unit = {
    val spark = keys.sparkSession
    bloomCells(keys, keyCol, mBits, kHashes, salt)
      .coalesce(1).write.mode("overwrite").parquet(path)
    spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          Int.box(mBits), Int.box(kHashes), salt)),
        org.apache.spark.sql.types.StructType.fromDDL(bloomMetaSchema))
      .coalesce(1).write.mode("overwrite").parquet(s"${path}__meta")
  }

  /** Membership probe against a persisted [[bloomWrite]] artifact: one
    * row per distinct probe key with `might_contain`. Geometry comes
    * from the artifact's own sidecar — a build/probe mismatch cannot
    * happen by construction.
    */
  def bloomProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      probes: DataFrame, keyCol: String): DataFrame = {
    val m = spark.read.parquet(s"${path}__meta").collect()
    require(m.length == 1, s"corrupt bloom meta at ${path}__meta: " +
      s"expected 1 geometry row, got ${m.length}")
    bloomMightContainPortable(spark.read.parquet(path), probes, keyCol,
      m(0).getInt(0), m(0).getInt(1), m(0).getString(2))
  }
}
