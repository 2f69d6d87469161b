package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: train/val/test
  * hash splits, fixed-fraction subsampling, and weighted source
  * mixtures.
  *
  * Everything is keyed on `md5(salt || ":" || key)` — never `rand()` —
  * because at scale sampling must be:
  *  - retry-stable: a re-executed task (speculation, AQE replan,
  *    executor loss) must pick the SAME rows, or downstream exactly-once
  *    sinks see phantom inserts/deletes (`rand()` breaks this);
  *  - reproducible: the same corpus + salt yields the same split across
  *    runs and engines, so eval sets stay frozen;
  *  - join-free: membership is a per-row projection, no sampling state.
  *
  * Membership compares the first 4 hex chars of the digest
  * lexicographically against a threshold — uniform over 65536 buckets,
  * exactly restatable in any engine with md5 (no hex→int conversion,
  * which not every SQL dialect has). 4 hex digits bound the fraction
  * granularity at 1/65536 ≈ 0.0015%, plenty for split ratios.
  */
object Sampling {

  /** 4-hex-char bucket of a key under a salt (uniform over 0x0000-0xffff). */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 4)

  /** Hex threshold string t such that `bucket < t` selects ~`frac`. */
  private[graft] def hexThreshold(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction must be in [0,1], got $frac")
    f"${math.round(frac * 65536).toInt min 65535}%04x" // 65535: frac=1 handled by caller
  }

  /** Deterministic ~`fraction` sample, stable under retries and across
    * runs with the same salt.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashBucket(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /** Disjoint named splits by cumulative hash ranges, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Fractions must
    * sum to 1; every row lands in exactly one split. Adds `splitCol`.
    */
  def hashSplit(df: DataFrame, keyCol: String, salt: String,
      splits: Seq[(String, Double)], splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0.0),
      "every split needs a positive fraction (a zero split would still " +
        "absorb threshold-rounding residue as the otherwise-branch)")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = hashBucket(col(keyCol), salt)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    // Last split is the otherwise-branch: no threshold arithmetic can
    // lose a row to rounding.
    val expr = splits.init.zip(cumulative.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        val cond = bucket < lit(hexThreshold(cum))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn(splitCol, expr)
  }

  /** Leakage-safe split: [[hashSplit]] keyed by each row's GROUP, so
    * every member of a group (near-dup cluster, same source URL, same
    * repository — whatever correlation leaks labels) lands in the SAME
    * split. Doc-keyed splitting puts one near-duplicate in train and
    * its twin in test, and the eval silently measures memorization;
    * group-keyed hashing makes straddling structurally impossible
    * rather than merely checked for.
    *
    * `groups` maps `keyCol` → `groupCol` (e.g.
    * [[Dedup.connectedComponents]] output); rows ABSENT from the
    * mapping are singletons and split by their own key, under a
    * disjoint `solo:`/`grp:` keyspace so a group id can never collide
    * with a key. One key-keyed join against the (clustered-rows-only,
    * usually broadcast-small) mapping; the split itself stays a pure
    * map-side hash — deterministic, retry-stable, no shuffle of `df`.
    */
  def groupAwareSplit(df: DataFrame, keyCol: String, groups: DataFrame,
      groupCol: String, salt: String, splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    val keyC = graft.functions.ColumnLib.freeColumn(df, "split_key")
    val withKey = df
      .join(groups.select(col(keyCol),
        col(groupCol).cast("string").as(s"__$keyC")), Seq(keyCol), "left")
      .withColumn(keyC, coalesce(
        concat(lit("grp:"), col(s"__$keyC")),
        concat(lit("solo:"), col(keyCol).cast("string"))))
      .drop(s"__$keyC")
    hashSplit(withKey, keyC, salt, splits, splitCol).drop(keyC)
  }

  /** Fixed-SIZE stratified sample: the `n` rows with the smallest
    * `md5(salt:key)` per stratum (ties broken by the key itself, so the
    * order is total). Where [[deterministicSample]] fixes the RATE,
    * this fixes the COUNT per stratum — the "3 eval docs per
    * (source, lang) cell" recipe. Same retry-stable / reproducible /
    * join-free properties (the rank key is a pure projection), and the
    * per-stratum cut runs on the bounded-heap grouped top-k plan
    * ([[graft.plans.TopKPerGroup]]): map-side heaps of size `n`, no
    * per-stratum sort, shuffle bounded by `n * strata * partitions` —
    * a full-sort window formulation would shuffle the whole corpus.
    */
  def stratifiedFixedN(df: DataFrame, strataCols: Seq[String],
      keyCol: String, salt: String, n: Int): DataFrame = {
    val rk = graft.functions.ColumnLib.freeColumn(df, "__rk")
    TopK.perGroup(
      df.withColumn(rk,
        md5(concat(lit(salt + ":"), col(keyCol).cast("string")))),
      strataCols, Seq(col(rk).asc, col(keyCol).asc), n)
      .drop(rk)
  }

  /** Order-statistic quantiles from a BOUNDED sample — the quantile
    * face of [[stratifiedFixedN]]'s bottom-k-by-hash rows, which are
    * MERGEABLE: re-sampling the union of per-shard samples equals
    * sampling the union directly (the union's k smallest hashes are
    * all inside some shard's k smallest), so per-day samples roll up
    * to per-source quantiles without re-reading raw history — the
    * deterministic, engine-portable alternative to a t-digest.
    * Nearest-rank estimate v[⌊q·(n−1)⌋] per quantile (0-based over the
    * sorted sample), no interpolation: the reported value is a real
    * data value and restates exactly in any engine. Per-group state is
    * ≤ k values — broadcast-sized by construction.
    */
  def sampleQuantiles(sample: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1], got $qs")
    val g = sample.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col(valueCol))).as("__vs"))
    val n = size(col("__vs"))
    g.select((groupCols.map(col) :+ n.cast("long").as("n_sample")) ++
      qs.map { q =>
        element_at(col("__vs"),
          (floor(lit(q) * (n - 1).cast("double")) + 1).cast("int"))
          .as(s"p${math.round(q * 100)}")
      }: _*)
  }

  /** Deterministic corpus shuffle with GLOBAL sequence positions — the
    * "fix the training order" step: rows are totally ordered by
    * `md5(salt:key)` (key tiebreak, so the order is total) and each is
    * assigned its 0-based global position. The naive formulation —
    * `row_number()` over an unpartitioned window — funnels the entire
    * corpus through ONE task; this operator computes the same numbers
    * scalably: a range-partitioned parallel sort, then RDD
    * `zipWithIndex` (per-partition counts, a driver prefix-sum over
    * the bounded partition-count array, map-side base+offset — the
    * same two-pass shape as [[graft.operators.Packing]]). Position
    * values depend only on the total order, never on partition
    * boundaries or retries, so the assignment is deterministic and
    * retry-stable like everything else in this module. The RDD hop is
    * the sanctioned tier-(d) escape (SURVEY.md §7.3): per-partition
    * index assignment is genuinely imperative; everything around it
    * stays a DataFrame.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, salt: String,
      posCol: String = "pos"): DataFrame = {
    // CONTRACT (same as packTwoPass's order key): `keyCol` must be
    // UNIQUE and NON-NULL — it is the tiebreak that makes the order
    // total. Duplicate or null keys share a (md5, key) sort key, and
    // their relative positions would then depend on partition layout,
    // i.e. the shuffle would no longer be deterministic or
    // retry-stable. Corpus id columns satisfy this by construction.
    val ordC = graft.functions.ColumnLib.freeColumn(df, "__ord")
    globalPositions(
        df.withColumn(ordC,
          md5(concat(lit(salt + ":"), col(keyCol).cast("string")))),
        Seq(col(ordC), col(keyCol)), posCol)
      .drop(ordC)
  }

  /** 0-based global positions under an arbitrary TOTAL order (callers
    * must include a unique tiebreak column): range-partitioned
    * parallel sort + RDD `zipWithIndex` — the scalable replacement for
    * an unpartitioned `row_number()` window, shared by
    * [[deterministicShuffle]] and [[lengthBucketedBatches]]. Positions
    * depend only on the order, never on partition layout or retries.
    */
  private[graft] def globalPositions(df: DataFrame, order: Seq[Column],
      posCol: String): DataFrame = {
    require(!df.columns.contains(posCol),
      s"input already has a '$posCol' column; rename it first")
    val spark = df.sparkSession
    // The sorted frame is materialized ONCE (localCheckpoint, the q55
    // posture): zipWithIndex launches a counting job over every
    // partition before the consumer's own job, and without the cut the
    // corpus-wide range sort would run twice.
    val sorted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint(true)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        posCol, org.apache.spark.sql.types.LongType, nullable = false))
    val withPos = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(withPos, schema)
  }

  /** Length-bucketed batching — the minimal-padding batch layout for
    * inference or padded training: rows get global positions under the
    * (length DESC, key ASC) total order and batch id = pos DIV
    * `batchSize`, so every batch holds `batchSize` near-equal-length
    * rows and padding waste (batch max − row length) is near zero
    * everywhere except across bucket boundaries. Longest batches come
    * first — the OOM-probing order serving stacks prefer. Same scale
    * posture as [[deterministicShuffle]]: a range-partitioned sort,
    * never a global window.
    */
  def lengthBucketedBatches(df: DataFrame, keyCol: String,
      lengthCol: String, batchSize: Int,
      batchCol: String = "batch"): DataFrame = {
    require(batchSize > 0, "need a positive batch size")
    require(!df.columns.contains(batchCol),
      s"input already has a '$batchCol' column; rename it first")
    val posC = graft.functions.ColumnLib.freeColumn(df, "__pos")
    globalPositions(df, Seq(col(lengthCol).desc, col(keyCol).asc), posC)
      .withColumn(batchCol, floor(col(posC) / batchSize))
      .drop(posC)
  }

  /** Weighted mixture: deterministically subsample each source by its
    * weight and union (by name, tolerating schema drift across
    * sources). Weights are independent per-source fractions in [0, 1] —
    * the "30% of source A + 100% of source B" recipe of pre-training
    * data mixes. Each source gets a distinct derived salt so the same
    * key is sampled independently per source.
    */
  def mixture(sources: Seq[(DataFrame, Double)], keyCol: String,
      salt: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    sources.zipWithIndex.map { case ((df, w), i) =>
      deterministicSample(df, keyCol, w, s"$salt/$i")
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Deterministic token-budget subset: "give me a ~1B-token slice of
    * the corpus" — rows are taken in the md5(salt:key) shuffle order
    * until the cumulative token count reaches `budget`, so the subset
    * is unbiased (order is hash-random), reproducible, and grows
    * MONOTONICALLY with the budget (a 2B slice contains the 1B slice —
    * the property scaling-law runs need). The cumulative sum runs
    * two-pass over hash-order buckets ([[Packing.packTwoPass]] with a
    * constant group), so no single task ever sees the whole corpus;
    * membership is decided by `end_offset ≤ budget`, which includes
    * the boundary-crossing row iff it finishes inside the budget.
    */
  def tokenBudgetSample(df: DataFrame, keyCol: String, tokensCol: String,
      budget: Long, salt: String): DataFrame = {
    require(budget > 0, "need a positive token budget")
    // The packer's working column would silently shadow (and this
    // operator then DROP) a caller's own end_offset.
    require(!df.columns.contains("end_offset"),
      "input already has an 'end_offset' column; rename it first")
    val posC = graft.functions.ColumnLib.freeColumn(df, "__pos")
    val grpC = graft.functions.ColumnLib.freeColumn(df, "__grp")
    val ordered = deterministicShuffle(df, keyCol, salt, posC)
      .withColumn(grpC, lit(1))
    Packing.packTwoPass(ordered, grpC, posC, tokensCol, nBuckets = 64)
      .filter(col("end_offset") <= budget)
      .drop(posC, grpC, "end_offset")
  }

  /** Temperature-flattened mixture at T = 2 (α = 1/2): down-sample each
    * group so kept counts are proportional to √N_g — the standard
    * "flatten the source distribution" step of a pre-training mix
    * (big sources shrink, the smallest keeps 100%). Where [[mixture]]
    * takes CONFIGURED weights, this derives them FROM the data: keep
    * probability p_g = min_h(√N_h) / √N_g, realized as the portable
    * predicate `frac · √N_g < min_h(√N_h)` — md5-fraction (exact
    * double), one correctly-rounded sqrt per side, one IEEE multiply:
    * reproducible bit-for-bit in any engine, unlike a pow(N, α) weight
    * whose libm rounding varies. Plan: one count aggregate (tiny,
    * broadcast back) + a per-row projection filter — retry-stable,
    * join-free at row level, no shuffle of data rows. The fraction
    * reads the digest's first 4 hex chars as an integer (granularity
    * 1/65536, same as the threshold samplers). NULL group keys form
    * their own group (null-safe join), like everywhere else in this
    * module.
    */
  /** DSIR-style hashed-n-gram importance log-weights (Xie et al. 2023,
    * arXiv:2302.03169): score every document by how much more likely
    * its features are under a TARGET distribution than under the raw
    * corpus — the data-selection step that tilts a pre-training mix
    * toward a domain without training a classifier.
    *
    * Features are word unigrams + bigrams hashed into 256 buckets
    * (`substr(md5(tagged_gram), 1, 2)` — a string bucket, restatable
    * in any engine with md5; the `u:`/`b:` tags keep a unigram from
    * colliding with the identical bigram). Both bucket distributions
    * come out of ONE corpus scan (the target is a subset of the raw
    * corpus, so its counts are a conditional sum in the same
    * aggregate). Laplace-smoothed log-probs are quantized to integer
    * micro-nats exactly as the LM gates do (q64/q105): a floating sum
    * over grams would be order-dependent — the per-bucket weight
    * `lp_fp - lq_fp` is an exact integer, the per-doc score an exact
    * integer dot of (count × weight).
    *
    * Scale shape: gram stream is the native zero-shuffle
    * `word_shingles` path; per-bucket aggregation collapses map-side
    * to ≤ 256 rows per mapper; the weight table (≤ 256 rows)
    * broadcasts back; per-doc scoring is one (doc, bucket) aggregate.
    * Returns (id, n_feats, log_weight) per document — selection (top-k
    * or threshold) composes downstream.
    */
  def dsirLogWeights(docs: DataFrame, id: String, body: String,
      isTarget: Column): DataFrame = {
    import graft.functions.TextFunctions.words
    val nBuckets = 256
    val feats = docs.select(col(id), isTarget.as("__tgt"),
        explode(concat(
          transform(words(col(body)), w => concat(lit("u:"), w)),
          transform(call_function("word_shingles", words(col(body)), lit(2)),
            g => concat(lit("b:"), g)))).as("__f"))
      .select(col(id), col("__tgt"),
        substring(md5(col("__f")), 1, 2).as("__b"))
    val dist = feats.groupBy("__b").agg(
      count(lit(1)).as("__nraw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ntgt"))
    val totals = dist.agg(sum("__nraw").as("__traw"), sum("__ntgt").as("__ttgt"))
    val w = dist.crossJoin(broadcast(totals))
      .select(col("__b"),
        (round(log((col("__ntgt") + lit(1.0)) /
            (col("__ttgt") + lit(nBuckets.toDouble))) * lit(1e6)).cast("long") -
          round(log((col("__nraw") + lit(1.0)) /
            (col("__traw") + lit(nBuckets.toDouble))) * lit(1e6)).cast("long"))
          .as("__w_fp"))
    feats.groupBy(col(id), col("__b")).agg(count(lit(1)).as("__n"))
      .join(broadcast(w), "__b")
      .groupBy(col(id))
      .agg(sum("__n").as("n_feats"),
        sum(col("__n") * col("__w_fp")).as("__s"))
      .select(col(id), col("n_feats"),
        round(col("__s").cast("double") / lit(1e6), 9).as("log_weight"))
  }

  /** UniMax-style epoch-capped budget allocation (Chung et al. 2023,
    * arXiv:2304.09151): split a token budget as uniformly as possible
    * across groups (languages, sources) while capping every group at
    * `maxEpochs` passes over its data — the waterfilling answer to
    * "don't upsample a low-resource language a hundred epochs".
    *
    * Waterfilling, deterministically: sort groups by capacity
    * C_g = maxEpochs·N_g ascending; group at rank r is CAPPED iff
    * `C_r·(n−r) ≤ T − prefix_r` — a PURE-INTEGER inequality (both
    * sides exact longs), so both engines choose the identical
    * boundary; the uncapped groups then share the leftover equally:
    * λ = (T − Σ capped C)/(#uncapped), one double division of exact
    * integers. Monotone in r for sorted capacities, so the capped set
    * is a prefix — no iteration, one window pass.
    *
    * Input is the per-group COUNT table (already aggregated — group
    * cardinality, not data); the windows here run over that dimension
    * table, never over rows. Returns (group, n_tokens, capacity,
    * alloc, epochs) with alloc/epochs on the 1e-9 grid.
    */
  def epochCappedAllocation(counts: DataFrame, groupCol: String,
      tokensCol: String, budgetTokens: Long, maxEpochs: Long): DataFrame = {
    require(budgetTokens >= 0 && maxEpochs >= 1,
      s"need budget >= 0 and maxEpochs >= 1, got $budgetTokens/$maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val byCap = Window.orderBy(col("capacity").asc, col(groupCol).asc)
    val all = Window.partitionBy()
    val c = counts.select(col(groupCol), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("capacity", col("n_tokens") * maxEpochs)
      .withColumn("__rn", row_number().over(byCap))
      .withColumn("__prefix",
        sum(col("capacity")).over(byCap.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(all))
    val t = lit(math.min(budgetTokens, Long.MaxValue))
    // Capped iff C_r·(n−r) ≤ T − prefix_r (λ over the n−r groups above
    // rank r). When ΣC ≤ T this holds at every rank — the degenerate
    // all-capped case needs no special branch.
    val capped = col("capacity") * (col("__n") - col("__rn")) <=
      t - col("__prefix")
    val cappedSum = sum(when(capped, col("capacity")).otherwise(0L)).over(all)
    val nUncapped = sum(when(capped, 0L).otherwise(1L)).over(all)
    val lambda = (t - cappedSum).cast("double") / nUncapped.cast("double")
    c.withColumn("alloc",
        round(when(capped, col("capacity").cast("double")).otherwise(lambda), 9))
      .withColumn("epochs",
        round(col("alloc") / col("n_tokens").cast("double"), 9))
      .select(col(groupCol), col("n_tokens"), col("capacity"),
        col("alloc"), col("epochs"))
  }

  /** Deterministic negative sampling for implicit-feedback training
    * sets (the BPR/word2vec negatives recipe): for every user with at
    * least one positive, draw `k` items the user has NOT interacted
    * with, reproducibly. Candidates come from a keyed hash over
    * (salt, user, slot) — `k·overdraw` slots per user so that hash
    * collisions with the user's positives (or between slots) still
    * leave ≥ k survivors for any realistic positive density; the
    * per-user candidate list is tiny and bounded by construction.
    *
    * Shape at 100 TB: one distinct over positives (their natural
    * shuffle), a slot explode over the USER dimension only (k·overdraw
    * rows per user, never |users|×|items|), one anti-join back against
    * positives on (user, item), and a bounded-heap top-k by slot
    * order. Items are addressed by a dense [0, nItems) ordinal — the
    * id space of a dimension table; map through the dim beforehand if
    * ids are sparse.
    *
    * `slotItem` maps (user, slot) → candidate ordinal; the default is
    * a 48-bit md5 prefix hash mod nItems — wide enough that every
    * ordinal of any realistic item dimension is reachable (a 16-bit
    * hash would silently exclude items ≥ 65536 from sampling), and
    * still restatable in SQL (the q137 oracle casts the same hex
    * prefix). Swap in `pmod(xxhash64(u, s), nItems)` when hashing
    * cost matters more than portability.
    *
    * Returns (userCol, item, slot) — slot is the draw ordinal, kept so
    * downstream epoch-mixing can subsample deterministically.
    */
  def negativeSamples(positives: DataFrame, userCol: String, itemCol: String,
      nItems: Long, k: Int, salt: String = "neg", overdraw: Int = 3,
      slotItem: (Column, Column) => Column = null): DataFrame = {
    require(k >= 1 && overdraw >= 1 && nItems >= 1,
      s"need k >= 1, overdraw >= 1, nItems >= 1; got $k, $overdraw, $nItems")
    val mix: (Column, Column) => Column =
      if (slotItem != null) slotItem
      else (u, s) => pmod(
        conv(substring(md5(concat_ws(":", lit(salt), u.cast("string"),
          s.cast("string"))), 1, 12), 16, 10).cast("long"),
        lit(nItems))
    val pos = positives.select(col(userCol), col(itemCol).as("item")).distinct()
    val cand = pos.select(col(userCol)).distinct()
      .select(col(userCol),
        explode(sequence(lit(0), lit(k * overdraw - 1))).as("slot"))
      .withColumn("item", mix(col(userCol), col("slot")))
    cand.join(pos, Seq(userCol, "item"), "left_anti")
      .groupBy(col(userCol), col("item"))
      .agg(min(col("slot")).as("slot")) // collided slots keep the first draw
      .transform(d => TopK.perGroup(d, Seq(userCol),
        Seq(col("slot").asc, col("item").asc), k))
  }

  /** Weighted sample WITHOUT replacement, exact size `k` per stratum
    * (Efraimidis–Spirakis A-ES, IPL 2006 — public algorithm): each row
    * draws a deterministic uniform u ∈ (0,1) from `md5(salt:key)` and
    * competes with the key u^(1/w); the k LARGEST keys are exactly a
    * weighted sample without replacement. One pass, no rand() (the
    * house determinism rule: retries and re-runs select the same
    * rows), no sequential reservoir — the "reservoir" is the same
    * bounded per-partition heap machinery as every other top-k here
    * ([[TopK.perGroup]] for strata, TakeOrderedAndProject when
    * global), so a 100 TB corpus pays one exchange of ≤k rows per
    * partition, never a global sort.
    *
    * u is the first 13 md5 hex chars scaled by 2⁻⁵², offset +0.5 so
    * u is never exactly 0 or 1 (u=0 would collapse every weight to
    * key 0). Weights must be strictly positive — a null or ≤0 weight
    * has no A-ES semantics and fails LOUDLY rather than silently
    * dropping rows.
    *
    * CONTRACT: `keyCol` must be unique per row (the module-wide
    * sampling contract — every operator here keys its hash on a
    * unique id). Duplicate keys draw identical competition keys, and
    * which physical duplicate the heap keeps then depends on
    * partition layout — the determinism this operator promises is
    * only as good as the key's uniqueness.
    */
  def weightedSampleK(df: DataFrame, keyCol: String, weight: Column,
      salt: String, k: Int, strataCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val wC = graft.functions.ColumnLib.freeColumn(df, "__w")
    val kC = graft.functions.ColumnLib.freeColumn(df, "__aes")
    val u = (conv(substring(md5(concat(lit(salt + ":"),
        col(keyCol).cast("string"))), 1, 13), 16, 10).cast("double") +
      lit(0.5)) / lit(4503599627370496.0) // 2^52
    val keyed = df
      .withColumn(wC,
        when(weight.isNotNull && weight > 0, weight.cast("double"))
          .otherwise(raise_error(concat(lit(
            "weightedSampleK: weight must be > 0 and non-null at key="),
            col(keyCol).cast("string")))))
      .withColumn(kC, pow(u, lit(1.0) / col(wC)))
    val picked =
      if (strataCols.isEmpty)
        keyed.orderBy(col(kC).desc, col(keyCol).asc).limit(k)
      else
        TopK.perGroup(keyed, strataCols, Seq(col(kC).desc, col(keyCol).asc), k)
    picked.drop(wC, kC)
  }

  def sqrtFlattenSample(df: DataFrame, keyCol: String, groupCol: String,
      salt: String): DataFrame = {
    val nC = graft.functions.ColumnLib.freeColumn(df, "__n")
    val msC = graft.functions.ColumnLib.freeColumn(df, "__ms")
    val cnts = df.groupBy(col(groupCol)).agg(count(lit(1)).as(nC))
    val minS = cnts.agg(min(sqrt(col(nC))).as(msC))
    val frac = conv(hashBucket(col(keyCol), salt), 16, 10)
      .cast("double") / lit(65536.0)
    df.join(broadcast(cnts), df(groupCol) <=> cnts(groupCol))
      .drop(cnts(groupCol))
      .crossJoin(broadcast(minS))
      .filter(frac * sqrt(col(nC)) < col(msC))
      .drop(nC, msC)
  }
}
