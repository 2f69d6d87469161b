package graft

import org.apache.spark.sql.functions._

/** Physical-plan gates for the scale properties the engine is designed
  * around — the "would this survive 100×" checks, pinned so a refactor
  * that silently de-optimizes a plan fails a test instead of a
  * benchmark round later. Uses the sf0.001 fixtures: plan SHAPE is
  * scale-independent even where AQE's join choice is not, so each
  * assertion targets a shape property that holds at any SF.
  *
  * Every pin runs TWICE: once on the statically compiled plan under
  * the session's default config, and once on the FINAL adaptive plan
  * under `spark.sql.adaptive.forceApply=true` (query executed first —
  * AQE only finalizes at runtime). AQE re-plans exchanges and join
  * strategies from runtime stats; without the second leg it could
  * silently reintroduce an exchange or de-broadcast a join that the
  * static pin swears is absent.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Final adaptive plan, initial-plan echo stripped: AdaptiveSparkPlan's
    * treeString appends an "== Initial Plan ==" section after execution,
    * which would double-count every operator a pin counts.
    */
  private def planAqe(name: String): String = {
    val conf = spark.conf
    val key = "spark.sql.adaptive.forceApply"
    val prev = conf.getOption(key)
    conf.set(key, "true")
    try {
      val dfq = SparkEntry.queries(name)(spark, dir)
      dfq.collect()
      dfq.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    } finally prev match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  /** Run one shape check against both the static and the AQE-final
    * plan. `mode` rides in the clue so a failure names the leg.
    */
  private def bothPlans(name: String)(check: (String, String) => Unit): Unit = {
    check(plan(name), "static")
    check(planAqe(name), "aqe-final")
  }

  test("filters and projections push down to the parquet scan") {
    val p = Tables.table(spark, dir, "documents")
      .filter(col("doc_id") < 80).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,80)]"),
      s"scan must receive the pushed filter:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"scan must prune to the 2 projected columns:\n$p")
  }

  test("q127 HRW sharding: scoring is shuffle-free, 2 exchanges total") {
    // 16 md5 scores + 2 array_max per row all inside one Project over
    // the scan; the only exchanges are the final aggregate's hash
    // partitioning and the presentation sort's range partitioning.
    bothPlans("q127_rendezvous_shard") { (p, mode) =>
      assert("Exchange hashpartitioning".r.findAllMatchIn(p).size == 1,
        s"[$mode]\n$p")
      assert("Exchange rangepartitioning".r.findAllMatchIn(p).size == 1,
        s"[$mode]\n$p")
      assert(!p.contains("BroadcastExchange") && !p.contains("Window"),
        s"[$mode]\n$p")
      // and the scan reads only the two columns the query needs
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"[$mode]\n$p")
    }
  }

  test("q125 funnel: stage aggregates never re-exchange on a composite key") {
    // t1/t2 are per-user constants; grouping on (user_id, t1) would add
    // a composite-key shuffle per stage (measured: 11 exchanges vs 8).
    bothPlans("q125_funnel") { (p, mode) =>
      val composite = "hashpartitioning\\([^)]*user_id[^)]*t[0-9]".r
      assert(composite.findFirstIn(p).isEmpty,
        s"[$mode] stage aggregate re-exchanged on a composite key:\n$p")
      // each stage's scan receives its event_type filter
      assert(p.contains("EqualTo(event_type,view)"),
        s"[$mode] event_type filter must reach the scan:\n$p")
    }
  }

  test("q129 winsorize: the percentile table joins back via broadcast") {
    // The per-language percentile table is rows=|langs|; shipping it as
    // a broadcast keeps the clamp pass shuffle-free on the data side.
    bothPlans("q129_winsorize") { (p, mode) =>
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"[$mode] expected a broadcast join for the tiny percentile table:\n$p")
    }
  }

  test("q134 repetition: no interpreted higher-order functions in the plan") {
    // The first cut computed the top-gram stats with nested per-row
    // HOFs; Spark runs ArrayFilter/ArrayTransform lambdas INTERPRETED
    // and re-evaluates their inputs per element, which made the query
    // O(g³)-ish per document. The rewrite is explode + aggregate;
    // this pin fails if per-row lambda filtering ever sneaks back.
    bothPlans("q134_gopher_repetition") { (p, mode) =>
      assert(!p.contains("array_filter") && !p.contains("ArrayFilter"),
        s"[$mode] no per-row lambda filtering in the repetition plan:\n$p")
      assert(p.contains("Generate"), s"[$mode] gram explode missing:\n$p")
    }
  }

  test("q140 classifier: the model ships as broadcasts, never a shuffle join") {
    // The vocab-weight table, the 1-row default and the 1-row prior
    // must all broadcast — inference is a map-side join + sum. (The
    // doc-level eval join is corpus-vs-corpus and may legitimately
    // shuffle; the pin is on the TOKEN join, which would shuffle the
    // whole token stream if the model ever stopped broadcasting.)
    bothPlans("q140_nb_classifier") { (p, mode) =>
      assert("BroadcastHashJoin \\[token".r.findFirstIn(p).isDefined,
        s"[$mode] expected the token->weight join to broadcast:\n$p")
      assert("SortMergeJoin \\[token".r.findFirstIn(p).isEmpty,
        s"[$mode] the token join must never shuffle the token stream:\n$p")
    }
  }

  test("q137 negatives: slot explode over users only, no cartesian") {
    bothPlans("q137_negative_sampling") { (p, mode) =>
      assert(!p.contains("CartesianProduct"), s"[$mode] no cartesian:\n$p")
      // the anti-join against positives is a real anti join
      assert(p.contains("LeftAnti"), s"[$mode] anti-join missing:\n$p")
    }
  }

  test("q158 prefix join: no cartesian, no all-gram self-join key") {
    // The candidate join must key on the PREFIX token stream; a plan
    // with a cartesian (or a join keyed on the raw text) means the
    // filter stopped pruning.
    bothPlans("q158_prefix_jaccard") { (p, mode) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"[$mode] no unpruned pair join:\n$p")
      // (The parquet scan itself sits behind the sets localCheckpoint
      // and is not visible in this executed plan — column pruning on
      // `documents` is covered by the generic pushdown test above.)
    }
  }

  test("q159 weighted sample: bounded-heap top-k, never a window sort") {
    bothPlans("q159_weighted_sample") { (p, mode) =>
      assert(p.contains("TopKPerGroup"),
        s"[$mode] expected the custom top-k plan:\n$p")
      assert(!p.contains("Window"),
        s"[$mode] no window sort in the sample path:\n$p")
    }
  }

  test("q164 gap fill: spine bounds broadcast; one window for the fill") {
    bothPlans("q164_gap_fill") { (p, mode) =>
      assert(p.contains("BroadcastExchange"),
        s"[$mode] 1-row bounds must broadcast into the spine generator:\n$p")
      assert("Window ".r.findAllMatchIn(p).size == 1,
        s"[$mode] exactly one forward-fill window pass:\n$p")
    }
  }

  test("q165 transitions: one lead() pass, normalization join-free") {
    // The ratio runs as a window over the bounded counts table; a
    // totals join-back would reference (and re-execute) the
    // user-stream lead() subtree twice.
    bothPlans("q165_transitions") { (p, mode) =>
      assert("lead\\(".r.findAllMatchIn(p).size <= 1,
        s"[$mode] the user-stream lead() pass must execute once:\n$p")
      assert(!p.contains("Join"), s"[$mode] normalization must not join:\n$p")
    }
  }

  test("q163 incremental agg: delta merge never re-scans wide state") {
    // Both inputs to the final merge aggregate are themselves
    // aggregates (state + delta-agg): the plan must contain no join —
    // the merge is a unionByName + re-aggregate.
    bothPlans("q163_incremental_agg") { (p, mode) =>
      assert(!p.contains("Join"),
        s"[$mode] state merge must be union+agg, not join:\n$p")
      assert(p.contains("Union"), s"[$mode] expected the state/delta union:\n$p")
    }
  }

  test("q176 linkage: sub-block distribution survives AQE (no re-coalesce)") {
    // blockedSelfPairs exists to spread a Σ|block|² pair expansion
    // over bucket-pair sub-blocks; its fixed-N repartition is the part
    // AQE must NOT undo (size-based coalescing sees kilobyte join
    // inputs and would serialize the in-join compute back to one
    // task). Pin: the join keys carry the sub-block columns, the join
    // stays an equi-join, and the user repartition is present in the
    // final adaptive plan.
    bothPlans("q176_record_linkage") { (p, mode) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"[$mode] pair generation must stay an equi-join:\n$p")
      assert(p.contains("__i") && p.contains("__j"),
        s"[$mode] the bucket-pair sub-block keys must be join keys:\n$p")
      assert(("REPARTITION_BY_NUM".r.findAllMatchIn(p).nonEmpty ||
        "Exchange hashpartitioning\\(p_brand".r.findAllMatchIn(p).nonEmpty),
        s"[$mode] the fixed-N sub-block distribution must survive:\n$p")
    }
  }

  test("q185 split: membership is hash projection; one mapping join") {
    // The leakage-safe split must stay a pure map-side hash over the
    // group key — no shuffle of the corpus for the split decision
    // itself. The only data-sized exchanges are the component
    // machinery and the final stats aggregation; the split expression
    // (md5 threshold CASE) must not introduce a Window over the
    // corpus or a nested-loop join.
    bothPlans("q185_leakage_safe_split") { (p, mode) =>
      assert(!p.contains("CartesianProduct"),
        s"[$mode] no cartesian anywhere in the split:\n$p")
      // the broadcast of the 1-row straddle scalar is the ONLY
      // nested-loop join (joining on literal true)
      assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size <= 2,
        s"[$mode] only the 1-row scalar broadcasts may nest:\n$p")
    }
  }

  test("q189 KMV: bounded-heap sketches, no unpartitioned window") {
    // The sketch build must ride the grouped top-k heap plan — a
    // row_number window over an unpartitioned or corpus-wide sort
    // would funnel the stream; and estimates are projections, not
    // joins back to raw data.
    bothPlans("q189_kmv_distinct") { (p, mode) =>
      assert(!p.contains("Window "), // TopKPerGroup never plans a Window
        s"[$mode] KMV must use the bounded-heap plan, not a window:\n$p")
      assert(!p.contains("CartesianProduct"), s"[$mode]\n$p")
    }
  }

  test("q193 semantic decontam: bucket equi-join, never corpus x benchmark") {
    bothPlans("q193_semantic_decontam") { (p, mode) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"[$mode] candidates must meet on bucket equality:\n$p")
      assert(p.contains("bucket"), s"[$mode] bucket key must be in play:\n$p")
    }
  }

  test("q172 multi-touch: containment is bucket-keyed, never a raw theta join") {
    // The purchase↔touch pairing rides IntervalJoin.overlap: candidates
    // meet on (user_id, 30-min bucket) in an ordinary equi-join. A
    // hyper-active user must never go lifetime-quadratic — which is
    // exactly what a CartesianProduct / BroadcastNestedLoopJoin (raw
    // inequality join) or an equi-join keyed on user_id ALONE would be.
    bothPlans("q172_multi_touch") { (p, mode) =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"[$mode] containment must stay an equi-join:\n$p")
      assert(p.contains("__bkt"),
        s"[$mode] the bucketed IntervalJoin path must be in use:\n$p")
    }
  }
}
