package graft

class CorpusBuildSpec extends SparkSpec {

  test("q55 signal stage: one documents scan, distributed losers") {
    val sig = graft.queries.TextOps.corpusSignals(
      spark, "/root/testdata/sf0.001")
    val plan = sig.queryExecution.executedPlan.toString
    // The loser set arrives as an already-materialized DISTRIBUTED
    // frame (Scan ExistingRDD), so filter + anti join + split + the
    // signal projections all ride ONE parquet scan of the corpus.
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"expected exactly one documents scan in the signal plan, got $scans:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"dedup must be an anti join:\n$plan")
    // The loser side must NOT be a driver-materialized local relation:
    // a collect()-then-toDF loser list shows up as LocalTableScan. A
    // distributed loser frame shows up as Scan ExistingRDD.
    assert(!plan.contains("LocalTableScan"),
      s"loser ids must stay distributed (no driver materialization):\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"loser side should be the checkpointed distributed frame:\n$plan")
    // The gram-hashing loop must run once per row: the struct is
    // projected once and its fields read in a separate projection that
    // CollapseProject must not merge back (the producer is not cheap).
    val ngramEvals = "ngram_stats".r.findAllIn(plan).size
    assert(ngramEvals == 1,
      s"expected exactly one ngram_stats evaluation, got $ngramEvals:\n$plan")
  }

  test("q55 packing stage: two-pass buckets, no whole-group window") {
    val q = SparkEntry.queries("q55_corpus_build")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    // The signal stage is checkpointed before packing, so the final
    // plan must not re-scan the corpus at all — every packing pass
    // reads the materialized signal rows.
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"packing must ride the checkpointed signals, not re-scan documents:\n$plan")
    // The round-6 scale-killer: a cumulative window partitioned by
    // (source, split) alone serializes each huge group through one
    // task. The two-pass packer's window must include its bucket
    // column in the partition spec.
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty, s"expected a packing window:\n$plan")
    winSpecs.foreach { spec =>
      assert(spec.contains("__bucket"),
        s"window must be bucketed, not per-(source,split): $spec\n$plan")
    }
    val out = q.collect()
    assert(out.nonEmpty && out.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")))
  }

  test("q62 boilerplate removal: two corpus passes, equality joins only") {
    val q = SparkEntry.queries("q62_boilerplate")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    // CCNet shape BY DESIGN: pass 1 builds the segment-frequency
    // table, pass 2 rewrites the docs — exactly two scans, never a
    // third, never a driver-materialized frequency list.
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(scans == 2,
      s"expected exactly two documents scans (count + rewrite), got $scans:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"the boilerplate table must stay distributed:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"the rewrite must join on the segment digest:\n$plan")
    val out = q.collect()
    assert(out.nonEmpty)
    // Sanity of the rewrite arithmetic: kept segments never exceed the
    // total, and a fully-boilerplate doc yields an empty clean_text.
    out.foreach { r =>
      val (nSegs, nBoiler) = (r.getLong(1), r.getLong(2))
      assert(nBoiler >= 0 && nBoiler <= nSegs)
      if (nBoiler == nSegs) assert(r.getString(3).isEmpty)
    }
  }
}
