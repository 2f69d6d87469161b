package graft

class CorpusBuildSpec extends SparkSpec {

  test("q55 composed pipeline: main plan scans documents exactly once") {
    val q = SparkEntry.queries("q55_corpus_build")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    // The loser set arrives as an already-materialized DISTRIBUTED
    // frame (Scan ExistingRDD), so filter + anti join + split + pack +
    // agg all ride ONE parquet scan of the corpus.
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"expected exactly one documents scan in the composed plan, got $scans:\n$plan")
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
    val out = q.collect()
    assert(out.nonEmpty && out.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")))
  }
}
