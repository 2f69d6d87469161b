package graft

class CorpusBuildSpec extends SparkSpec {

  test("q55 composed pipeline: main plan scans documents exactly once") {
    val q = SparkEntry.queries("q55_corpus_build")(
      spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    // The component list arrives as an already-materialized broadcast
    // (Scan ExistingRDD), so filter + anti join + split + pack + agg
    // all ride ONE parquet scan of the corpus.
    val scans = "documents\\.parquet".r.findAllIn(plan).size
    assert(scans == 1,
      s"expected exactly one documents scan in the composed plan, got $scans:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"dedup must be a broadcast anti join:\n$plan")
    val out = q.collect()
    assert(out.nonEmpty && out.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")))
  }
}
