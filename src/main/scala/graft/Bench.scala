package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Dev-only: comma-separated query-name substrings to bench a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    def keep(name: String): Boolean = only.forall(_.exists(name.contains))
    val spark = Engine.local(cpus)
    // Warm the JVM/codegen/parquet-reader paths on the smallest SF so
    // one-time init cost isn't attributed to whichever query runs first.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.toSeq.filter(q => keep(q._1)).sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // A query that throws reports -1, NOT its time-to-failure: a fast
    // exception would otherwise masquerade as a fast query. Each query
    // is timed TWICE and reports the min: a single pass under transient
    // machine load can inflate a query up to ~8x (the BENCH_r03
    // artifact, see README), and the min of two passes is the cheapest
    // estimator that one loaded pass cannot poison. The passes are
    // INTERLEAVED — every query's pass 1, then every query's pass 2 —
    // so each query's two samples are separated by roughly the whole
    // suite's duration and one transient load window cannot hit both
    // (back-to-back passes both landed inside the same busy window in
    // BENCH_r05; see README). /proc/loadavg is recorded at start, at
    // the pass boundary, and at end, so a load-inflated artifact is
    // self-diagnosing instead of silently wrong.
    //
    // Execution is a noop-sink WRITE, not count(): count() lets the
    // optimizer prune every column the row count doesn't need — for a
    // query whose tail is an aggregate that deletes the aggregate
    // expressions themselves (count over an aggregate needs only the
    // grouping keys), under-reporting e.g. q46 by ~15x (BENCH_r04 and
    // earlier are affected; see README). The noop sink consumes every
    // output column, so the timed plan is the plan a real caller pays
    // for, with zero serialization/IO cost in the measurement.
    def loadavg(): String =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.trim.split(" ").take(3).mkString(",")
        finally src.close()
      } catch { case _: Throwable => "" }
    val named = SparkEntry.queries.toSeq.filter(q => keep(q._1)).sortBy(_._1)
    def pass(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
    }
    // Fixed calibration workload timed at each pass boundary: a
    // constant shuffle+aggregate whose cost is machine-load-dependent
    // but CODE-INDEPENDENT, so round-over-round artifacts can be
    // normalized for ambient load after the fact (calib ratio ≈ load
    // inflation factor). Runs once untimed first to absorb its own
    // codegen cost.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000).selectExpr("id % 1000 AS k", "id AS v")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Idle guard: a pass that starts under ambient load produces numbers
    // that are not comparable round-over-round (BENCH_r05/r12 both ran at
    // loadavg 3–7 and inflated the IVF family). If the 1-min loadavg
    // exceeds the threshold, wait (bounded) for the machine to drain;
    // if it never does, record loudly rather than silently.
    def load1(): Double =
      try loadavg().split(",").headOption.map(_.toDouble).getOrElse(0.0)
      catch { case _: Throwable => 0.0 }
    val idleMax = sys.env.getOrElse("SPARK_GRAFT_IDLE_MAX", "1.5").toDouble
    // Default wait is bounded at 4 min: the driver invokes Bench right
    // after heavier steps and must never be timed out by the guard —
    // a busy start after the bounded wait is recorded loudly instead.
    val idleWaitSec = sys.env.getOrElse("SPARK_GRAFT_IDLE_WAIT_SEC", "240").toInt
    val waitDeadline = System.nanoTime() + idleWaitSec * 1000000000L
    while (load1() > idleMax && System.nanoTime() < waitDeadline) {
      System.err.println(s"[bench] waiting for idle: loadavg ${load1()} > $idleMax")
      Thread.sleep(15000)
    }
    val busyStart = load1() > idleMax
    if (busyStart)
      System.err.println(s"[bench] WARNING: starting busy (loadavg ${load1()} > $idleMax after ${idleWaitSec}s wait); numbers are load-polluted")
    calibrate() // warm
    val loadStart = loadavg()
    // INTERLEAVED calibration: the r13 artifact proved a single calib
    // sample per pass boundary cannot represent a load profile that
    // changes WITHIN a pass (a transient loadavg-9.3 spike at one
    // boundary scaled every pass-2 time by 0.27 and produced a
    // meaningless total_norm). Each pass now re-times the fixed
    // calibration workload every CalEvery queries, and each query is
    // normalized by its BRACKETING calib samples (mean of the segment's
    // two endpoints), so a mid-run spike deflates only the ~25 queries
    // it actually inflated.
    val CalEvery = 25
    def timedPass(): (IndexedSeq[Double], IndexedSeq[Double]) = {
      val times = Array.fill(named.size)(-1.0)
      val calibs = scala.collection.mutable.ArrayBuffer(calibrate())
      named.zipWithIndex.foreach { case ((name, fn), i) =>
        times(i) = pass(name, fn)
        if ((i + 1) % CalEvery == 0 && i + 1 < named.size)
          calibs += calibrate()
      }
      calibs += calibrate()
      (times.toIndexedSeq, calibs.toIndexedSeq)
    }
    val (pass1, calibs1) = timedPass()
    val loadMid = loadavg()
    val (pass2, calibs2) = timedPass()
    val loadEnd = loadavg()
    // A query is an error only if it NEVER ran: a transient failure in
    // one pass must not discard the other pass's valid measurement.
    val results = named.zip(pass1.zip(pass2)).map { case ((name, _), (t1, t2)) =>
      name -> (if (t1 < 0) t2 else if (t2 < 0) t1 else math.min(t1, t2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val nErr = results.count(_._2 < 0)
    // Load-corrected total: scale each query by (median calib / its
    // segment's local calib) before the per-query min, so a query that
    // ran under ambient load is deflated by exactly the slowdown the
    // calibration workload observed AROUND it. Round-over-round deltas
    // compare total_norm mechanically instead of eyeballing loadavg.
    val allCalibs = (calibs1 ++ calibs2).sorted
    val calibMed = allCalibs(allCalibs.size / 2)
    def localCalib(calibs: IndexedSeq[Double], i: Int): Double = {
      val seg = i / CalEvery
      (calibs(seg) + calibs(math.min(seg + 1, calibs.size - 1))) / 2.0
    }
    val totalNorm = named.indices.map { i =>
      val n1 = if (pass1(i) < 0) -1.0
               else pass1(i) * calibMed / localCalib(calibs1, i)
      val n2 = if (pass2(i) < 0) -1.0
               else pass2(i) * calibMed / localCalib(calibs2, i)
      if (n1 < 0) n2 else if (n2 < 0) n1 else math.min(n1, n2)
    }.filter(_ >= 0).sum
    // Dispersion flag: when the calib samples disagree by more than 2x,
    // machine load varied enough during the run that even the bracketed
    // normalization is an estimate — the artifact says so instead of
    // pretending (the r12/r13 lesson, mechanized).
    val loadPolluted = allCalibs.last / allCalibs.head > 2.0
    // Surface any subset filter so a partial run is distinguishable from
    // a full one in round-over-round BENCH artifacts.
    val filterJson = only.map(f => s""","filter":"${f.mkString(",")}"""").getOrElse("")
    val calibJson = (calibs1 ++ calibs2).map(c => f"$c%.3f").mkString("[", ",", "]")
    val loadJson =
      s""","loadavg":{"start":"$loadStart","mid":"$loadMid","end":"$loadEnd"}""" +
        s""","calib_sec":$calibJson,"busy_start":$busyStart,"load_polluted":$loadPolluted"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_norm":$totalNorm,"queries":$qs,"n_queries":${results.size},"n_errors":$nErr$filterJson$loadJson,"sf":"$sfDir"}""")
    // The driver captures only the TAIL of stdout; with 120+ queries the
    // per-query map pushes the leading "metric":"total" key out of the
    // captured window, leaving the round artifact machine-unparseable
    // (BENCH_r03..r09 all record parsed:null). Re-print a compact summary
    // LAST so the total always survives tail truncation.
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_norm":$totalNorm,"n_queries":${results.size},"n_errors":$nErr$filterJson$loadJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
