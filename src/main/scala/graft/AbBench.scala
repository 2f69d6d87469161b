package graft

/** Dev tool: same-JVM interleaved A/B of a runtime-settable config across
  * registered queries. Cross-run comparisons on this machine are poisoned
  * by ambient load drift (README's r12-r14 lesson); executing variant A
  * and variant B back-to-back inside one JVM, interleaved per query and
  * repeated, gives each variant the same load profile, and per-variant
  * MIN over reps discards transient spikes.
  *
  * Usage: runMain graft.AbBench <confKey> <valA> <valB>
  *   - confKey prefixed "hadoop:" is set on sparkContext.hadoopConfiguration
  *   - SPARK_GRAFT_ONLY / SPARK_GRAFT_AB_REPS / SPARK_GRAFT_SF_DIR as in Bench
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val Array(confKey, valA, valB) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    def keep(n: String): Boolean = only.forall(_.exists(n.contains))
    val spark = Engine.local(cpus)
    def setConf(v: String): Unit =
      if (confKey.startsWith("hadoop:"))
        spark.sparkContext.hadoopConfiguration.set(confKey.stripPrefix("hadoop:"), v)
      else spark.conf.set(confKey, v)
    val named = SparkEntry.queries.toSeq.filter(q => keep(q._1)).sortBy(_._1)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      Seq(valA, valB).foreach { v =>
        setConf(v)
        named.foreach { case (_, fn) =>
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
      }
    val tA = Array.fill(named.size)(Double.MaxValue)
    val tB = Array.fill(named.size)(Double.MaxValue)
    (1 to reps).foreach { rep =>
      named.zipWithIndex.foreach { case ((name, fn), i) =>
        // Alternate the variant order per rep: the SECOND execution of
        // a query free-rides the first's JIT/codegen/page-cache warmth
        // (measured ~20% — a fixed order would hand that advantage to
        // one variant every time; alternating gives each variant one
        // second-position sample for the per-variant min to pick up).
        val pair = Seq((valA, tA), (valB, tB))
        (if (rep % 2 == 1) pair else pair.reverse).foreach { case (v, acc) =>
          setConf(v)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            acc(i) = math.min(acc(i), (System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[ab] $name ($v) failed: ${e.getMessage}")
          }
        }
      }
    }
    println(f"== A/B $confKey: A=$valA B=$valB reps=$reps sf=$sfDir ==")
    var sa = 0.0; var sb = 0.0
    named.zipWithIndex.sortBy { case (_, i) => -tA(i) }.foreach { case ((name, _), i) =>
      if (tA(i) < Double.MaxValue && tB(i) < Double.MaxValue) {
        sa += tA(i); sb += tB(i)
        println(f"${tA(i)}%7.3f -> ${tB(i)}%7.3f  (${tB(i) / tA(i)}%4.2f)  $name")
      }
    }
    println(f"TOTAL A=$sa%.2f s  B=$sb%.2f s  ratio ${sb / sa}%.3f")
    spark.stop()
  }
}
