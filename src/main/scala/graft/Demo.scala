package graft

import graft.pipelines.BatchRunner
import graft.sources.FixtureSources

/** Executable end-to-end demo of the batch engine: two incremental
  * cycles (cold start, then overlap re-read with updated docs) plus the
  * reporting refresh, against the offline fixture source.
  *
  *   sbt "runMain graft.Demo [warehouseDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_demo").toString)
    val spark = Engine.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val t0 = 1704844800000L // 2024-01-10T00:00:00Z
    val cfg = BatchRunner.Config(wh, tenants = Seq("PK"),
      sliceMs = 1800000L, pageSize = 50)

    // cycle 1: cold start
    val r1 = new BatchRunner(spark, new FixtureSources.Paged(t0, 120, version = 1),
      new FixtureSources.Snapshots, cfg)
    r1.bootstrap()
    r1.runCustomer(t0 + 120 * 60000L)
    r1.runCall(t0 + 120 * 60000L)
    r1.runStaffGroup()

    // cycle 2: fresh runner warms from the audit log; source re-serves
    // updated docs + 60 new ones
    val r2 = new BatchRunner(spark, new FixtureSources.Paged(t0, 180, version = 2),
      new FixtureSources.Snapshots, cfg)
    r2.bootstrap()
    r2.runCustomer(t0 + 180 * 60000L)
    r2.runCall(t0 + 180 * 60000L)
    r2.refreshReporting(java.time.LocalDate.parse("2024-01-12"), windowDays = 7)

    Seq("customer", "call_log", "staff", "group", "fact_staff_daily", "update_log")
      .foreach { t =>
        println(s"TABLE $t rows=" + spark.read.parquet(s"$wh/$t").count())
      }
    spark.read.parquet(s"$wh/fact_staff_daily")
      .orderBy("Ngay", "MaNV_id").show(5, truncate = false)
    println(s"DEMO_OK warehouse=$wh ck_customer=" +
      r2.checkpoints.getCheckpoint("customer", "PK").getOrElse(-1L))
    spark.stop()
  }
}
