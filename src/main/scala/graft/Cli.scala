package graft

import graft.pipelines.BatchRunner
import graft.sources.{ApiConfig, HttpSnapshotFetcher, PagedSource}
import org.apache.spark.sql.SparkSession

/** Operator command-line entrypoint — the reference's
  * `python -m callio_etl` surface (`__main__.py:11-34`) re-expressed
  * over the engine's own layers:
  *
  * {{{
  *   graft.Cli --mode once  --job all|customer|call|staffgroup|report
  *   graft.Cli --mode daemon
  * }}}
  *
  *  - `--mode once` (default): [[BatchRunner.bootstrap]] then the named
  *    job(s) against the current clock; `all` = customer + call +
  *    staffgroup (reference runner.py:967-1012), and — like the
  *    reference's post-job hook — a best-effort reporting-fact refresh
  *    afterwards (failure logged, never fatal; runner.py:1006-1012).
  *    `report` runs ONLY the fact refresh (an operator repair surface
  *    the reference reaches via run_fact_staff_daily_pk_refresh).
  *  - `--mode daemon`: [[BatchRunner.runLoop]] — slot scheduling,
  *    boot-time missed-slot catch-up, error backoff (reference
  *    runner.py:937-965). Cold start = immediate catch-up run; the
  *    reference persists no cross-restart last-run either.
  *
  * Environment (the reference's `.env` contract, config.py:28-207):
  * everything [[ApiConfig.fromEnv]] reads (credentials, endpoint,
  * slice knobs), plus
  *  - `GRAFT_WAREHOUSE_DIR` (required) — parquet warehouse root, the
  *    engine's analog of the reference's BigQuery dataset;
  *  - `SCHEDULER_RUN_TIMES_UTC` — comma-separated `HH:MM` daily slots
  *    (default the reference's 02:30,04:00,06:00,08:00,11:00);
  *  - `OVERLAP_MS` (default 180000), `DAYS_TO_FETCH_IF_EMPTY`
  *    (default 30), `LIMIT_RECORDS_PER_ENDPOINT` (optional);
  *  - `SPARK_GRAFT_CPUS` — local-mode parallelism for [[main]]; a
  *    cluster deployment submits this class via spark-submit and the
  *    session builder's master wins.
  *
  * Tenants are the configured accounts' tenants (the reference
  * iterates config.accounts, runner.py:529). The clock, sleeper, stop
  * flag, and both transports are injected in [[run]] so CliSpec drives
  * a full once-run and a daemon tick against fixture fetchers with no
  * network and no real sleeping; [[main]] wires the production HTTP
  * transports.
  */
object Cli {

  final case class Args(mode: String, job: String)

  private val modes = Set("once", "daemon")
  private val jobs = Set("all", "customer", "call", "staffgroup", "report")

  /** argparse-equivalent: unknown flags/values fail loudly with usage. */
  private[graft] def parseArgs(argv: Seq[String]): Args = {
    def usage(msg: String): Nothing = throw new IllegalArgumentException(
      s"$msg\nusage: graft.Cli [--mode once|daemon] " +
        "[--job all|customer|call|staffgroup|report]")
    var mode = "once"
    var job = "all"
    var rest = argv.toList
    while (rest.nonEmpty) rest match {
      case "--mode" :: v :: t =>
        if (!modes(v)) usage(s"invalid --mode '$v'")
        mode = v; rest = t
      case "--job" :: v :: t =>
        if (!jobs(v)) usage(s"invalid --job '$v'")
        job = v; rest = t
      case other :: _ => usage(s"unknown argument '$other'")
      case Nil => ()
    }
    Args(mode, job)
  }

  private[graft] def schedule(env: Map[String, String]): Seq[java.time.LocalTime] =
    env.get("SCHEDULER_RUN_TIMES_UTC") match {
      case Some(raw) =>
        val times = raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
          .map { s =>
            try java.time.LocalTime.parse(s)
            catch { case _: java.time.format.DateTimeParseException =>
              throw new RuntimeException(
                s"SCHEDULER_RUN_TIMES_UTC: cannot parse '$s' as HH:MM")
            }
          }
        if (times.isEmpty) throw new RuntimeException(
          "SCHEDULER_RUN_TIMES_UTC must list at least one HH:MM slot")
        times
      case None => graft.incremental.Scheduler.defaultRunTimes
    }

  /** Staff/group snapshot slot (reference config.py:170-175): explicit
    * `SCHEDULER_STAFF_GROUP_TIME_UTC`, else the first main run slot.
    */
  private[graft] def staffGroupSchedule(env: Map[String, String],
      main: Seq[java.time.LocalTime]): Seq[java.time.LocalTime] =
    env.get("SCHEDULER_STAFF_GROUP_TIME_UTC").map(_.trim).filter(_.nonEmpty)
      .map { s =>
        try Seq(java.time.LocalTime.parse(s))
        catch { case _: java.time.format.DateTimeParseException =>
          throw new RuntimeException(
            s"SCHEDULER_STAFF_GROUP_TIME_UTC: cannot parse '$s' as HH:MM")
        }
      }
      .getOrElse(Seq(main.min))

  private[graft] def runnerConfig(env: Map[String, String],
      api: ApiConfig.Api): BatchRunner.Config = {
    def longEnv(key: String, default: Long): Long =
      env.get(key).map { raw =>
        try raw.trim.toLong
        catch { case _: NumberFormatException =>
          throw new RuntimeException(s"$key must be an integer, got '$raw'")
        }
      }.getOrElse(default)
    BatchRunner.Config(
      warehouseDir = env.getOrElse("GRAFT_WAREHOUSE_DIR",
        throw new RuntimeException(
          "GRAFT_WAREHOUSE_DIR is required: the parquet warehouse root " +
            "the pipeline writes to")),
      tenants = api.accounts.map(_.tenant),
      overlapMs = longEnv("OVERLAP_MS", 180000L),
      daysIfEmpty = longEnv("DAYS_TO_FETCH_IF_EMPTY", 30L).toInt,
      sliceMs = api.timeSliceMs,
      minSliceMs = api.minSliceMs,
      pageSize = api.pageSize,
      limitRecords = env.get("LIMIT_RECORDS_PER_ENDPOINT")
        .map(_.trim.toInt).filter(_ > 0))
  }

  /** Testable core: everything effectful is injected. Returns a
    * process exit code (0 ok, 2 bad usage/config).
    */
  private[graft] def run(argv: Seq[String], env: Map[String, String],
      spark: SparkSession,
      fetcher: Option[PagedSource.DocFetcher] = None,
      snapshots: Option[BatchRunner.SnapshotFetcher] = None,
      now: () => java.time.Instant = () => java.time.Instant.now(),
      sleep: Long => Unit = s => Thread.sleep(s * 1000L),
      shouldStop: () => Boolean = () => false): Int = {
    val args =
      try parseArgs(argv)
      catch { case e: IllegalArgumentException =>
        System.err.println(e.getMessage); return 2 }
    val (runner, sched) =
      try {
        val api = ApiConfig.fromEnv(env)
        val cfg = runnerConfig(env, api)
        val f = fetcher.getOrElse(api.dispatchingFetcher)
        val s = snapshots.getOrElse(new HttpSnapshotFetcher(api.httpConfigFor))
        (new BatchRunner(spark, f, s, cfg), schedule(env))
      } catch { case e: RuntimeException =>
        System.err.println(s"config error: ${e.getMessage}"); return 2 }
    runner.bootstrap()
    args.mode match {
      case "daemon" =>
        runner.runLoop(sched, lastRun = None, shouldStop = shouldStop,
          sleep = sleep, now = now, reporting = true,
          staffGroupSchedule = Some(staffGroupSchedule(env, sched)))
        0
      case _ =>
        val at = now()
        val ms = at.toEpochMilli
        val selected =
          if (args.job == "all") Set("customer", "call", "staffgroup")
          else Set(args.job)
        if (selected("customer")) runner.runCustomer(ms)
        if (selected("call")) runner.runCall(ms)
        if (selected("staffgroup")) {
          // Once-mode slot guard (reference runner.py:986-999): skip
          // the snapshot when BOTH staff and group already completed
          // inside the current staff/group slot — the audit log's
          // `updated_at` (wall clock, like the reference's) vs the
          // slot boundary derived from the injected clock.
          val sg = staffGroupSchedule(env, sched)
          val slotStart = graft.incremental.Scheduler
            .previousOrCurrentScheduled(at, sg)
          val already = Seq("staff", "group").forall(t =>
            runner.checkpoints.getLastRunAny(t)
              .exists(ts => !ts.toInstant.isBefore(slotStart)))
          if (already)
            System.err.println(
              s"skipping staff/group snapshot; already completed for slot $slotStart")
          else runner.runStaffGroup()
        }
        // Post-job reporting refresh for the slot's VN7 civil date —
        // best-effort like the reference (runner.py:1006-1012): a
        // reporting failure must not fail an ingest that already
        // committed. `--job report` runs it as THE job (failures fatal).
        val vn7Date = at.atZone(java.time.ZoneOffset.ofHours(7)).toLocalDate
        if (args.job == "report") { runner.refreshReporting(vn7Date); 0 }
        else {
          try runner.refreshReporting(vn7Date)
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"reporting refresh failed (ingest already committed): " +
                s"${e.getMessage}")
          }
          0
        }
    }
  }

  def main(argv: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = Engine.local(cpus)
    val code =
      try run(argv.toIndexedSeq, sys.env, spark)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
