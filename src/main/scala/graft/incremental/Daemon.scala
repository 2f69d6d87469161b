package graft.incremental

import java.time.{Duration, Instant, LocalTime}

/** The daemon tick loop over the [[Scheduler]] slot arithmetic —
  * completing SURVEY.md §2.9 I7 (reference runner.py:876-893 boot-time
  * catch-up, runner.py:937-965 loop mode, runner.py:986-999 once-mode
  * missed-slot check).
  *
  * Semantics, per the reference:
  *  - On boot, if no successful run falls inside the current slot
  *    window, the job fires immediately (missed-slot catch-up) — a
  *    daemon restarted at 03:10 with a 02:30 slot it never ran must not
  *    wait until the next slot.
  *  - Between slots, sleep is bounded by `maxTickSeconds` (≤300 s, like
  *    the reference's capped sleep) so shutdown requests are noticed
  *    promptly and clock jumps can't oversleep a slot.
  *  - A failed run backs off `errorBackoffSeconds` (10 s) and retries
  *    within the same slot; the checkpoint only advances on success
  *    (forward-only, same rule as [[UpdateLog]] commit ordering).
  *
  * The clock, sleeper, and stop predicate are injected: the loop is
  * unit-tested against a simulated clock, and a deployment can wire a
  * real `Thread.sleep` / shutdown flag without touching the logic.
  * Driver-side by design — the work it schedules (the incremental batch
  * runs) is what executes on the cluster, the tick loop itself is
  * bookkeeping.
  */
object Daemon {

  final case class Config(
      schedule: Seq[LocalTime] = Scheduler.defaultRunTimes,
      maxTickSeconds: Long = 300,
      errorBackoffSeconds: Long = 10) {
    require(schedule.nonEmpty, "Schedule cannot be empty")
    require(maxTickSeconds > 0 && maxTickSeconds <= 300,
      "tick must be positive and <= 300s (shutdown latency bound)")
  }

  /** One observed loop action, for specs and operational logging. */
  sealed trait Event
  final case class Ran(at: Instant) extends Event
  final case class Failed(at: Instant, error: Throwable) extends Event
  final case class Slept(seconds: Long) extends Event

  /** How many trailing events [[run]] retains: a daemon that never
    * stops must not grow heap one Slept per tick forever, so the
    * in-memory log is a ring of the most recent events; stream the
    * full history through `onEvent` (e.g. into the audit log) when it
    * must be durable.
    */
  val MaxRetainedEvents = 256

  /** Run `job` once per schedule slot until `shouldStop`.
    *
    * @param lastRun    persisted instant of the last successful run
    *                   (None on cold start → immediate catch-up run)
    * @param now        clock
    * @param sleep      sleeper (seconds); simulated clocks advance here
    * @param shouldStop polled once per iteration and between retries
    * @param job        the slot work, given the slot's fire time
    * @param onEvent    called for EVERY event as it happens (logging /
    *                   audit hook); the returned log keeps only the
    *                   last [[MaxRetainedEvents]]
    * @return           the trailing event log (runs, failures, sleeps)
    *                   in order, with the final successful-run
    *                   checkpoint to persist
    */
  def run(cfg: Config, lastRun: Option[Instant], now: () => Instant,
      sleep: Long => Unit, shouldStop: () => Boolean,
      job: Instant => Unit,
      onEvent: Event => Unit = _ => ()): (Seq[Event], Option[Instant]) = {
    val events = scala.collection.mutable.ArrayDeque.empty[Event]
    def emit(e: Event): Unit = {
      onEvent(e)
      events += e
      if (events.size > MaxRetainedEvents) events.removeHead()
    }
    var last = lastRun
    while (!shouldStop()) {
      val t = now()
      if (!Scheduler.ranInCurrentSlot(last, t, cfg.schedule)) {
        try {
          job(t)
          emit(Ran(t))
          // Forward-only: a job that somehow reports an older clock
          // must not rewind the checkpoint.
          if (last.forall(_.isBefore(t))) last = Some(t)
        } catch {
          case scala.util.control.NonFatal(e) =>
            emit(Failed(t, e))
            emit(Slept(cfg.errorBackoffSeconds))
            sleep(cfg.errorBackoffSeconds)
        }
      } else {
        val next = Scheduler.nextScheduled(t, cfg.schedule)
        val until = math.max(1L, Duration.between(t, next).toSeconds)
        val tick = math.min(cfg.maxTickSeconds, until)
        emit(Slept(tick))
        sleep(tick)
      }
    }
    (events.toSeq, last)
  }
}
