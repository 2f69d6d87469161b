package graft

import java.time.{Instant, LocalTime}
import graft.incremental.{Daemon, Scheduler}
import org.scalatest.funsuite.AnyFunSuite

/** Simulated-clock tests for the daemon tick loop (reference
  * runner.py:876-999 semantics). No Spark needed — the loop is pure
  * driver bookkeeping.
  */
class DaemonSpec extends AnyFunSuite {

  private val sched = Seq(LocalTime.of(2, 30), LocalTime.of(11, 0))
  private val cfg = Daemon.Config(schedule = sched)

  /** Harness: clock starts at `start`, sleep(s) advances it, loop stops
    * after `maxEvents` observed events (safety bound included).
    */
  private def drive(start: Instant, lastRun: Option[Instant],
      maxRuns: Int, failFirst: Int = 0) = {
    var t = start
    var runs = 0
    var fails = failFirst
    val (events, ck) = Daemon.run(cfg, lastRun,
      now = () => t,
      sleep = s => t = t.plusSeconds(s),
      shouldStop = () => runs >= maxRuns,
      job = _ => {
        if (fails > 0) { fails -= 1; throw new RuntimeException("boom") }
        runs += 1
      })
    (events, ck, t)
  }

  test("boot inside an un-run slot fires the job immediately (catch-up)") {
    // Boot 03:10 UTC, slot 02:30 never ran → catch-up run at boot time.
    val boot = Instant.parse("2024-05-02T03:10:00Z")
    val (events, ck, _) = drive(boot, lastRun = None, maxRuns = 1)
    assert(events.head == Daemon.Ran(boot), s"expected immediate run, got $events")
    assert(ck.contains(boot))
  }

  test("already ran in the current slot: no re-run, sleeps toward next slot") {
    val boot = Instant.parse("2024-05-02T03:10:00Z")
    val ran = Instant.parse("2024-05-02T02:31:00Z") // inside 02:30 slot
    var t = boot
    var stops = 0
    val (events, ck) = Daemon.run(cfg, Some(ran),
      now = () => t, sleep = s => t = t.plusSeconds(s),
      shouldStop = () => { stops += 1; stops > 40 }, job = _ => fail("must not run"))
    assert(events.collect { case r: Daemon.Ran => r }.isEmpty)
    assert(ck.contains(ran))
    // Sleeps are capped at 300 s and never zero.
    val sleeps = events.collect { case Daemon.Slept(s) => s }
    assert(sleeps.nonEmpty && sleeps.forall(s => s >= 1 && s <= 300))
  }

  test("loop crosses into the next slot and fires exactly once per slot") {
    val boot = Instant.parse("2024-05-02T02:31:00Z")
    val ran = Instant.parse("2024-05-02T02:30:30Z")
    var t = boot
    var runs = 0
    // Full history via the onEvent hook: the returned log is a bounded
    // ring (MaxRetainedEvents) and this walk emits more ticks than it
    // retains — which is also what this asserts at the end.
    val all = Seq.newBuilder[Daemon.Event]
    val (retained, _) = Daemon.run(cfg, Some(ran),
      now = () => t, sleep = s => t = t.plusSeconds(s),
      shouldStop = () => runs >= 2, job = at => runs += 1,
      onEvent = all += _)
    val events = all.result()
    val fired = events.collect { case Daemon.Ran(at) => at }
    assert(fired.size == 2)
    // First fire happens at/after the 11:00 slot, second after next-day 02:30.
    assert(!fired(0).isBefore(Instant.parse("2024-05-02T11:00:00Z")))
    assert(!fired(1).isBefore(Instant.parse("2024-05-03T02:30:00Z")))
    // The 02:31 → 11:00 gap is walked in ≤300 s ticks, not one big sleep.
    val firstSleeps = events.takeWhile(!_.isInstanceOf[Daemon.Ran])
      .collect { case Daemon.Slept(s) => s }
    assert(firstSleeps.sum >= Scheduler.nextScheduled(boot, sched)
      .getEpochSecond - boot.getEpochSecond)
    assert(firstSleeps.forall(_ <= 300))
    // The in-memory log is bounded; the hook saw everything.
    assert(events.size > Daemon.MaxRetainedEvents)
    assert(retained.size == Daemon.MaxRetainedEvents)
    assert(retained == events.takeRight(Daemon.MaxRetainedEvents))
  }

  test("failed run backs off 10s, retries in-slot, checkpoint only on success") {
    val boot = Instant.parse("2024-05-02T03:10:00Z")
    val (events, ck, _) = drive(boot, lastRun = None, maxRuns = 1, failFirst = 2)
    val kinds = events.map {
      case _: Daemon.Failed => "F"
      case Daemon.Slept(s)  => s"S$s"
      case _: Daemon.Ran    => "R"
    }
    assert(kinds == Seq("F", "S10", "F", "S10", "R"), s"got $kinds")
    // Checkpoint reflects the successful attempt (20s after boot).
    assert(ck.contains(boot.plusSeconds(20)))
  }
}
