package graft.incremental

import java.time.{Instant, LocalDate, LocalTime, ZoneOffset}

/** Daily-slot scheduler arithmetic (reference runner.py:495-521,
  * config.py:160-176; SURVEY.md §2.9 I7). Pure functions over UTC
  * instants — the daemon loop around them is deployment-specific (cron /
  * driver loop / Structured Streaming trigger), the slot math is not.
  */
object Scheduler {

  /** Default daily UTC slots for the incremental jobs
    * (config.py:164-167): customer+call five times daily.
    */
  val defaultRunTimes: Seq[LocalTime] = Seq(
    LocalTime.of(2, 30), LocalTime.of(4, 0), LocalTime.of(6, 0),
    LocalTime.of(8, 0), LocalTime.of(11, 0))

  /** Next strictly-future slot (runner.py:499-509). */
  def nextScheduled(base: Instant, schedule: Seq[LocalTime]): Instant = {
    require(schedule.nonEmpty, "Schedule cannot be empty")
    val sorted = schedule.sorted
    val day = base.atZone(ZoneOffset.UTC).toLocalDate
    sorted.map(t => at(day, t)).find(_.isAfter(base))
      .getOrElse(at(day.plusDays(1), sorted.head))
  }

  /** Latest slot at-or-before base (runner.py:511-521). */
  def previousOrCurrentScheduled(base: Instant, schedule: Seq[LocalTime]): Instant = {
    require(schedule.nonEmpty, "Schedule cannot be empty")
    val sorted = schedule.sorted
    val day = base.atZone(ZoneOffset.UTC).toLocalDate
    sorted.reverse.map(t => at(day, t)).find(!_.isAfter(base))
      .getOrElse(at(day.minusDays(1), sorted.last))
  }

  /** Missed-slot check for once-mode catch-up (runner.py:986-999): has
    * the job already run in the current slot window?
    */
  def ranInCurrentSlot(lastRun: Option[Instant], now: Instant,
      schedule: Seq[LocalTime]): Boolean = {
    val slotStart = previousOrCurrentScheduled(now, schedule)
    lastRun.exists(lr => !lr.isBefore(slotStart))
  }

  /** Cold-start cutoff arithmetic (runner.py:59-64, 215-222): checkpoint
    * minus overlap for late-update re-reads (customer), raw checkpoint
    * for append-only feeds (call_log), N-day backfill when no checkpoint.
    */
  def cutoffMs(checkpoint: Option[Long], nowMs: Long,
      overlapMs: Long, daysIfEmpty: Int): Long =
    checkpoint match {
      case Some(ck) => ck - overlapMs
      case None     => nowMs - daysIfEmpty * 86400000L
    }

  private def at(day: LocalDate, t: LocalTime): Instant =
    day.atTime(t).toInstant(ZoneOffset.UTC)
}
