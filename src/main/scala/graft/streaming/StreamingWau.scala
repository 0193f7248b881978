package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ROLLING-WAU — the incremental form of the batch
  * trailing-window distinct (`Relational.q64RollingWau`): per user, the
  * state is a (baseDay, 64-bit coverage bitmask) pair recording which
  * trailing-window days this user already counts toward; each new
  * activity day emits one `WauHit` for every window day it NEWLY
  * covers (day d serves wdays d..d+w−1), so `groupBy(wday).count()`
  * over the hits IS the live WAU curve — each (user, wday) pair counts
  * exactly once however many events arrive.
  *
  * Contracts:
  *  - an in-event-time-order feed reproduces batch q64 day-for-day on
  *    the batch's calendar spine (spec-pinned; the stream also emits
  *    trailing wdays beyond the last observed day — the "tomorrow's
  *    dashboard already counts today's actives" semantics a live curve
  *    wants, which the batch spine simply truncates);
  *  - state per user is two longs, rolling: the mask REBASES forward
  *    as days advance, so state never grows with history length;
  *  - out-of-order days behind the rebased window are DROPPED (they
  *    are beyond watermark by construction in an in-order feed);
  *  - `idleTimeout` evicts cold users losslessly once TTL ≥ the window
  *    span (a fully-expired mask can never emit again). */
object StreamingWau {

  case class WauState(baseDay: Long, mask: Long)

  case class WauHit(user_id: Long, wday: Long)

  private[streaming] def day(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 86400000L)

  /** Pure per-activity-day mask roll: rebase `st` so [d, d+w) fits the
    * 64-bit mask (bits falling off the left edge are fully expired
    * coverage), then set the uncovered window bits. Returns (new
    * state, newly covered wdays ascending, late) — `late` means d fell
    * behind the rebased window (the beyond-watermark drop). Shared by
    * [[wauUpdate]] and the stickiness twin's two-mask state. */
  private[streaming] def cover(
      st0: WauState, d: Long, windowDays: Int): (WauState, Seq[Long], Boolean) = {
    var st = st0
    if (d + windowDays - 1 - st.baseDay >= 64) {
      val shift = d + windowDays - 64 - st.baseDay
      st = WauState(st.baseDay + shift,
        if (shift >= 64) 0L else st.mask >>> shift)
    }
    if (d >= st.baseDay) {
      val out = Seq.newBuilder[Long]
      var k = d
      while (k < d + windowDays) {
        val bit = k - st.baseDay
        if (bit < 64 && (st.mask & (1L << bit)) == 0L) {
          st = st.copy(mask = st.mask | (1L << bit))
          out += k
        }
        k += 1
      }
      (st, out.result(), false)
    } else (st, Nil, true)
  }

  private[streaming] def wauUpdate(
      windowDays: Int, idleTimeout: Option[FiniteDuration],
      lateDrops: Option[org.apache.spark.util.LongAccumulator] = None)(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[WauState]): Iterator[WauHit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val held = state.getOption
      var st = held.getOrElse(WauState(day(arrivals.head.ts), 0L))
      val out = Seq.newBuilder[WauHit]
      arrivals.foreach { e =>
        val (st2, covered, late) = cover(st, day(e.ts), windowDays)
        st = st2
        covered.foreach(k => out += WauHit(user, k))
        // a late drop is correct per the watermark contract, but a live
        // dashboard should SEE the loss: count it on the side channel
        // (the DQ monitor's visibility discipline)
        if (late) lateDrops.foreach(_.add(1L))
      }
      if (held.isEmpty || held.get != st) state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** WAU-hit stream; `groupBy(wday).count()` is the live q64 curve.
    * `lateDrops` (optional driver-registered accumulator) counts the
    * activity days dropped for arriving behind the rebased window —
    * zero on an in-order feed; a live dashboard alarms on it growing.
    * (Accumulator semantics: task retries may over-count — fine for a
    * loss-visibility metric, by design not part of the result.) */
  def hits(
      events: Dataset[StreamingTransitions.Ev],
      windowDays: Int = graft.operators.Relational.WauWindowDays,
      idleTimeout: Option[FiniteDuration] = None,
      lateDrops: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[WauHit] = {
    require(windowDays >= 1 && windowDays <= 32,
      "windowDays must fit the rolling 64-bit mask with room to rebase")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        wauUpdate(windowDays, idleTimeout, lateDrops))
  }
}
