package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming STICKINESS (DAU/WAU) — the incremental form of the batch
  * ratio (`Relational.q72Stickiness`), and the composite form of
  * [[StreamingWau]]: per user the state carries TWO rolling coverage
  * masks over one shared pass — the trailing-`windowDays` WAU mask and
  * the 1-day DAU mask — so both curves come out of a single keyed
  * exchange instead of two stateful operators over the same feed (the
  * two-mask state is 4 longs, still bounded regardless of history).
  *
  * Each activity day emits one `StickHit(wday, is_day = false)` per
  * NEWLY covered window day (exactly [[StreamingWau]]'s hit contract)
  * plus one `StickHit(d, is_day = true)` the first time the user is
  * active on day d. The live curve is then
  * `groupBy(wday): dau = count(is_day), wau = count(!is_day),
  * stickiness = dau/wau` — spec-pinned day-for-day against batch q72
  * on the batch calendar spine, including the integer-ppm ratio.
  *
  * Contracts inherited from the WAU mask ([[StreamingWau.cover]]):
  * in-order feeds reproduce the batch exactly; out-of-order days
  * behind the rebased window are dropped onto the `lateDrops` side
  * channel; `idleTimeout` evicts cold users losslessly once
  * TTL ≥ the window span. */
object StreamingStickiness {

  /** Two rolling masks: `wau` covers [d, d+w), `dau` covers [d, d+1). */
  case class StickState(wau: StreamingWau.WauState, dau: StreamingWau.WauState)

  case class StickHit(user_id: Long, wday: Long, is_day: Boolean)

  private[streaming] def stickUpdate(
      windowDays: Int, idleTimeout: Option[FiniteDuration],
      lateDrops: Option[org.apache.spark.util.LongAccumulator] = None)(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[StickState]): Iterator[StickHit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val held = state.getOption
      val d0 = StreamingWau.day(arrivals.head.ts)
      var st = held.getOrElse(
        StickState(StreamingWau.WauState(d0, 0L), StreamingWau.WauState(d0, 0L)))
      val out = Seq.newBuilder[StickHit]
      arrivals.foreach { e =>
        val d = StreamingWau.day(e.ts)
        val (w2, coveredW, lateW) = StreamingWau.cover(st.wau, d, windowDays)
        // the two masks rebase at different offsets (wauBase = d'+w−64,
        // dauBase = d'−63), so a day late for the WAU mask can still sit
        // inside the DAU mask's band — covering it there would emit a
        // dau hit with no matching wau coverage and push the live ratio
        // past 1e6. A late event is therefore dropped ATOMICALLY from
        // both curves: one side-channel count, neither mask touched.
        if (lateW) lateDrops.foreach(_.add(1L))
        else {
          val (a2, coveredD, _) = StreamingWau.cover(st.dau, d, 1)
          st = StickState(w2, a2)
          coveredW.foreach(k => out += StickHit(user, k, is_day = false))
          coveredD.foreach(k => out += StickHit(user, k, is_day = true))
        }
      }
      if (held.isEmpty || held.get != st) state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Stickiness-hit stream; `groupBy(wday): count(is_day) /
    * count(!is_day)` is the live DAU/WAU curve. */
  def hits(
      events: Dataset[StreamingTransitions.Ev],
      windowDays: Int = graft.operators.Relational.WauWindowDays,
      idleTimeout: Option[FiniteDuration] = None,
      lateDrops: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[StickHit] = {
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
        stickUpdate(windowDays, idleTimeout, lateDrops))
  }
}
