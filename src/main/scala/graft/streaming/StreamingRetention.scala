package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming cohort retention — the incremental form of the batch
  * retention triangle (`Relational.q57Retention`): per user, GroupState
  * holds the FIRST active epoch-week (the user's cohort) plus a bitmask
  * of the horizon weeks already counted, and each (user, week) pair
  * emits exactly ONE (cohort, k) hit the first time it is seen — the
  * "live retention triangle": `groupBy(wk0, k).count()` over the
  * emitted hits IS q57, continuously.
  *
  * Contracts:
  *  - an in-event-time-order feed reproduces batch q57 row for row
  *    (spec-pinned): the first event's week is the min week, so the
  *    stored cohort equals the batch `min(wk)`;
  *  - at most `horizon + 1` output rows per user ever; Σ hits ==
  *    Σ q57 `n_users` (the bench line's exact count model);
  *  - state per user is two longs (cohort week + seen-k bitmask) —
  *    bounded regardless of stream length or user activity;
  *  - weeks are UTC epoch-weeks (`floor(days_since_epoch / 7)`),
  *    matching the batch `datediff(to_date(ts), '1970-01-01') div 7`
  *    under the repo's UTC-session contract;
  *  - `idleTimeout` evicts cold users; a user returning after eviction
  *    starts a NEW cohort at their return week — the documented trade,
  *    and for retention specifically the honest one: horizon weeks
  *    after the cohort week the state is dead weight, so the TTL
  *    should be ≥ the horizon span and eviction after it is lossless.
  */
object StreamingRetention {

  /** Cohort week + bitmask of already-counted k offsets. */
  case class RetState(wk0: Long, seen: Long)

  case class RetentionHit(user_id: Long, wk0: Long, k: Long)

  val DefaultHorizon = 3

  private def week(t: java.sql.Timestamp): Long =
    Math.floorDiv(Math.floorDiv(t.getTime, 86400000L), 7L)

  private[streaming] def retentionUpdate(
      horizon: Int, idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[RetState]): Iterator[RetentionHit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val held = state.getOption
      var st = held.getOrElse(RetState(week(arrivals.head.ts), 0L))
      val out = Seq.newBuilder[RetentionHit]
      arrivals.foreach { e =>
        val k = week(e.ts) - st.wk0
        if (k >= 0 && k <= horizon && (st.seen & (1L << k)) == 0L) {
          st = st.copy(seen = st.seen | (1L << k))
          out += RetentionHit(user, st.wk0, k)
        }
      }
      if (held.isEmpty || held.get != st) state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Retention-hit stream for a keyed event stream; downstream
    * `groupBy(wk0, k).count()` is the live q57 triangle. */
  def hits(
      events: Dataset[StreamingTransitions.Ev],
      horizon: Int = DefaultHorizon,
      idleTimeout: Option[FiniteDuration] = None): Dataset[RetentionHit] = {
    // the seen-k bitmask is one long; horizon 63 would make `1L << k`
    // wrap for late weeks (JVM shifts by k & 63) and silently
    // double-count — same guard discipline as StreamingWau's window
    require(horizon >= 0 && horizon <= 62,
      "retention horizon must fit the 64-bit seen-week bitmask (0..62)")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        retentionUpdate(horizon, idleTimeout))
  }
}
