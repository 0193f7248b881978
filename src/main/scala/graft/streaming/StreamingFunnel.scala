package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the incremental form of the batch
  * funnel (`Relational.q50Funnel`) and the product-analytics family's
  * keyed-state member: per user, GroupState holds the three funnel
  * timestamps (first view, first click after that view, first purchase
  * after that click) and every stage ADVANCEMENT emits exactly one row,
  * so a live conversion dashboard is an ordinary streaming count over
  * the emitted stages. This is the reference's flagship semantics
  * (keyed value state + TTL eviction, MapWithState.java:51-393) driving
  * a real product query.
  *
  * Stages and their batch-q50 counterparts:
  *  - `user`                 — first event ever seen (q50 `n_users`)
  *  - `view`                 — first view (q50 `n_viewed`)
  *  - `click_after_view`     — first click strictly after the first view
  *  - `purchase_after_click` — first purchase strictly after that click
  *
  * Contracts:
  *  - arrivals are sequenced per user by (ts, event_id) within a batch
  *    and chained across batches through the stored timestamps; an
  *    in-event-time-order feed reproduces batch q50's cohort counts
  *    row for row (spec-pinned), because each "first X after Y" is
  *    resolved in global time order exactly as the batch min() does;
  *  - at most 4 output rows per user over the stream's lifetime, and
  *    Σ stage rows == Σ q50 cohort counters (the bench line's exact
  *    count model);
  *  - state per user is three longs (µs timestamps, −1 = unreached) —
  *    bounded however long the stream runs;
  *  - `idleTimeout` evicts cold users two-stage (the MapWithStateTTL
  *    discipline): a user returning after eviction restarts the funnel
  *    and re-emits stages — the documented trade every TTL'd
  *    exactly-once-per-key contract makes. Completed funnels (all
  *    three timestamps set) emit nothing further even without eviction.
  */
object StreamingFunnel {

  /** Event envelope — shared with [[StreamingTransitions]] (same feed,
    * same per-user sequencing contract). */
  type Ev = StreamingTransitions.Ev

  /** Three µs timestamps, −1 = stage not reached. State existence
    * itself encodes "user seen". */
  case class FunnelState(tv: Long, tc: Long, tp: Long)

  case class StageAdvance(user_id: Long, stage: String, ts: java.sql.Timestamp)

  private def micros(t: java.sql.Timestamp): Long =
    StreamingTransitions.tsMicros(t)

  private[streaming] def funnelUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[StageAdvance] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val held = state.getOption
      var st = held.getOrElse(FunnelState(-1L, -1L, -1L))
      val out = Seq.newBuilder[StageAdvance]
      if (held.isEmpty && arrivals.nonEmpty)
        out += StageAdvance(user, "user", arrivals.head.ts)
      arrivals.foreach { e =>
        val us = micros(e.ts)
        e.event_type match {
          case "view" if st.tv < 0 =>
            st = st.copy(tv = us); out += StageAdvance(user, "view", e.ts)
          case "click" if st.tv >= 0 && us > st.tv && st.tc < 0 =>
            st = st.copy(tc = us)
            out += StageAdvance(user, "click_after_view", e.ts)
          case "purchase" if st.tc >= 0 && us > st.tc && st.tp < 0 =>
            st = st.copy(tp = us)
            out += StageAdvance(user, "purchase_after_click", e.ts)
          case _ => ()
        }
      }
      // write state only on change (the StreamingSemanticDedup rule):
      // completed or stalled funnels stop churning the state store
      if (held.isEmpty || held.get != st) state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Per-session funnel state for [[sessionStages]]: `seen` marks that
    * this session's `session` stage row was already emitted (the
    * default-state reset a TTL gap performs clears it — a new session
    * announces itself). */
  case class SessFunnel(seen: Boolean, tv: Long, tc: Long, tp: Long)

  /** One event's stage advancements (0–2 rows: a session's first event
    * emits `session`, possibly plus its own stage). */
  case class StageHits(user_id: Long, stages: Seq[String])

  /** EVENT-TIME SESSION FUNNEL — the funnel on TTL-eviction semantics:
    * a gap > `ttl` in a user's EVENT time restarts the funnel, so every
    * session converts (or not) independently. Built directly on the
    * flagship [[MapWithStateTTL.eventTime]] operator (watermark-driven
    * state cleanup; the caller puts `.withWatermark` on the source), and
    * the batch twin is `Relational.q63SessionFunnel` — spec-pinned equal
    * cohort counters, which is the streaming/batch equivalence the
    * reference's MapWithState PoC was after. Emitted stages: `session`,
    * `view`, `click_after_view`, `purchase_after_click`. */
  def sessionStages(
      events: Dataset[Ev],
      ttl: scala.concurrent.duration.FiniteDuration)
      : Dataset[StageHits] = {
    val spark = events.sparkSession
    import spark.implicits._
    MapWithStateTTL.eventTime(
      events, ttl, defaultState = SessFunnel(false, -1L, -1L, -1L))(
      _.user_id,
      e => StreamingTransitions.tsMicros(e.ts),
      _.event_id) { (user, e, st0) =>
      val us = StreamingTransitions.tsMicros(e.ts)
      val out = Seq.newBuilder[String]
      var st = st0
      if (!st.seen) { out += "session"; st = st.copy(seen = true) }
      e.event_type match {
        case "view" if st.tv < 0 =>
          st = st.copy(tv = us); out += "view"
        case "click" if st.tv >= 0 && us > st.tv && st.tc < 0 =>
          st = st.copy(tc = us); out += "click_after_view"
        case "purchase" if st.tc >= 0 && us > st.tc && st.tp < 0 =>
          st = st.copy(tp = us); out += "purchase_after_click"
        case _ => ()
      }
      (StageHits(user, out.result()), st)
    }
  }

  case class ConversionLag(user_id: Long, lag_us: Long)

  private[streaming] def lagUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[ConversionLag] =
    funnelUpdate(idleTimeout)(user, it, state)
      .filter(_.stage == "click_after_view")
      .map { adv =>
        // tc was just committed; tv is in the (freshly updated) state
        ConversionLag(user, state.get.tc - state.get.tv)
      }

  /** FIRST-CONVERSION LATENCY stream — q56's streaming twin: exactly
    * one row per converting user at the moment the click_after_view
    * stage is reached, carrying `tc − tv` in µs (the same min-based
    * pair batch q56 aggregates into cohort percentiles). Downstream, a
    * cohort percentile dashboard is a [[StreamingQuantiles]]-style
    * sketch or a batch roll-up of the emitted lags. Shares
    * [[funnelUpdate]]'s state machine (three longs per user, same
    * eviction trade). */
  def conversionLags(
      events: Dataset[Ev],
      idleTimeout: Option[FiniteDuration] = None): Dataset[ConversionLag] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        lagUpdate(idleTimeout))
  }

  /** Stage-advancement stream for a keyed event stream. Downstream
    * `groupBy(cohort, stage).count()` is the live q50 dashboard. */
  def stages(
      events: Dataset[Ev],
      idleTimeout: Option[FiniteDuration] = None): Dataset[StageAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        funnelUpdate(idleTimeout))
  }
}
