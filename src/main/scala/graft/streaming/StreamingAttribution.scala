package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the incremental form of the batch
  * window (`Relational.q62Attribution`): per user, the state is the
  * LAST marketing touch (type + µs, one tiny value — the smallest
  * state in the product family), and every purchase emits exactly one
  * attribution row against the touch held at that moment, with the
  * same 7-day lookback and `none` fallback as the batch query.
  *
  * Contracts:
  *  - arrivals sequenced per user by (ts, event_id) within a batch and
  *    chained across batches through the stored touch — an in-order
  *    feed reproduces batch q62's strictly-before window decision for
  *    every purchase (same-µs earlier-event_id touches count, the
  *    purchase itself never does), spec-pinned row for row;
  *  - exactly one output row per purchase event (the bench line's
  *    exact count model);
  *  - `idleTimeout` evicts cold users; a returning user's first
  *    purchase before any new touch reports `none` — for attribution
  *    a TTL ≥ the lookback window is lossless by construction (an
  *    evicted touch could only have produced `none` anyway). */
object StreamingAttribution {

  /** Last marketing touch: event type + µs timestamp. */
  case class Touch(t_type: String, t_us: Long)

  case class AttributionHit(user_id: Long, attribution: String, lag_s: Long)

  val Marketing: Set[String] = Set("view", "click")

  private def micros(t: java.sql.Timestamp): Long =
    StreamingTransitions.tsMicros(t)

  private[streaming] def attributionUpdate(
      lookbackUs: Long, idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[Touch]): Iterator[AttributionHit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val held = state.getOption
      var touch = held.orNull
      val out = Seq.newBuilder[AttributionHit]
      arrivals.foreach { e =>
        val us = micros(e.ts)
        if (e.event_type == "purchase") {
          val hit =
            if (touch == null || us - touch.t_us > lookbackUs)
              AttributionHit(user, "none", 0L)
            else AttributionHit(user, touch.t_type,
              Math.floorDiv(us - touch.t_us, 1000000L))
          out += hit
        }
        if (Marketing(e.event_type)) touch = Touch(e.event_type, us)
      }
      // no-op state-write discipline: purchases alone never churn the store
      if (touch != null && !held.contains(touch)) state.update(touch)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Attribution-hit stream; `groupBy(attribution).count()` is the live
    * q62 conversion report. */
  def hits(
      events: Dataset[StreamingTransitions.Ev],
      lookbackUs: Long = graft.operators.Relational.AttributionLookbackUs,
      idleTimeout: Option[FiniteDuration] = None): Dataset[AttributionHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        attributionUpdate(lookbackUs, idleTimeout))
  }
}
