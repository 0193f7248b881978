package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming user-journey paths — the incremental form of the batch
  * top-paths query (`Relational.q69PathTopk`): per user, the state is
  * the last TWO event types (two strings), and every event from the
  * third on emits exactly one (e1, e2, e3) path row — the sliding
  * 3-gram of the user's journey. Downstream
  * `groupBy(e1,e2,e3).agg(count, countDistinct(user_id))` over the
  * emitted hits IS q69's pre-limit aggregate, continuously.
  *
  * Contracts (the StreamingTransitions family rules):
  *  - arrivals are sequenced per user by (ts, event_id) within a batch
  *    and chained across batches through the stored suffix — in-order
  *    batches reproduce the batch 3-gram set row for row (spec-pinned);
  *  - exactly `max(0, n_user_events − 2)` output rows per user (the
  *    bench line's exact count model);
  *  - state per user is two strings, bounded regardless of history;
  *    `idleTimeout` evicts cold users (a returning user restarts the
  *    3-gram window — the documented trade, as in transitions). */
object StreamingPaths {

  /** Last two event types: `p2` = last-but-one, `p1` = last. */
  case class PathState(p2: String, p1: String)

  case class PathHit(user_id: Long, e1: String, e2: String, e3: String)

  private[streaming] def pathUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[PathState]): Iterator[PathHit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e =>
        (StreamingTransitions.tsMicros(e.ts), e.event_id))
      var st = state.getOption.getOrElse(PathState(null, null))
      val out = Seq.newBuilder[PathHit]
      arrivals.foreach { e =>
        if (st.p2 != null) out += PathHit(user, st.p2, st.p1, e.event_type)
        st = PathState(st.p1, e.event_type)
      }
      state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Path-hit stream; `groupBy(e1,e2,e3).agg(count, countDistinct)` is
    * the live q69 pre-limit aggregate. */
  def paths(
      events: Dataset[StreamingTransitions.Ev],
      idleTimeout: Option[FiniteDuration] = None): Dataset[PathHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        pathUpdate(idleTimeout))
  }
}
