package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-transition extraction — the incremental form of the
  * batch transition matrix (`Relational.q58Transitions`): per user, the
  * state is just the LAST event type (one string per key), and every
  * arriving event emits exactly one (prev → cur) transition row, with
  * '_start' for a user's first event. Downstream aggregation (the
  * matrix itself) is an ordinary streaming groupBy count or a batch
  * roll-up of the emitted rows.
  *
  * Contracts:
  *  - arrivals are sequenced per user by (ts, event_id) WITHIN a batch
  *    and chained across batches through the stored last type — fed
  *    in-order batches reproduce the batch matrix row for row
  *    (spec-pinned); out-of-order delivery ACROSS batches follows
  *    arrival order, the streaming trade every last-value state makes;
  *  - exactly one output row per input event (the bench line's exact
  *    count model);
  *  - state per user is one string; `idleTimeout` evicts cold users
  *    (a returning user restarts from '_start' — documented trade). */
object StreamingTransitions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)
  case class Transition(user_id: Long, prev_type: String, cur_type: String)

  /** THE µs-from-Timestamp conversion for the whole streaming family
    * (funnel, attribution, bench models): floorDiv seconds then add the
    * sub-second nanos — matches `unix_micros` for pre-1970 values too,
    * so the streaming/batch equivalence specs compare like for like.
    * One definition; any drift (e.g. a truncating `/`) would silently
    * split the streaming family from its batch gates. */
  private[graft] def tsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def transitionUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[Ev],
      state: GroupState[String]): Iterator[Transition] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      var prev = state.getOption.getOrElse("_start")
      val out = arrivals.map { e =>
        val t = Transition(user, prev, e.event_type)
        prev = e.event_type
        t
      }
      state.update(prev)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.iterator
    }

  def transitions(
      events: Dataset[Ev],
      idleTimeout: Option[FiniteDuration] = None): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        transitionUpdate(idleTimeout))
  }
}
