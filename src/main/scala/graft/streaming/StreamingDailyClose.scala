package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DAILY-CLOSE extraction — the live side of the batch
  * gap-fill snapshot build (`Relational.q74GapFill`): per user the
  * state is the OPEN day's running close (day, event-time µs,
  * event_id, cents — the same (us, event_id) argmax the batch packs
  * into `max(struct(...))`), and when a user's day ADVANCES the
  * closed day emits exactly one `CloseRow`. Downstream, forward-fill
  * over the calendar spine is a batch join away — the stream's job is
  * the exactly-once close feed.
  *
  * Contracts (the StreamingTransitions family rules):
  *  - arrivals are sequenced per user by (ts, event_id) within a
  *    batch and chained across batches through the stored open day —
  *    in-order feeds reproduce the batch daily-close frame row for
  *    row on every CLOSED day (spec-pinned; the still-open last day
  *    of each user has not closed and is withheld, exactly as a live
  *    feed must);
  *  - exactly `(distinct activity days per user) − 1` rows per user —
  *    the bench line's exact count model;
  *  - state per user is four longs, bounded regardless of history;
  *  - `idleTimeout` evicts cold users: the documented trade is that
  *    an evicted user's open day never emits its close (a returning
  *    user starts a fresh open day), mirroring the WAU family's
  *    lossless-once-TTL-spans-the-window reasoning NOT holding here —
  *    callers that need every close flush via the batch path. */
object StreamingDailyClose {

  /** Open-day state: the running (us, event_id) argmax for `day`. */
  case class OpenDay(day: Long, us: Long, event_id: Long, cents: Long)

  case class CloseRow(user_id: Long, day: Long, close_cents: Long)

  private def day(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 86400000L)

  private[streaming] def closeUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingProfile.PEv],
      state: GroupState[OpenDay]): Iterator[CloseRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e =>
        (StreamingTransitions.tsMicros(e.ts), e.event_id))
      var open = state.getOption.orNull
      val out = Seq.newBuilder[CloseRow]
      arrivals.foreach { e =>
        val d = day(e.ts)
        val us = StreamingTransitions.tsMicros(e.ts)
        if (open == null) open = OpenDay(d, us, e.event_id, e.cents)
        else if (d > open.day) {
          // the open day closes with its stored argmax value
          out += CloseRow(user, open.day, open.cents)
          open = OpenDay(d, us, e.event_id, e.cents)
        } else if (d == open.day &&
            (us > open.us || (us == open.us && e.event_id > open.event_id))) {
          open = OpenDay(d, us, e.event_id, e.cents)
        }
        // d < open.day: behind the open day — beyond-watermark drop on
        // an in-order feed, ignored (the closed day already emitted)
      }
      state.update(open)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Daily-close stream; each (user, closed day) emits exactly once. */
  def closes(
      events: Dataset[StreamingProfile.PEv],
      idleTimeout: Option[FiniteDuration] = None): Dataset[CloseRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        closeUpdate(idleTimeout))
  }
}
