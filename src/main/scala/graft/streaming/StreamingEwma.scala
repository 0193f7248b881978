package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Relational.{EwmaNum, EwmaDen, EwmaAnomalyPpm}

/** Streaming EWMA smoothing + band anomaly — the live side of the
  * batch smoothed-metric gate (`Relational.q75Ewma`), STACKED on the
  * daily-close feed (`StreamingDailyClose.closes`): per user the
  * state is the last smoothed value and its day (two longs), and
  * every arriving close emits exactly one smoothed row with the
  * 1.5×-band anomaly flag. The stack is the q69 paths→aggregate
  * precedent: both stages are append-mode flatMapGroupsWithState on
  * the same user key, so the close feed never re-shuffles.
  *
  * Contracts (the StreamingTransitions family rules):
  *  - closes arrive day-ascending per user (the upstream stage emits
  *    them that way on an in-order feed) and are re-sorted by day
  *    within a batch; a close at or behind the stored day is a replay
  *    and is dropped (each (user, day) smooths exactly once);
  *  - the recurrence is the batch gate's BIGINT fixed-point fold —
  *    `s₀ = c₀; sₜ = (EwmaNum·cₜ + (EwmaDen−EwmaNum)·sₜ₋₁) div
  *    EwmaDen` — so streamed rows equal batch q75 rows on every
  *    closed day bit for bit (spec-pinned; the still-open last day
  *    has not closed upstream and is withheld);
  *  - exactly one output row per input close (the bench line's exact
  *    count model composes with the daily-close one:
  *    `Σ_users (distinct days − 1)`);
  *  - state per user is two longs, bounded regardless of history;
  *    `state.update` is skipped when nothing changed (RocksDB churn
  *    rule); `idleTimeout` evicts cold users — an evicted user's
  *    smooth restarts from their next close (documented trade, as in
  *    the daily-close stage). */
object StreamingEwma {

  /** Last smoothed value and the day it belongs to. */
  case class EwmaState(day: Long, s: Long)

  case class EwmaRow(user_id: Long, day: Long, close_cents: Long,
      ewma_cents: Long, anomaly: Long)

  private[streaming] def ewmaUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingDailyClose.CloseRow],
      state: GroupState[EwmaState]): Iterator[EwmaRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(_.day)
      var st = state.getOption.orNull
      val st0 = st
      val out = Seq.newBuilder[EwmaRow]
      arrivals.foreach { c =>
        if (st == null) {
          st = EwmaState(c.day, c.close_cents)
          out += EwmaRow(user, c.day, c.close_cents, c.close_cents, 0L)
        } else if (c.day > st.day) {
          val prev = st.s
          // closes are non-negative, so Long / matches the gate's div
          val s2 = (EwmaNum * c.close_cents + (EwmaDen - EwmaNum) * prev) /
            EwmaDen
          val devPpm = math.abs(c.close_cents - prev) * 1000000L /
            math.max(prev, 1L)
          out += EwmaRow(user, c.day, c.close_cents, s2,
            if (devPpm > EwmaAnomalyPpm) 1L else 0L)
          st = EwmaState(c.day, s2)
        }
        // c.day <= st.day: replayed/duplicate close — already smoothed
      }
      if (st ne st0) state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Smoothed-close stream; one row per (user, closed day). */
  def ewma(
      closes: Dataset[StreamingDailyClose.CloseRow],
      idleTimeout: Option[FiniteDuration] = None): Dataset[EwmaRow] = {
    val spark = closes.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    closes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        ewmaUpdate(idleTimeout))
  }
}
