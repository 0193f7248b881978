package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.QuantileSketch

/** Streaming INTER-ARRIVAL monitOR — the live side of the batch gap
  * gate (`Relational.q76Interarrival`): a per-user gap emitter STACKED
  * onto a per-event-type quantile sketch, so every micro-batch emits
  * each touched type's current gap percentiles ("how long do users
  * idle before a purchase?", live). The stack is the q69/q75
  * discipline — both stages are append-mode flatMapGroupsWithState;
  * the first shuffles on user_id, the second on the ≤ |types| type
  * key.
  *
  * Semantics match the batch gate's shape: a gap is the µs since the
  * user's PREVIOUS action of any type, tagged with the CURRENT event's
  * type, over the total (us, event_id) per-user order (arrivals
  * re-sorted per batch; the family's in-order-feed contract applies
  * across batches). State: stage 1 keeps (last us, last event_id) —
  * two longs per user; stage 2 keeps one bounded
  * [[QuantileSketch]] per type — O(capacity·log(n/capacity))
  * regardless of stream length, EXACT nearest-rank below capacity
  * (spec-pinned against a driver model in the exact regime). */
object StreamingGaps {

  case class GapRow(event_type: String, gap_us: Long)

  case class GapSnapshot(event_type: String, batch: Long, n: Long,
      quantiles: Seq[Double])

  private[streaming] def gapUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingProfile.PEv],
      state: GroupState[(Long, Long)]): Iterator[GapRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e =>
        (StreamingTransitions.tsMicros(e.ts), e.event_id))
      var last = state.getOption.orNull
      val out = Seq.newBuilder[GapRow]
      arrivals.foreach { e =>
        val us = StreamingTransitions.tsMicros(e.ts)
        if (last != null) out += GapRow(e.event_type, us - last._1)
        last = (us, e.event_id)
      }
      if (arrivals.nonEmpty) state.update(last)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Per-user gaps, tagged with the current event's type. */
  def gaps(
      events: Dataset[StreamingProfile.PEv],
      idleTimeout: Option[FiniteDuration] = None): Dataset[GapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        gapUpdate(idleTimeout))
  }

  /** Per-type cumulative gap percentiles, one snapshot per touched
    * (type, batch); nearest-rank, exact below `capacity`. */
  def gapQuantiles(
      gapRows: Dataset[GapRow], capacity: Int,
      fractions: Seq[Double]): Dataset[GapSnapshot] = {
    val spark = gapRows.sparkSession
    import spark.implicits._
    gapRows
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (t: String, it: Iterator[GapRow], state: GroupState[(Long, Array[Byte])]) =>
          val (version, sketch) = state.getOption
            .map { case (v, b) => (v, QuantileSketch.deserialize(b)) }
            .getOrElse((0L, new QuantileSketch(capacity)))
          var touched = false
          it.foreach { g => sketch.add(g.gap_us.toDouble); touched = true }
          if (!touched) Iterator.empty
          else {
            val nextVersion = version + 1
            state.update((nextVersion, sketch.serialized))
            Iterator.single(GapSnapshot(t, nextVersion, sketch.n,
              fractions.map(sketch.quantile)))
          }
      }
  }

  /** The stacked pipeline: events → per-user gaps → per-type
    * percentile snapshots. */
  def monitor(
      events: Dataset[StreamingProfile.PEv], capacity: Int = 4096,
      fractions: Seq[Double] = Seq(0.5, 0.9, 0.99),
      idleTimeout: Option[FiniteDuration] = None): Dataset[GapSnapshot] =
    gapQuantiles(gaps(events, idleTimeout), capacity, fractions)
}
