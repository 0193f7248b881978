package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingAuc.RefDist

/** Live two-sample Kolmogorov–Smirnov monitor — q83's streaming side,
  * completing the drift family's live trio (StreamingDrift = q79
  * chi-square, StreamingAuc = q84 U/AUC, this = q83 KS). The reference
  * half's per-type cents distribution freezes at deploy time
  * ([[StreamingAuc.referenceFrom]] — the same artifact the AUC monitor
  * uses); the live stream keeps ONE value-domain-bounded histogram per
  * type (cents → count — the same size class as the frozen reference
  * itself, the documented state bound) and emits one cumulative row
  * per (touched type, micro-batch): n_live and the scaled-integer KS
  * gap over the MERGED distinct support, exactly batch
  * [[graft.operators.Relational.q83KsTest]]'s algebra — so once the
  * live half is consumed the final row per type is BIT-EQUAL to the
  * batch gate (spec-pinned), the StreamingAb contract.
  *
  * Per-batch work per touched type is O(D log D) in the type's distinct
  * value count D — bounded by the value domain, not the stream; the
  * binning-free exactness is what the chi-square monitor trades away.
  * `idleTimeout` optionally evicts idle types (a returning type
  * restarts cold — the StreamingDrift trade, stated).
  */
object StreamingKs {

  case class KsState(version: Long, hist: Map[Long, Long])

  case class KsRow(event_type: String, batch: Long, n_ref: Long,
      n_live: Long, ks_ppm: Long)

  /** Scaled-integer KS over the merged distinct support — batch q83's
    * `(cum·1e6) div greatest(n, 1)` gap, walked in ascending cents
    * order. Returns (n_live, ks_ppm). */
  private[streaming] def ksPpm(
      ref: RefDist, hist: collection.Map[Long, Long]): (Long, Long) = {
    val nLive = hist.valuesIterator.sum
    val nRefD = math.max(ref.nRef, 1L)
    val nLiveD = math.max(nLive, 1L)
    val keys = (ref.sorted.iterator.map(_._1) ++ hist.keysIterator)
      .toArray.distinct.sorted
    var cumRef = 0L
    var cumLive = 0L
    var ri = 0
    var best = 0L
    keys.foreach { v =>
      while (ri < ref.sorted.length && ref.sorted(ri)._1 <= v) {
        cumRef += ref.sorted(ri)._2; ri += 1
      }
      cumLive += hist.getOrElse(v, 0L)
      val gap = math.abs(
        cumRef * 1000000L / nRefD - cumLive * 1000000L / nLiveD)
      if (gap > best) best = gap
    }
    (nLive, best)
  }

  private[streaming] def ksUpdate(
      ref: Map[String, RefDist], idleTimeout: Option[FiniteDuration])(
      eventType: String, it: Iterator[StreamingProfile.PEv],
      state: GroupState[KsState]): Iterator[KsRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else ref.get(eventType) match {
      case None => Iterator.empty // type unseen at reference time
      case Some(dist) =>
        val st = state.getOption.getOrElse(KsState(0L, Map.empty))
        var hist = st.hist
        var news = false
        it.foreach { ev =>
          hist = hist.updated(ev.cents, hist.getOrElse(ev.cents, 0L) + 1L)
          news = true
        }
        idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
        if (!news) Iterator.empty // empty/timer-only invocation
        else {
          val next = KsState(st.version + 1L, hist)
          state.update(next)
          val (nLive, ks) = ksPpm(dist, hist)
          Iterator.single(KsRow(eventType, next.version, dist.nRef, nLive, ks))
        }
    }

  /** Cumulative live-vs-frozen-reference KS stream: one row per
    * (touched type, micro-batch). */
  def ks(
      events: Dataset[StreamingProfile.PEv], ref: Map[String, RefDist],
      idleTimeout: Option[FiniteDuration] = None): Dataset[KsRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        ksUpdate(ref, idleTimeout))
  }
}
