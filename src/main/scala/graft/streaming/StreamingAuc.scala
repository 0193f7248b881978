package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Relational

/** Live Mann–Whitney / AUC monitor — q84's streaming side in the
  * frozen-reference form (the StreamingDrift discipline): the
  * reference half's cents distribution per event type freezes at
  * deploy time into the monitor's closure (bounded: one (cents, count)
  * pair per distinct reference value per type — the training-time
  * artifact); the live stream then keeps just TWO longs of state per
  * type (n_live, wins_x2) and emits one cumulative row per
  * (touched type, micro-batch): the doubled pair-win count
  * `wins_x2 += 2·|{ref < v}| + |{ref = v}|` per live value and the
  * AUC effect size in ppm. Because the doubled U IS the doubled pair
  * count, the emitted numbers are bit-equal to batch
  * [[Relational.q84MannWhitney]] once the live half is consumed
  * (spec-pinned per type in StreamingAucSpec) — the dashboard shows
  * the number the batch backfill will reproduce, the StreamingAb
  * contract.
  *
  * State: O(1) per live type (version + two longs); the reference
  * lookup is a broadcast closure, never keyed state. Cold types (no
  * reference) emit nothing, exactly as batch q84's inner fold drops
  * them. `idleTimeout` optionally evicts idle types' counters
  * (processing-time; a returning type restarts cold — the
  * StreamingDrift trade, stated).
  */
object StreamingAuc {

  /** Frozen per-type reference distribution: ascending (cents, count)
    * plus prefix sums for O(log n) strictly-below lookups. */
  case class RefDist(sorted: Vector[(Long, Long)]) {
    require(sorted.nonEmpty && sorted.iterator.map(_._1).sliding(2)
        .forall(p => p.length < 2 || p.head < p.last),
      "reference distribution must be ascending by cents")
    val nRef: Long = sorted.iterator.map(_._2).sum
    private val prefix: Vector[Long] =
      sorted.scanLeft(0L)(_ + _._2) // prefix(i) = mass of the first i values

    /** 2·|{ref < v}| + |{ref = v}| — one live value's doubled wins. */
    def winsX2Of(v: Long): Long = {
      var lo = 0
      var hi = sorted.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (sorted(m)._1 < v) lo = m + 1 else hi = m
      }
      val eq = if (lo < sorted.length && sorted(lo)._1 == v) sorted(lo)._2 else 0L
      2L * prefix(lo) + eq
    }
  }

  case class AucState(version: Long, nLive: Long, winsX2: Long)

  case class AucRow(event_type: String, batch: Long, n_live: Long,
      wins_x2: Long, auc_ppm: Long)

  /** Cumulative AUC ppm — the q84 split-division algebra
    * ([[Relational.chisqCellPpm]] wrap rule): exact BIGINT, no floats. */
  private[streaming] def aucPpm(nRef: Long, nLive: Long, winsX2: Long): Long = {
    val d = 2L * nRef * nLive
    if (d == 0L) 0L
    else (winsX2 / d) * 1000000L + (winsX2 % d) * 1000000L / d
  }

  private[streaming] def aucUpdate(
      ref: Map[String, RefDist], idleTimeout: Option[FiniteDuration])(
      eventType: String, it: Iterator[StreamingProfile.PEv],
      state: GroupState[AucState]): Iterator[AucRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else ref.get(eventType) match {
      case None => Iterator.empty // type unseen at reference time
      case Some(p) =>
        val st = state.getOption.getOrElse(AucState(0L, 0L, 0L))
        var n = st.nLive
        var w = st.winsX2
        it.foreach { ev => n += 1L; w += p.winsX2Of(ev.cents) }
        idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
        if (n == st.nLive) Iterator.empty // empty/timer-only invocation
        else {
          val next = AucState(st.version + 1L, n, w)
          state.update(next)
          Iterator.single(
            AucRow(eventType, next.version, n, w, aucPpm(p.nRef, n, w)))
        }
    }

  /** Cumulative live-vs-frozen-reference AUC stream: one row per
    * (touched type, micro-batch). */
  def auc(
      events: Dataset[StreamingProfile.PEv], ref: Map[String, RefDist],
      idleTimeout: Option[FiniteDuration] = None): Dataset[AucRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        aucUpdate(ref, idleTimeout))
  }

  /** Batch reference build over `dir`'s REFERENCE half — the exact
    * q84 split (day ≤ (min+max) div 2). Collect is bounded by
    * |types| · |distinct reference cents per type|, never the corpus. */
  def referenceFrom(s: SparkSession, dir: String): Map[String, RefDist] = {
    val ev = graft.Tables.events(s, dir)
      .select(col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val Array(d0, d1) = ev.agg(min(col("day")), max(col("day"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = StreamingDrift.midDay(d0, d1)
    ev.filter(col("day") <= mid)
      .groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> RefDist(rows.sortBy(_._2).map(r => (r._2, r._3)).toVector)
      }
  }
}
