package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Relational

/** Streaming FEATURE-DRIFT monitor — the serving side of the batch
  * chi-square gate (`Relational.q79DriftChisq`): decile bounds and
  * reference bin counts are FROZEN from a batch reference build
  * ([[referenceFrom]] — the training-time profile), every live event
  * bins against them in the keyed kernel, and each micro-batch emits
  * one cumulative chi-square row per touched event type. State per
  * type is the 10 live bin counters — bounded regardless of traffic.
  *
  * The statistic is the batch gate's EXACT integer formula
  * (`e_i = (L·r_i) div R`, `Σ ((o_i−e_i)²·1e6) div max(e_i,1)`), so
  * once the stream has consumed the live half, the last snapshot per
  * type equals the batch q79 row bit for bit (spec-pinned) — batch
  * backfill and live monitor agree with no reconciliation, the q75
  * lambda discipline.
  *
  * Scale posture: the reference profile is ≤ |types|·(9+10) longs and
  * ships in the closure (a 100-TB reference collapses to the same few
  * rows before the collect); per-event binning is O(log 9); emission
  * is one row per (touched type, batch). `idleTimeout` evicts types
  * that stop sending — their monitor restarts cold on return
  * (documented trade, as in the daily-close family). */
object StreamingDrift {

  /** Reference/live split midpoint day — TRUNCATING division, the
    * exact rule the batch gates compute as SQL `div` (q79/q83/q84).
    * `Math.floorDiv` would floor instead and diverge for pre-1970
    * corpora (negative d0+d1), silently breaking the advertised
    * monitor≡batch bit-equality; Scala's `Long./` truncates toward
    * zero like SQL div, so the two engines agree on every sign. */
  private[streaming] def midDay(d0: Long, d1: Long): Long = (d0 + d1) / 2

  /** Frozen per-type reference: up to 9 decile bounds + bounds+1 bin
    * counts. A type whose reference half holds fewer than
    * [[Relational.QuantileBinCount]] rows yields PARTIAL bounds
    * (`(n·k) div 10 = 0` targets never match a rank) — batch q79
    * degrades to the coarser binning silently, so the monitor accepts
    * the same partial profile instead of refusing to start; the only
    * invariant is counts ⟺ bounds+1 bins. */
  case class RefProfile(bounds: Vector[Long], refCounts: Vector[Long]) {
    require(bounds.nonEmpty && bounds.length <= Relational.QuantileBinCount - 1 &&
      refCounts.length == bounds.length + 1,
      s"malformed reference profile: ${bounds.length} bounds / ${refCounts.length} counts")
    val refTotal: Long = refCounts.sum
    // r20: primitive copy for the per-event bin scan — counting through
    // the Vector boxed every comparison on the kernel's hottest line
    val boundsArr: Array[Long] = bounds.toArray
  }

  case class DriftRow(event_type: String, n_live: Long, chisq_ppm: Long)

  /** Live bin counters (fixed length [[Relational.QuantileBinCount]]). */
  case class DriftState(o: Vector[Long])

  private[streaming] def chisqPpm(p: RefProfile, o: Vector[Long]): Long = {
    val l = o.sum
    p.refCounts.indices.map { i =>
      val e = (l * p.refCounts(i)) / p.refTotal // non-negative: div == floor
      Relational.chisqCellPpm(o(i), e) // wrap-free split-div cell == batch q79
    }.sum
  }

  private[streaming] def driftUpdate(
      ref: Map[String, RefProfile], idleTimeout: Option[FiniteDuration])(
      eventType: String, it: Iterator[StreamingProfile.PEv],
      state: GroupState[DriftState]): Iterator[DriftRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else ref.get(eventType) match {
      case None => Iterator.empty // type unseen at reference time: no bins to test against
      case Some(p) =>
        val o0 = state.getOption.map(_.o)
          .getOrElse(Vector.fill(p.refCounts.length)(0L))
        // r20 per-event kernel: mutable primitive accumulator + unboxed
        // bound count. The old foldLeft allocated a fresh Vector spine
        // PER EVENT (`updated`) and the Vector `count` boxed every
        // comparison — ~230 µs/event measured at sf0.1, on a monitor
        // whose parallelism is capped by the 4-value type key. The while
        // loop below is count(_ < cents) verbatim (order-independent, no
        // sortedness assumption), so bins match batch binOf exactly.
        val acc = o0.toArray
        val bounds = p.boundsArr
        var touched = false
        it.foreach { ev =>
          var bin = 0
          var j = 0
          while (j < bounds.length) {
            if (bounds(j) < ev.cents) bin += 1
            j += 1
          }
          acc(bin) += 1L
          touched = true
        }
        if (!touched) {
          // empty/timer-only invocation: state (if any) is untouched
          idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
          Iterator.empty
        } else {
          val o = acc.toVector
          // update BEFORE arming the timeout — setting a timeout on a
          // key with no stored state yet is illegal
          state.update(DriftState(o))
          idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
          Iterator.single(DriftRow(eventType, o.sum, chisqPpm(p, o)))
        }
    }

  /** Cumulative drift stream: one row per (touched type, micro-batch). */
  def drift(
      events: Dataset[StreamingProfile.PEv], ref: Map[String, RefProfile],
      idleTimeout: Option[FiniteDuration] = None): Dataset[DriftRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        driftUpdate(ref, idleTimeout))
  }

  /** Batch reference build over `dir`'s REFERENCE half (day ≤ the
    * midpoint — the same split as the q79 gate): frozen decile bounds
    * + reference bin counts per type. Collects are bounded by the
    * type count (≤ |types|·10 rows), never the corpus. */
  def referenceFrom(s: SparkSession, dir: String): Map[String, RefProfile] = {
    val ev = graft.Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val Array(d0, d1) = ev.agg(min(col("day")), max(col("day"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = midDay(d0, d1)
    val ref = ev.filter(col("day") <= mid)
      .select(col("event_id"), col("event_type"), col("cents"))
    val bnds = Relational.decileBoundsOf(ref)
    val bounds = bnds.collect().map { r =>
      r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(_.getLong(1)).toVector
    }.toMap
    val counts = ref.join(broadcast(bnds), "event_type")
      .select(col("event_type"), Relational.binOf.as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      .collect().groupBy(_.getString(0))
    // a type absent from the bounds frame (reference half too sparse
    // for ANY rank target) is inner-joined away by batch q79 — skip it
    // here too; partial-bounds types keep their coarser binning, again
    // exactly as batch does
    counts.flatMap { case (t, rows) =>
      bounds.get(t).map { bs =>
        val byBin = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
        t -> RefProfile(bs,
          (1 to bs.length + 1).map(b => byBin.getOrElse(b.toLong, 0L)).toVector)
      }
    }
  }

  /** The live (post-midpoint) half of `dir`'s events in the kernel's
    * row shape, ordered by the family's feed discipline — what a spec
    * or bench streams against [[referenceFrom]]. */
  def liveHalf(s: SparkSession, dir: String): Array[StreamingProfile.PEv] = {
    import s.implicits._
    val ev = graft.Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        expr("datediff(to_date(ts), DATE '1970-01-01')").cast("long").as("day"),
        col("ts"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val Array(d0, d1) = ev.agg(min(col("day")), max(col("day"))).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = midDay(d0, d1)
    ev.filter(col("day") > mid)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("cents"))
      .as[StreamingProfile.PEv].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
  }
}
