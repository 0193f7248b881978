package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live per-user PROFILE maintenance on `transformWithState` COMPOSITE
  * state — the capability that API genuinely adds over
  * `flatMapGroupsWithState`'s single state slot (SCALE.md round-13
  * evaluation), demonstrated on the product shape every feature store
  * runs: per user, independently-typed state variables updated
  * together in one keyed pass:
  *
  *  - `counts: MapState[String, Long]` — events seen per type (the
  *    map grows per-type, NOT per-event; updating type t touches ONE
  *    store entry, where a single-slot design would rewrite the whole
  *    per-user map on every event — the RocksDB write-amplification
  *    difference at 100 TB);
  *  - `cents: ValueState[Long]` — lifetime value in exact cents;
  *  - `lastUs: ValueState[Long]` — last event-time µs (recency).
  *
  * Per batch each touched USER emits its whole updated profile (one
  * row per type in the map), so the user-level totals on every row are
  * always the user's latest; the latest-per-(user, type) snapshot then
  * equals the batch aggregate (count/sum/max over the same feed) —
  * spec-pinned. Requires the RocksDB provider (transformWithState
  * contract).
  */
object StreamingProfile {

  /** Event with value: the BEv bench envelope (event_id, user_id, ts,
    * cents). */
  case class PEv(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      event_type: String, cents: Long)

  case class ProfileRow(user_id: Long, event_type: String, n: Long,
      user_cents: Long, last_us: Long)

  /** Shared body of both processor variants: the three composite state
    * variables and the update-then-whole-profile-emission pass. */
  private trait ProfileKernel { self: StatefulProcessor[Long, PEv, ProfileRow] =>
    protected def ttl: TTLConfig
    @transient protected var counts: MapState[String, Long] = _
    @transient protected var cents: ValueState[Long] = _
    @transient protected var lastUs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, ttl)
      cents = getHandle.getValueState[Long]("cents", Encoders.scalaLong, ttl)
      lastUs = getHandle.getValueState[Long]("lastUs", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(
        user: Long, rows: Iterator[PEv], tv: TimerValues): Iterator[ProfileRow] = {
      val arrivals = rows.toVector.sortBy(e =>
        (StreamingTransitions.tsMicros(e.ts), e.event_id))
      if (arrivals.isEmpty) Iterator.empty
      else {
        var total = if (cents.exists()) cents.get() else 0L
        var last = if (lastUs.exists()) lastUs.get() else Long.MinValue
        val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        arrivals.foreach { e =>
          val n = touched.getOrElse(e.event_type,
            if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L)
          touched.update(e.event_type, n + 1)
          total += e.cents
          val us = StreamingTransitions.tsMicros(e.ts)
          if (us > last) last = us
        }
        touched.foreach { case (t, n) => counts.updateValue(t, n) }
        cents.update(total)
        lastUs.update(last)
        // emit the WHOLE updated profile (every type in the map), not
        // just the batch-touched types: the user-level totals on every
        // row are then always the user's latest, so "latest snapshot
        // per (user, type)" is the exact live profile. Materialized —
        // the store iterator must not outlive this call.
        val full = counts.iterator().toVector
        if (ttl != TTLConfig.NONE) {
          // MapState TTL is PER-ENTRY: with a TTL configured, refresh
          // the UNTOUCHED types too, so an active user's whole profile
          // shares one expiry clock (otherwise a cold type of a hot
          // user would expire independently of user_cents/lastUs and
          // the emitted "whole profile" would silently drop types).
          // This trades the one-entry write amplification win for
          // atomic per-user expiry — only on the TTL'd path.
          full.foreach { case (t, n) =>
            if (!touched.contains(t)) counts.updateValue(t, n)
          }
        }
        full.map { case (t, n) =>
          ProfileRow(user, t, n, total, last)
        }.iterator
      }
    }
  }

  private class ProfileProcessor(protected val ttl: TTLConfig)
    extends StatefulProcessor[Long, PEv, ProfileRow] with ProfileKernel

  /** Warm-start variant: the initial-state rows ARE ProfileRows (one
    * per (user, type), all rows of a user carrying the same user-level
    * totals) — exactly what a batch backfill aggregate produces, so
    * the lambda-architecture handoff is `profiles(stream, init =
    * batchAggregate)` with no translation layer. */
  private class ProfileProcessorWithInit(protected val ttl: TTLConfig)
    extends StatefulProcessorWithInitialState[Long, PEv, ProfileRow, ProfileRow]
    with ProfileKernel {

    override def handleInitialState(
        user: Long, init: ProfileRow, tv: TimerValues): Unit = {
      // called once per initial-state ROW: fold each (type, n) into the
      // map; the user-level totals are identical on every row
      counts.updateValue(init.event_type, init.n)
      cents.update(init.user_cents)
      lastUs.update(init.last_us)
    }
  }

  /** Profile-snapshot stream; the latest row per (user_id, event_type)
    * — selectable by max `n` — is the live profile. `ttl` (optional,
    * processing-time) expires every state variable of a cold user via
    * the native TTLConfig sweep; each batch that touches a user
    * refreshes ALL of that user's map entries (per-entry TTL made
    * atomic per user — see handleInputRows), so only genuinely cold
    * users expire, and they expire whole. */
  def profiles(
      events: Dataset[PEv],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[ProfileRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new ProfileProcessor(ttl),
        // TTLConfig's sweep is processing-time-based, so a TTL'd
        // profile must run in ProcessingTime mode; without TTL the
        // operator needs no clock at all
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** [[profiles]] WARM-STARTED from a batch backfill: `init` rows are
    * ProfileRows exactly as a batch count/sum/max aggregate produces
    * them, folded into the composite state before the first batch —
    * the lambda-architecture handoff (backfill once, then stream) with
    * no state-translation layer. Spec-pinned: backfill(first half) +
    * stream(second half) == batch aggregate over everything. */
  def profilesFrom(
      events: Dataset[PEv],
      init: Dataset[ProfileRow],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[ProfileRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new ProfileProcessorWithInit(ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append(),
        init.groupByKey(_.user_id))
  }
}
