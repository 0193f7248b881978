package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Generic per-key stateful map with TTL-based state eviction — the
  * flagship capability of the reference
  * (`/root/reference/src/main/java/com/github/juanrh/streaming/MapWithState.java:51-393`).
  *
  * The reference emulates keyed-state TTL on Flink 1.1.3 with an iterative
  * stream feeding per-key tombstones back into the operator (an `Either`
  * wrapper, a timer thread, checkpointed pending tombstones). Structured
  * Streaming provides the same semantics natively through
  * `flatMapGroupsWithState` + `GroupStateTimeout`, so this operator is a
  * declarative ~60-line library function with none of that machinery:
  *
  *  - state refresh on access = `setTimeoutDuration(ttl)` per event
  *    (reference: read refreshes `lastAccessTimestamp`, MapWithState.java:248-252);
  *  - eviction = `state.remove()` on `hasTimedOut`
  *    (reference: tombstone-triggered `valueState.clear()`, MapWithState.java:360-367);
  *  - the reference's `ttlRefreshInterval` tombstone re-arm has no
  *    counterpart — timeout firing granularity is the micro-batch trigger.
  *
  * Faithfulness detail: Spark fires a key's timeout only when a batch runs
  * and only if that key received no data in it. If a key sits idle past the
  * TTL and then receives data in the very next batch, the timeout callback
  * never fires for it — so, like the reference (which checks elapsed time
  * on every tombstone, MapWithState.java:361), we also check elapsed time
  * on the data path and reset to `defaultState` when the key had expired.
  * Boundary convention: this library resets on gap STRICTLY GREATER than
  * ttl (keep at ==), matching the batch oracle (q14's `gap > ttl` new-
  * session rule) — the binding contract here; the reference's tombstone
  * check evicted at `≥ ttl` (one-boundary divergence, intentional and
  * documented rather than silently inconsistent with the oracle).
  * The [[TimeStamped]] envelope mirrors the
  * reference's `TimeStampedValue` (MapWithState.java:232-263); here the
  * timestamp comes from the batch clock, not a wall-clock read per record,
  * so results are deterministic within a batch.
  *
  * Scale posture (100 TB): state is per-key-bounded (a single `S` + one
  * long), lives in the executor-local StateStore (RocksDB provider for
  * large keyspaces), and expired keys are physically removed by the
  * timeout path — no unbounded growth for churning keyspaces.
  */
object MapWithStateTTL {

  /** State envelope: user state + last-access time (ms for processing
    * time, µs for event time). */
  case class TimeStamped[S](value: S, lastAccessMs: Long)

  /** Processing-time TTL (reference default: TTL measured from last access
    * in wall-clock time, MapWithState.java:250,360).
    *
    * Caveat observed at the surface: elapsed time is measured between batch
    * *trigger* times, and a cold first micro-batch can take seconds in
    * local mode — choose a ttl comfortably above batch latency or the
    * first re-access will look expired (SURVEY §7.3).
    *
    * @param f user function `(key, element, state) => (output, newState)` —
    *          the reference's `MapWithState.Function` surface
    *          (MapWithState.java:209-220) extended with the key.
    */
  def processingTime[In, K, S, Out](
      ds: Dataset[In],
      ttl: FiniteDuration,
      defaultState: S)(
      keyOf: In => K)(
      f: (K, In, S) => (Out, S))(
      implicit kEnc: Encoder[K],
      sEnc: Encoder[TimeStamped[S]],
      outEnc: Encoder[Out]): Dataset[Out] = {
    val ttlMs = ttl.toMillis
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        (key: K, it: Iterator[In], state: GroupState[TimeStamped[S]]) =>
          if (state.hasTimedOut) {
            state.remove() // eviction (reference: valueState.clear())
            Iterator.empty
          } else {
            val nowMs = state.getCurrentProcessingTimeMs()
            // data-path expiry check: key idle past TTL restarts from default
            var s = state.getOption match {
              case Some(ts) if nowMs - ts.lastAccessMs <= ttlMs => ts.value
              case _ => defaultState
            }
            val out = it.map { in =>
              val (o, s2) = f(key, in, s)
              s = s2
              o
            }.toVector
            state.update(TimeStamped(s, nowMs))
            state.setTimeoutDuration(ttlMs) // refresh-on-access
            out.iterator
          }
      }
  }

  /** Event-time TTL — the variant the reference author wanted but Flink
    * 1.1.3 couldn't express (SURVEY §7.2 step 6). A key whose event-time
    * gap exceeds `ttl` restarts from `defaultState`; state cleanup rides
    * the watermark (`EventTimeTimeout`), so the caller must put
    * `.withWatermark` on the source for expired state to be dropped.
    *
    * Elements are processed in event-time order within each batch
    * (`eventTimeMicros` sort); cross-batch disorder beyond the watermark is
    * the caller's contract, as everywhere in Structured Streaming.
    *
    * Determinism makes this the oracle-checkable twin of the batch
    * gap-sessionization query (Relational.q14MapWithStateTtl); the
    * streaming/batch equivalence is asserted in MapWithStateTTLSpec.
    */
  def eventTime[In, K, S, Out](
      ds: Dataset[In],
      ttl: FiniteDuration,
      defaultState: S)(
      keyOf: In => K,
      eventTimeMicros: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      f: (K, In, S) => (Out, S))(
      implicit kEnc: Encoder[K],
      sEnc: Encoder[TimeStamped[S]],
      outEnc: Encoder[Out]): Dataset[Out] = {
    val ttlUs = ttl.toMicros
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (key: K, it: Iterator[In], state: GroupState[TimeStamped[S]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // total order within the batch: event time, then the caller's
            // tiebreak — without it, equal-timestamp events fold in
            // arbitrary post-shuffle order and the streaming/batch
            // equivalence (whose oracle orders by (ts, event_id)) breaks.
            // MEMORY BOUND: this buffers ONE KEY'S slice of ONE
            // micro-batch on the heap (hot-key spec: 100k-event key at
            // default heap in RunningReduceSpec). flatMapGroupsWithState
            // exposes no secondary-sort contract, so a spill-free fold
            // needs this sort; a hotter key needs the batch bounded
            // upstream (maxOffsetsPerTrigger / source rate limits).
            val events = it.toVector.sortBy(in => (eventTimeMicros(in), tiebreak(in)))
            var (s, lastUs) = state.getOption
              .map(t => (t.value, t.lastAccessMs))
              .getOrElse((defaultState, Long.MinValue))
            val out = events.map { in =>
              val us = eventTimeMicros(in)
              if (lastUs != Long.MinValue && us - lastUs > ttlUs) s = defaultState
              val (o, s2) = f(key, in, s)
              s = s2
              lastUs = us
              o
            }
            state.update(TimeStamped(s, lastUs))
            // cleanup once the watermark passes last event + ttl; round UP
            // to the next ms (the truncated lastUs/1000 + ttlMs could fire
            // up to ~1 ms before the true lastUs + ttl boundary and evict a
            // session the data-path rule would have continued); must also
            // stay ahead of the current watermark or Spark rejects it
            val timeoutMs = math.max(
              (lastUs + ttlUs) / 1000 + 1,
              state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(timeoutMs)
            out.iterator
          }
      }
  }
}
