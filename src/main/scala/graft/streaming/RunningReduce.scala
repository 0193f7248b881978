package graft.streaming

import java.time.Duration

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Keyed running reduce emitting the cumulative value per event —
  * the reference's `keyBy(0).reduce(sum)` whose observed output is the
  * running sums `(a,1)(a,4)(a,12)…` (SURVEY §2.2 B10;
  * `/root/reference/.../WindowAllKeyedPoC.java:145-151`, run log `:55-63`).
  *
  * `flatMapGroupsWithState` in Append mode is the faithful per-event echo
  * (a plain `groupBy.agg` in Update mode only emits once per micro-batch).
  * The batch oracle is the cumulative window function
  * (Relational.q9RunningSum).
  */
object RunningReduce {

  case class Acc[S](value: S)

  /** Shared deterministic batch fold: one key's micro-batch slice,
    * sorted by (orderOf, tiebreak), folded from `start`, emitting the
    * running value per event. Returns (emissions, final accumulator). */
  private def foldSorted[In, K, S](
      key: K, it: Iterator[In], start: S,
      orderOf: In => Long, tiebreak: In => Long,
      reduce: (S, In) => S): (Vector[(K, S)], S) = {
    var acc = start
    val out = it.toVector.sortBy(in => (orderOf(in), tiebreak(in))).map { in =>
      acc = reduce(acc, in)
      (key, acc)
    }
    (out, acc)
  }

  /** @param tiebreak total-order tiebreak for equal `orderOf` values —
    *                  without it, tied events fold in arbitrary
    *                  post-shuffle order while the batch oracle (q9)
    *                  orders by (ts, event_id)
    *
    * Memory bound: the deterministic sort buffers one key's slice of one
    * micro-batch on the heap (pinned by the hot-key spec at 100k events
    * for a single key). Spark's flatMapGroupsWithState has no
    * secondary-sort contract to lean on; bound a hotter key's batch
    * upstream with source rate limits (maxOffsetsPerTrigger). */
  def keyed[In, K, S](
      ds: Dataset[In],
      zero: S)(
      keyOf: In => K,
      orderOf: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      reduce: (S, In) => S)(
      implicit kEnc: Encoder[K],
      aEnc: Encoder[Acc[S]],
      outEnc: Encoder[(K, S)]): Dataset[(K, S)] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[In], state: GroupState[Acc[S]]) =>
          val (out, acc) = foldSorted(
            key, it, state.getOption.map(_.value).getOrElse(zero),
            orderOf, tiebreak, reduce)
          state.update(Acc(acc))
          out.iterator
      }

  /** [[keyed]] with BOUNDED state: keys idle past `ttl` are physically
    * evicted (ProcessingTimeTimeout + `state.remove()`) and restart from
    * `zero` on their next event — the same refresh-on-access /
    * data-path-expiry composition as MapWithStateTTL.processingTime.
    * The un-TTL'd [[keyed]] is semantically faithful to the reference's
    * `keyBy(0).reduce` (state per key, forever); this is the form a
    * library whose headline theme is bounded state should hand to a
    * churning 100 TB keyspace. */
  def keyedWithTtl[In, K, S](
      ds: Dataset[In],
      zero: S,
      ttl: FiniteDuration)(
      keyOf: In => K,
      orderOf: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      reduce: (S, In) => S)(
      implicit kEnc: Encoder[K],
      tsEnc: Encoder[MapWithStateTTL.TimeStamped[S]],
      outEnc: Encoder[(K, S)]): Dataset[(K, S)] = {
    val ttlMs = ttl.toMillis
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout) {
        (key: K, it: Iterator[In], state: GroupState[MapWithStateTTL.TimeStamped[S]]) =>
          if (state.hasTimedOut) {
            state.remove() // eviction: idle key leaves the StateStore
            Iterator.empty
          } else {
            val nowMs = state.getCurrentProcessingTimeMs()
            // data-path expiry: a key that sat idle past ttl but got new
            // data before its timeout fired restarts from zero
            val start = state.getOption match {
              case Some(ts) if nowMs - ts.lastAccessMs <= ttlMs => ts.value
              case _ => zero
            }
            val (out, acc) = foldSorted(key, it, start, orderOf, tiebreak, reduce)
            state.update(MapWithStateTTL.TimeStamped(acc, nowMs))
            state.setTimeoutDuration(ttlMs) // refresh-on-access
            out.iterator
          }
      }
  }

  private class TtlTwsProcessor[K, In, S](
      ttlMs: Long, zero: S,
      orderOf: In => Long, tiebreak: In => Long,
      reduce: (S, In) => S,
      tsEnc: Encoder[MapWithStateTTL.TimeStamped[S]])
    extends StatefulProcessor[K, In, (K, S)] {

    @transient private var state: ValueState[MapWithStateTTL.TimeStamped[S]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // native TTL at ttl+1 ms (the MapWithStateTWS alignment): the
      // runtime evicts AT its boundary, the contract keeps state at
      // gap == ttl and restarts strictly AFTER — +1 makes state the
      // runtime already swept and state the data path treats as expired
      // agree
      state = getHandle.getValueState("s", tsEnc,
        TTLConfig(Duration.ofMillis(ttlMs + 1)))

    override def handleInputRows(
        key: K, rows: Iterator[In], tv: TimerValues): Iterator[(K, S)] = {
      val nowMs = tv.getCurrentProcessingTimeInMs()
      // data-path expiry, same as the GroupState form: survive a TTL
      // sweep that hasn't run yet
      val start =
        if (state.exists()) {
          val t = state.get()
          if (nowMs - t.lastAccessMs <= ttlMs) t.value else zero
        } else zero
      val (out, acc) = foldSorted(key, rows, start, orderOf, tiebreak, reduce)
      // update refreshes the native TTL clock — refresh-on-access, like
      // the GroupState form's setTimeoutDuration per batch
      state.update(MapWithStateTTL.TimeStamped(acc, nowMs))
      out.iterator
    }
  }

  /** The Spark-4 `transformWithState` twin of [[keyedWithTtl]] (VERDICT
    * r18 item 6): bounded keyed running reduce with NATIVE per-state
    * TTL (`TTLConfig`) instead of a GroupState timeout — the runtime
    * owns the idle-key sweep, the data path keeps the gap>ttl restart.
    * Identical observable contract, differentially spec-pinned in
    * RunningReduceSpec (identical eviction-script traces). Requires the
    * RocksDB state store provider (a `transformWithState` runtime
    * constraint). */
  def keyedWithTtlTws[In, K, S](
      ds: Dataset[In],
      zero: S,
      ttl: FiniteDuration)(
      keyOf: In => K,
      orderOf: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      reduce: (S, In) => S)(
      implicit kEnc: Encoder[K],
      tsEnc: Encoder[MapWithStateTTL.TimeStamped[S]],
      outEnc: Encoder[(K, S)]): Dataset[(K, S)] =
    ds.groupByKey(keyOf)
      .transformWithState(
        new TtlTwsProcessor[K, In, S](
          ttl.toMillis, zero, orderOf, tiebreak, reduce, tsEnc),
        TimeMode.ProcessingTime(),
        OutputMode.Append())
}
