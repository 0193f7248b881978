package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Bounded RECENT-EVENTS buffer per user on `transformWithState`
  * `ListState` — the session-replay / recent-context feature every
  * personalization pipeline keeps, and the third state-variable type
  * of the Spark-4 API exercised in this repo (ValueState:
  * MapWithStateTWS, MapState: StreamingProfile, ListState: here —
  * plus timers and initial state on the first two).
  *
  * State is the user's last `n` events in event-time order. The write
  * path matters at RocksDB scale: while the buffer is BELOW capacity
  * the batch's events are `appendList`ed — an O(batch) log append that
  * never rewrites existing entries; only once the cap is exceeded does
  * the truncating `put` rewrite the (n-bounded) list. Per batch each
  * touched user emits ONE snapshot row of its full buffer; the latest
  * row per user is the live recent-context — spec-pinned against the
  * batch "last n by (ts, event_id)" window query semantics.
  */
object StreamingRecent {

  /** Compact per-event summary kept in the buffer. */
  case class RecentEv(event_id: Long, us: Long, event_type: String)

  /** Snapshot: the user's buffer, oldest first / most recent LAST. */
  case class RecentRow(user_id: Long, events: Seq[RecentEv])

  private class RecentProcessor(n: Int, ttl: TTLConfig)
    extends StatefulProcessor[Long, StreamingTransitions.Ev, RecentRow] {

    @transient private var recent: ListState[RecentEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[RecentEv](
        "recent", Encoders.product[RecentEv], ttl)

    override def handleInputRows(
        user: Long, rows: Iterator[StreamingTransitions.Ev],
        tv: TimerValues): Iterator[RecentRow] = {
      val arrivals = rows.toVector
        .sortBy(e => (StreamingTransitions.tsMicros(e.ts), e.event_id))
        .map(e => RecentEv(e.event_id, StreamingTransitions.tsMicros(e.ts),
          e.event_type))
      if (arrivals.isEmpty) Iterator.empty
      else {
        val current = if (recent.exists()) recent.get().toVector else Vector.empty
        // cross-batch order: there is no watermark here, so a later
        // batch CAN carry an event-time earlier than the buffer tail —
        // re-sort on that (rare) disorder so "last n by (ts, event_id)"
        // holds across batches, and keep the appendList fast path only
        // for the in-order case it is safe for
        val inOrder = current.isEmpty ||
          Ordering[(Long, Long)].lteq(
            (current.last.us, current.last.event_id),
            (arrivals.head.us, arrivals.head.event_id))
        val merged =
          (if (inOrder) current ++ arrivals
           else (current ++ arrivals).sortBy(e => (e.us, e.event_id)))
            .takeRight(n)
        if (inOrder && current.size + arrivals.size <= n)
          recent.appendList(arrivals.toArray) // pure log append, no rewrite
        else
          recent.put(merged.toArray) // cap exceeded or disorder: one bounded rewrite
        Iterator.single(RecentRow(user, merged))
      }
    }
  }

  val DefaultN = 5

  /** Snapshot stream; the latest row per user is the live recent-event
    * buffer. `ttl` (processing-time) expires cold users' buffers via
    * the native TTLConfig sweep. Requires the RocksDB provider
    * (transformWithState contract). */
  def recent(
      events: Dataset[StreamingTransitions.Ev],
      n: Int = DefaultN,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[RecentRow] = {
    require(n >= 1, "buffer size must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RecentProcessor(n, ttl),
        if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
