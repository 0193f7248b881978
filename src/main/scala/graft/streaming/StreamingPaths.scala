package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming user-journey paths — the incremental form of the batch
  * top-paths query (`Relational.q69PathTopk`): per user, the state is
  * the last TWO event types (two strings), and every event from the
  * third on emits exactly one (e1, e2, e3) path row — the sliding
  * 3-gram of the user's journey. Downstream
  * `groupBy(e1,e2,e3).agg(count, countDistinct(user_id))` over the
  * emitted hits IS q69's pre-limit aggregate, continuously.
  *
  * Contracts (the StreamingTransitions family rules):
  *  - arrivals are sequenced per user by (ts, event_id) within a batch
  *    and chained across batches through the stored suffix — in-order
  *    batches reproduce the batch 3-gram set row for row (spec-pinned);
  *  - exactly `max(0, n_user_events − 2)` output rows per user (the
  *    bench line's exact count model);
  *  - state per user is two strings, bounded regardless of history;
  *    `idleTimeout` evicts cold users (a returning user restarts the
  *    3-gram window — the documented trade, as in transitions). */
object StreamingPaths {

  /** Last two event types: `p2` = last-but-one, `p1` = last. */
  case class PathState(p2: String, p1: String)

  case class PathHit(user_id: Long, e1: String, e2: String, e3: String)

  private[streaming] def pathUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[PathState]): Iterator[PathHit] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e =>
        (StreamingTransitions.tsMicros(e.ts), e.event_id))
      var st = state.getOption.getOrElse(PathState(null, null))
      val out = Seq.newBuilder[PathHit]
      arrivals.foreach { e =>
        if (st.p2 != null) out += PathHit(user, st.p2, st.p1, e.event_type)
        st = PathState(st.p1, e.event_type)
      }
      state.update(st)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Path-hit stream; `groupBy(e1,e2,e3).agg(count, countDistinct)` is
    * the live q69 pre-limit aggregate. */
  def paths(
      events: Dataset[StreamingTransitions.Ev],
      idleTimeout: Option[FiniteDuration] = None): Dataset[PathHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        pathUpdate(idleTimeout))
  }

  /** Per-path aggregate snapshot: exact hit count plus the KMV
    * distinct-USER estimate (`n_vals`/`kth_val` are the sketch gate
    * columns, `est_users` the derived estimate). */
  case class PathAgg(e1: String, e2: String, e3: String, batch: Long,
      n_hits: Long, n_vals: Long, kth_val: Long, est_users: Double)

  /** Per-path state transition — exposed for `TestGroupState` drive.
    * State: (snapshot version, exact hit count, KMV k-min array of
    * distinct user hashes) — ≤ k+2 longs per path, bounded regardless
    * of stream length. */
  private[streaming] def pathAggUpdate(k: Int)(
      path: (String, String, String), it: Iterator[PathHit],
      state: GroupState[(Long, Long, Array[Long])]): Iterator[PathAgg] = {
    val (version, hits, mins) =
      state.getOption.getOrElse((0L, 0L, Array.emptyLongArray))
    val batchHits = it.toVector
    val n = hits + batchHits.size
    val next = StreamingKmv.merge(
      mins, batchHits.iterator.map(h =>
        graft.functions.sketch.Hll.h52(h.user_id.toString)), k)
    val v = version + 1
    state.update((v, n, next))
    Iterator.single(PathAgg(path._1, path._2, path._3, v, n,
      next.length.toLong,
      if (next.isEmpty) 0L else next.last,
      if (next.isEmpty) 0.0
      else graft.functions.Profiling.kmvEstimate(next.length.toLong, next.last, k)))
  }

  /** The LIVE q69 aggregate: [[paths]] chained into a second
    * append-mode `flatMapGroupsWithState` keyed by (e1, e2, e3) —
    * Spark permits stacking stateful operators when every
    * flatMapGroupsWithState runs in Append mode, so the whole thing is
    * ONE streaming query. The latest snapshot per path carries the
    * EXACT cumulative hit count (batch q69's `n_paths`) and a KMV
    * estimate of distinct users (`n_users` is a distinct aggregate —
    * not computable exactly in streaming append mode — so the
    * [[StreamingKmv]] k-min sketch stands in: exact below k distinct
    * users, ≈1/√(k−2) standard error above; spec-pinned both regimes).
    * Path-key state needs no idle eviction: the key space is
    * |event types|³ — bounded by construction, unlike the per-user
    * first stage. */
  def pathsAgg(
      events: Dataset[StreamingTransitions.Ev],
      k: Int = graft.functions.Profiling.KmvK,
      idleTimeout: Option[FiniteDuration] = None): Dataset[PathAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    paths(events, idleTimeout)
      .groupByKey(h => (h.e1, h.e2, h.e3))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        pathAggUpdate(k))
  }
}
