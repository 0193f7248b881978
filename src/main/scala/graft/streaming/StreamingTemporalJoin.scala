package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING TEMPORAL (AS-OF) JOIN — enrich a fact stream against a
  * VERSIONED dimension stream: each fact picks up the latest dimension
  * version whose valid-from time is ≤ the fact's event time (inclusive
  * point-in-time semantics, the same contract as the batch
  * `Relational.q45PitJoin` over the custom AsOfJoin exec).
  *
  * The two inputs arrive as ONE keyed envelope stream (dims flagged
  * `is_dim`) — the union-then-key-together shape the reference built its
  * `EitherKeySelector` for (`/root/reference/src/main/java/com/github/
  * juanrh/streaming/MapWithState.java:66-87` — there a value/tombstone
  * union; here a fact/dim-version union).
  *
  * Contracts:
  *  - One key's micro-batch slice processes in deterministic
  *    `(t, dims-first, tiebreak)` order (same discipline as
  *    [[RunningReduce]]'s sorted fold), so a dim version and a fact at
  *    the same timestamp in the same batch enrich inclusively.
  *  - Cross-batch, a dim version arriving AFTER a fact it would have
  *    matched cannot retro-correct the already-emitted row (streaming
  *    views never retract); feed dims with the same watermark delay as
  *    facts to bound that skew.
  *  - State per key is the version history ABOVE the watermark plus the
  *    single latest version at-or-below it (the one still effective for
  *    any in-time fact) — exactly the retention a temporal table join
  *    needs; everything older is evicted each invocation, so state is
  *    bounded by the key's version churn inside the watermark horizon,
  *    not by stream length. Facts (and dims) older than the watermark
  *    never reach the operator at all — Spark's late filter drops
  *    sub-watermark rows ahead of the stateful exec (the same behavior
  *    the bench's eventTimeBatches splitter documents) — which is
  *    exactly why retaining ONE at-or-below-watermark version suffices:
  *    every fact that can still arrive has `t ≥ watermark`.
  *
  * Scale: key-hash partitioned like every keyed-state operator here;
  * per-key state is O(versions in horizon); no buffering of facts (each
  * enriches and emits in its arrival batch).
  */
object StreamingTemporalJoin {

  /** Union envelope: dim versions carry `payload`, facts carry `value`. */
  case class Env(
      key: Long, ts: java.sql.Timestamp, is_dim: Boolean,
      payload: String, value: Long)

  /** Enriched fact; `dim_t` is the matched version's valid-from millis,
    * -1 (null payload) when no version was effective. */
  case class Enriched(
      key: Long, ts: java.sql.Timestamp, value: Long,
      payload: Option[String], dim_t: Long)

  /** Ascending (validFromMs, payload) version history. */
  case class Versions(vs: Vector[(Long, String)])

  def dim(key: Long, tsMs: Long, payload: String): Env =
    Env(key, new java.sql.Timestamp(tsMs), is_dim = true, payload, 0L)

  def fact(key: Long, tsMs: Long, value: Long): Env =
    Env(key, new java.sql.Timestamp(tsMs), is_dim = false, null, value)

  /** Temporal retention: evict versions below `wm` except the single
    * latest one at-or-below it (still effective for any in-time fact).
    * Pure — unit-tested directly, since a live query's late filter drops
    * the sub-watermark facts that could observe eviction from output. */
  private[streaming] def retained(
      vs: Vector[(Long, String)], wm: Long): Vector[(Long, String)] =
    if (wm <= 0) vs
    else {
      val i = floorIdx(vs, wm)
      if (i > 0) vs.drop(i) else vs
    }

  /** Latest version index with t ≤ target, or -1. */
  private[streaming] def floorIdx(vs: Vector[(Long, String)], target: Long): Int = {
    var lo = 0; var hi = vs.length - 1; var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid)._1 <= target) { res = mid; lo = mid + 1 } else hi = mid - 1
    }
    res
  }

  def apply(env: Dataset[Env]): Dataset[Enriched] = {
    val spark = env.sparkSession
    import spark.implicits._
    env
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[Env], state: GroupState[Versions]) =>
          var vs = state.getOption.map(_.vs).getOrElse(Vector.empty)
          val out = Vector.newBuilder[Enriched]
          // dims before facts at equal t (inclusive PIT), then value as
          // the deterministic tiebreak within each kind
          val slice = it.toVector.sortBy(e =>
            (e.ts.getTime, !e.is_dim, e.value, Option(e.payload).getOrElse("")))
          slice.foreach { e =>
            val t = e.ts.getTime
            if (e.is_dim) {
              // insert keeping ascending order (late dims land mid-history;
              // equal-t re-statement: last writer wins, replace in place)
              val i = floorIdx(vs, t)
              if (i >= 0 && vs(i)._1 == t) vs = vs.updated(i, (t, e.payload))
              else vs = (vs.take(i + 1) :+ (t, e.payload)) ++ vs.drop(i + 1)
            } else {
              val i = floorIdx(vs, t)
              if (i >= 0)
                out += Enriched(key, e.ts, e.value, Some(vs(i)._2), vs(i)._1)
              else out += Enriched(key, e.ts, e.value, None, -1L)
            }
          }
          // temporal retention — state stays bounded by in-horizon
          // version churn, not stream length
          state.update(Versions(retained(vs, state.getCurrentWatermarkMs())))
          out.result().iterator
      }
  }
}
