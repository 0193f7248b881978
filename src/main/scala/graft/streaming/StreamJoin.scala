package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval join of two streams — the streaming form of the
  * batch interval join (`Relational.q23IntervalJoin`): for each left row,
  * the right rows with an equal key and an event time inside the
  * `lookback` window ending at the left row's time.
  *
  * The reference has no joins at all (SURVEY §0); this is the capability
  * a Flink user would reach for with `intervalJoin`/`between`. Spark's
  * watermarked stream-stream join buffers both sides in the state store
  * and derives the eviction horizon FROM the range condition: a right
  * row is dropped once the watermark passes `rightTime + lookback`
  * (no left row can still match it), a left row once matched rows can no
  * longer arrive. Both inputs MUST carry `withWatermark` on their time
  * column — without it the join state grows without bound (Spark rejects
  * outer joins outright in that case but silently accumulates for
  * inner).
  *
  * Scale shape: state is hash-partitioned by join key like any shuffle
  * join; per-key state size is bounded by the lookback window × per-key
  * rate, independent of stream length. Skewed keys shard exactly like
  * the batch salted join (SkewJoin) — salt the key and replicate the
  * bounded side — but at streaming state sizes (a window of rows, not a
  * table) AQE-free local[?] rarely needs it.
  */
object StreamJoin {

  /** @param keys     (leftCol, rightCol) equality pairs
    * @param leftTime left event-time column (watermarked by the caller)
    * @param rightTime right event-time column (watermarked by the caller)
    * @param lookback window length: right rows in
    *                 `[leftTime - lookback, leftTime)` match
    *                 (half-open — a right row exactly at the left time
    *                 does not match, same as the batch q23 bound)
    * @param joinType "inner" or "left_outer"; left-outer emits the
    *                 null-padded row only after the watermark passes the
    *                 row's match horizon (correct, but means tail rows
    *                 of a finite feed stay pending forever — flush with
    *                 a later event when draining in tests)
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      lookback: FiniteDuration,
      joinType: String = "inner"): DataFrame = {
    val keyCond = keys.map { case (l, r) => left(l) === right(r) }.reduce(_ && _)
    // millisecond interval literal: `toSeconds` would silently truncate a
    // sub-second lookback to an EMPTY window [t, t)
    val window = right(rightTime) < left(leftTime) &&
      right(rightTime) >= left(leftTime) - expr(s"interval ${lookback.toMillis} milliseconds")
    left.join(right, keyCond && window, joinType)
  }
}
