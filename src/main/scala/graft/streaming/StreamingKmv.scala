package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Profiling
import graft.functions.sketch.Hll

/** Streaming KMV/theta distinct sketch: each group's k smallest
  * distinct [[Hll.h52]] values as keyed `GroupState` — the
  * set-expression-capable member of the bounded-state profiling family
  * (StreamingNdv answers "how many distinct"; this additionally leaves
  * behind sketches whose UNIONS and INTERSECTIONS are answerable later
  * by k-min merge / shared-value counting, `approx_distinct_kmv`).
  *
  * Same structure as the other sketches deliberately: items pre-hashed
  * into `groups` substreams, an independent sketch per group, a
  * monotonic per-group version stamped on every snapshot, optional
  * two-stage idle eviction (payload → tombstone → removal). State per
  * group is ≤ k longs regardless of stream length; the k-min set is a
  * pure function of the SET of items seen, so arrival order and
  * batching cannot change a snapshot's value columns (spec-pinned
  * batch parity).
  */
object StreamingKmv {

  case class KmvSnapshot(
      group: Int, batch: Long, n_vals: Long, kth_val: Long, estimate: Double)

  /** Insert hashes into a sorted distinct k-min array (ascending),
    * keeping the k smallest. */
  private[streaming] def merge(
      mins: Array[Long], hashes: Iterator[Long], k: Int): Array[Long] = {
    val set = scala.collection.mutable.TreeSet.empty[Long]
    set ++= mins
    hashes.foreach { h =>
      if (set.size < k) set += h
      else if (h < set.max && !set.contains(h)) { set += h; set -= set.max }
    }
    set.toArray
  }

  /** Per-group state transition — exposed for `TestGroupState` drive. */
  private[streaming] def kmvUpdate(k: Int, idleTimeout: Option[FiniteDuration])(
      group: Int, it: Iterator[String],
      state: GroupState[(Long, Array[Long])]): Iterator[KmvSnapshot] =
    if (state.hasTimedOut) {
      if (state.get._2.isEmpty) state.remove()
      else {
        state.update((state.get._1, Array.emptyLongArray))
        idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      }
      Iterator.empty
    } else {
      val (version, mins) = state.getOption.getOrElse((0L, Array.emptyLongArray))
      val next = merge(mins, it.map(Hll.h52), k)
      val nextVersion = version + 1
      state.update((nextVersion, next))
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      Iterator.single(KmvSnapshot(
        group, nextVersion, next.length.toLong,
        if (next.isEmpty) 0L else next.last,
        if (next.isEmpty) 0.0
        else Profiling.kmvEstimate(next.length.toLong, next.last, k)))
    }

  def kmv(
      items: Dataset[String],
      groups: Int,
      k: Int = Profiling.KmvK,
      idleTimeout: Option[FiniteDuration] = None): Dataset[KmvSnapshot] = {
    val spark = items.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    items
      .groupByKey(t => math.floorMod(t.hashCode, groups))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        kmvUpdate(k, idleTimeout))
  }
}
