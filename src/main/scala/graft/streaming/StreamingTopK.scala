package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.SpaceSaving

/** Streaming frequent-items: a SpaceSaving sketch as keyed
  * `GroupState`, re-emitting each group's current top-k snapshot every
  * micro-batch (update semantics via Append of versioned snapshots).
  *
  * Parallel form: items are pre-hashed into `groups` substreams (the
  * reference's `hashCode % parallelism` re-key trick, C13/C14); each
  * group maintains an independent sketch, and a reader merges the final
  * snapshots — the same partial/final split the batch aggregate
  * (TopKSketchAgg) gets from Catalyst. State is O(capacity) per group,
  * forever, no matter how many distinct items stream past — the
  * bounded-state property that is this library's headline theme.
  */
object StreamingTopK {

  case class Snapshot(group: Int, batch: Long, item: String, count_lo: Long, count_hi: Long)

  /** items → per-group top-k snapshots, one set per micro-batch. The
    * snapshot version is a monotonic per-group counter held in state —
    * NOT a wall-clock read, which could collide across two fast
    * micro-batches and make [[mergedLatest]] double-count.
    *
    * `idleTimeout`: groups that receive no items for the given
    * processing-time span are physically evicted (sketch dropped from
    * the StateStore) and restart cold — including the snapshot version,
    * so a reader can tell a restarted group apart. State without it is
    * O(capacity) per group forever; with it, idle substreams release
    * even that. */
  def topK(
      items: Dataset[String],
      groups: Int,
      capacity: Int,
      k: Int,
      idleTimeout: Option[FiniteDuration] = None): Dataset[Snapshot] = {
    val spark = items.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    items
      .groupByKey(s => math.floorMod(s.hashCode, groups))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (group: Int, it: Iterator[String], state: GroupState[(Long, Array[Byte])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (version, sketch) = state.getOption
              .map { case (v, bytes) => (v, SpaceSaving.deserialize(bytes)) }
              .getOrElse((0L, new SpaceSaving(capacity)))
            it.foreach(sketch.add(_))
            val nextVersion = version + 1
            state.update((nextVersion, sketch.serialized))
            idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
            sketch.topK(k).iterator.map { case (item, lo, hi) =>
              Snapshot(group, nextVersion, item, lo, hi)
            }
          }
      }
  }

  /** Merge the LATEST snapshot of every group into a single top-k view
    * (driver-side; snapshots are tiny — k rows per group). */
  def mergedLatest(snapshots: Seq[Snapshot], k: Int): Seq[(String, Long, Long)] = {
    val latest = snapshots.groupBy(_.group).values.flatMap { snaps =>
      val lastBatch = snaps.map(_.batch).max
      snaps.filter(_.batch == lastBatch)
    }
    latest
      .groupBy(_.item).map { case (item, rows) =>
        (item, rows.map(_.count_lo).sum, rows.map(_.count_hi).sum)
      }
      .toSeq.sortBy { case (item, _, hi) => (-hi, item) }
      .take(k)
  }
}
