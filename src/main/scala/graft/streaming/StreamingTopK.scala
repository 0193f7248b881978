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
    * `idleTimeout`: a group that receives no items for the given
    * processing-time span has its SKETCH evicted (the O(capacity)
    * payload drops to an O(1) tombstone holding only the version
    * counter) and restarts cold on its next item. The version
    * deliberately SURVIVES eviction: [[mergedLatest]] selects each
    * group's latest snapshot by version, so a counter that reset would
    * make stale pre-eviction snapshots outrank (or collide with) the
    * restarted group's output. State rows themselves are bounded by
    * `groups` regardless — the sketch payload is what eviction
    * reclaims. */
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
            // evict the sketch, keep the version tombstone (no new
            // timeout armed: the tombstone persists until next data)
            state.update((state.get._1, Array.emptyByteArray))
            Iterator.empty
          } else {
            val (version, sketch) = state.getOption
              .map { case (v, bytes) =>
                (v, if (bytes.isEmpty) new SpaceSaving(capacity)
                    else SpaceSaving.deserialize(bytes))
              }
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
