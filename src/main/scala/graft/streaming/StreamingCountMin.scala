package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.CountMin

/** Streaming point-frequency tracking: a [[CountMin]] cell array as
  * keyed `GroupState`, re-emitting each group's estimates for a fixed
  * probe-term list every micro-batch — the frequency member of the
  * bounded-state profiling quartet (StreamingTopK → frequent items,
  * StreamingQuantiles → order statistics, StreamingNdv → distincts,
  * this → per-term counts). The probe list is the natural streaming
  * consumption shape: a dashboard watches known terms; the full counter
  * table never leaves the state store.
  *
  * Same structure as the other three deliberately: items pre-hashed
  * into `groups` substreams, an independent sketch per group, a
  * monotonic per-group version stamped on every snapshot, and optional
  * two-stage idle eviction (payload → O(1) version tombstone after one
  * idle period, key removal after a second). State per group is EXACTLY
  * d·2^wBits longs regardless of stream length.
  */
object StreamingCountMin {

  case class FreqSnapshot(group: Int, batch: Long, tok: String, n_est: Long)

  /** The per-group state transition — exposed so the timeout semantics
    * are unit-testable with `TestGroupState` (wall-clock-driven
    * processing-time timeouts are not deterministically drivable
    * through MemoryStream). */
  private[streaming] def cmUpdate(
      wBits: Int, d: Int, probes: Seq[String],
      idleTimeout: Option[FiniteDuration])(
      group: Int, it: Iterator[String],
      state: GroupState[(Long, Array[Long])]): Iterator[FreqSnapshot] =
    if (state.hasTimedOut) {
      // two-stage idle collection, same trade as StreamingNdv: first
      // idle period drops the 8 KB payload to a version tombstone,
      // second removes the key so tombstones cannot accumulate.
      if (state.get._2.isEmpty) state.remove()
      else {
        state.update((state.get._1, Array.emptyLongArray))
        idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      }
      Iterator.empty
    } else {
      val (version, sketch) = state.getOption
        .map { case (v, cells) =>
          (v, if (cells.isEmpty) CountMin(wBits, d)
              else CountMin.deserialize(wBits, d, cells))
        }
        .getOrElse((0L, CountMin(wBits, d)))
      it.foreach(sketch.add(_))
      val nextVersion = version + 1
      state.update((nextVersion, sketch.serialized))
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      probes.iterator.map(p =>
        FreqSnapshot(group, nextVersion, p, sketch.estimate(p)))
    }

  def pointFrequencies(
      items: Dataset[String],
      groups: Int,
      probes: Seq[String],
      wBits: Int = CountMin.StreamWBits,
      d: Int = CountMin.GateD,
      idleTimeout: Option[FiniteDuration] = None): Dataset[FreqSnapshot] = {
    val spark = items.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    items
      .groupByKey(t => math.floorMod(t.hashCode, groups))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        cmUpdate(wBits, d, probes, idleTimeout))
  }
}
