package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.Hll

/** Streaming distinct-count: an [[Hll]] register array as keyed
  * `GroupState`, re-emitting each group's register summary + estimate
  * every micro-batch — the cardinality member of the bounded-state
  * profiling trio (StreamingTopK → frequent items, StreamingQuantiles →
  * order statistics, this → NDV).
  *
  * Same structure as the other two deliberately: items pre-hashed into
  * `groups` substreams, an independent sketch per group, a monotonic
  * per-group version stamped on every snapshot, and optional idle
  * eviction that drops the register payload to an O(1) version
  * tombstone after one idle period and REMOVES the key after a second
  * (so arbitrary group cardinality cannot accumulate tombstones; a
  * group returning after full removal restarts its version chain at 1).
  * State per group is EXACTLY 2^p bytes regardless of stream length —
  * the hardest possible bound of the three sketches.
  */
object StreamingNdv {

  case class NdvSnapshot(
      group: Int, batch: Long,
      n_buckets_hit: Long, sum_rank: Long, z_scaled: Long,
      estimate: Double)

  /** The per-group state transition — exposed so the timeout semantics
    * are unit-testable with `TestGroupState` (wall-clock-driven
    * processing-time timeouts are not deterministically drivable
    * through MemoryStream). */
  private[streaming] def ndvUpdate(idleTimeout: Option[FiniteDuration])(
      group: Int, it: Iterator[String],
      state: GroupState[(Long, Array[Byte])]): Iterator[NdvSnapshot] =
    if (state.hasTimedOut) {
      // two-stage idle collection: the first idle period drops the
      // register payload to an O(1) version tombstone (a returning
      // group continues its version chain); a SECOND idle period
      // removes the key outright so tombstones cannot accumulate
      // for the life of the query (the version restarts if the
      // group ever returns — documented trade for boundedness).
      if (state.get._2.isEmpty) state.remove()
      else {
        state.update((state.get._1, Array.emptyByteArray))
        idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      }
      Iterator.empty
    } else {
      val (version, sketch) = state.getOption
        .map { case (v, bytes) =>
          (v, if (bytes.isEmpty) new Hll() else Hll.deserialize(bytes))
        }
        .getOrElse((0L, new Hll()))
      it.foreach(sketch.add)
      val nextVersion = version + 1
      state.update((nextVersion, sketch.serialized))
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      Iterator.single(NdvSnapshot(
        group, nextVersion,
        sketch.nBucketsHit, sketch.sumRank, sketch.zScaled,
        sketch.estimate))
    }

  def ndv(
      items: Dataset[String],
      groups: Int,
      idleTimeout: Option[FiniteDuration] = None): Dataset[NdvSnapshot] = {
    val spark = items.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    items
      .groupByKey(t => math.floorMod(t.hashCode, groups))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        ndvUpdate(idleTimeout))
  }
}
