package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.QuantileSketch

/** Streaming quantiles: a [[QuantileSketch]] as keyed `GroupState`,
  * re-emitting each group's current nearest-rank quantiles every
  * micro-batch — the order-statistics twin of [[StreamingTopK]], and the
  * second member of the bounded-state profiling pair (frequent items +
  * quantiles) a continuously-ingesting pipeline keeps per column.
  *
  * Same structure as StreamingTopK deliberately: items pre-hashed into
  * `groups` substreams, an independent sketch per group, a monotonic
  * per-group version stamped on every snapshot, and optional idle
  * eviction that drops the sketch payload to an O(1) version tombstone
  * (the version survives so a reader's latest-by-version selection never
  * resurrects stale snapshots). State per group is
  * O(capacity·log(n/capacity)) regardless of stream length.
  */
object StreamingQuantiles {

  case class QSnapshot(group: Int, batch: Long, n: Long, quantiles: Seq[Double])

  def quantiles(
      items: Dataset[Double],
      groups: Int,
      capacity: Int,
      fractions: Seq[Double],
      idleTimeout: Option[FiniteDuration] = None): Dataset[QSnapshot] = {
    val spark = items.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    items
      .groupByKey(v => math.floorMod(java.lang.Double.hashCode(v), groups))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf) {
        (group: Int, it: Iterator[Double], state: GroupState[(Long, Array[Byte])]) =>
          if (state.hasTimedOut) {
            state.update((state.get._1, Array.emptyByteArray))
            Iterator.empty
          } else {
            val (version, sketch) = state.getOption
              .map { case (v, bytes) =>
                (v, if (bytes.isEmpty) new QuantileSketch(capacity)
                    else QuantileSketch.deserialize(bytes))
              }
              .getOrElse((0L, new QuantileSketch(capacity)))
            it.foreach(sketch.add)
            val nextVersion = version + 1
            state.update((nextVersion, sketch.serialized))
            idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
            Iterator.single(
              QSnapshot(group, nextVersion, sketch.n, fractions.map(sketch.quantile)))
          }
      }
  }
}
