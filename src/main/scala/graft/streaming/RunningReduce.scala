package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed running reduce emitting the cumulative value per event —
  * the reference's `keyBy(0).reduce(sum)` whose observed output is the
  * running sums `(a,1)(a,4)(a,12)…` (SURVEY §2.2 B10;
  * `/root/reference/.../WindowAllKeyedPoC.java:145-151`, run log `:55-63`).
  *
  * `flatMapGroupsWithState` in Append mode is the faithful per-event echo
  * (a plain `groupBy.agg` in Update mode only emits once per micro-batch).
  * The batch oracle is the cumulative window function
  * (Relational.q9RunningSum).
  */
object RunningReduce {

  case class Acc[S](value: S)

  /** @param tiebreak total-order tiebreak for equal `orderOf` values —
    *                  without it, tied events fold in arbitrary
    *                  post-shuffle order while the batch oracle (q9)
    *                  orders by (ts, event_id) */
  def keyed[In, K, S](
      ds: Dataset[In],
      zero: S)(
      keyOf: In => K,
      orderOf: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      reduce: (S, In) => S)(
      implicit kEnc: Encoder[K],
      aEnc: Encoder[Acc[S]],
      outEnc: Encoder[(K, S)]): Dataset[(K, S)] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[In], state: GroupState[Acc[S]]) =>
          var acc = state.getOption.map(_.value).getOrElse(zero)
          val out = it.toVector.sortBy(in => (orderOf(in), tiebreak(in))).map { in =>
            acc = reduce(acc, in)
            (key, acc)
          }
          state.update(Acc(acc))
          out.iterator
      }
}
