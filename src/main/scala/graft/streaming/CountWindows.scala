package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Count windows — fixed-size element-count windows per key, a capability
  * Spark has no built-in for (SURVEY §2.2 B16/B17; reference:
  * `countWindowAll(2)` `/root/reference/.../WindowAllKeyedPoC.java:86-88`
  * and keyed `countWindow` `:111-131`).
  *
  * Semantics match the reference exactly: a window emits when it reaches
  * `size` elements; an incomplete window never emits (the reference's
  * comments document incomplete windows being discarded at shutdown,
  * WindowAllKeyedPoC.java:99-103).
  *
  * State is bounded at `size - 1` buffered elements per key. The batch
  * oracle is `row_number()`-bucketing (Relational.q13CountWindow).
  */
object CountWindows {

  /** Buffered prefix of the next (incomplete) window. */
  case class Buffered[In](items: Seq[In])

  /** Keyed count window (B17). `orderOf` fixes intra-batch processing
    * order so results are deterministic (the reference relies on
    * single-task arrival order; a shuffled Dataset has none). The sort
    * buffers one key's slice of one micro-batch on the heap (see the
    * memory-bound note in RunningReduce.keyed; cross-batch state stays
    * at `size - 1` elements).
    *
    * @param agg fold of one complete window, e.g. sum/label — the
    *            reference's `WindowAgg` surface (WindowAllKeyedPoC.java:20-33)
    */
  def keyed[In, K, Out](
      ds: Dataset[In],
      size: Int)(
      keyOf: In => K,
      orderOf: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      agg: (K, Seq[In]) => Out)(
      implicit kEnc: Encoder[K],
      bEnc: Encoder[Buffered[In]],
      outEnc: Encoder[Out]): Dataset[Out] = {
    require(size > 0, "count window size must be positive")
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[In], state: GroupState[Buffered[In]]) =>
          var buf = state.getOption.map(_.items.toVector).getOrElse(Vector.empty[In])
          val out = Vector.newBuilder[Out]
          it.toVector.sortBy(in => (orderOf(in), tiebreak(in))).foreach { in =>
            buf = buf :+ in
            // >= (a drain), not ==: a restart from a checkpoint written
            // under a larger `size` must not skip past the threshold and
            // buffer forever
            while (buf.size >= size) {
              out += agg(key, buf.take(size))
              buf = buf.drop(size)
            }
          }
          // empty buffer ⇒ no state at all: with NoTimeout, a retained
          // empty Buffered would pin every completed-window key in the
          // StateStore forever (state must track in-flight windows only)
          if (buf.isEmpty) state.remove() else state.update(Buffered(buf))
          out.result().iterator
      }
  }

  /** Global (non-keyed) count window (B16): single logical key, so — like
    * the reference's `countWindowAll` — this path is parallelism-1 by
    * construction. Use [[keyed]] for anything high-volume. */
  def global[In, Out](
      ds: Dataset[In],
      size: Int)(
      orderOf: In => Long,
      tiebreak: In => Long = (_: In) => 0L)(
      agg: Seq[In] => Out)(
      implicit iEnc: Encoder[Int],
      bEnc: Encoder[Buffered[In]],
      outEnc: Encoder[Out]): Dataset[Out] =
    keyed[In, Int, Out](ds, size)(_ => 0, orderOf, tiebreak)((_, items) => agg(items))
}
