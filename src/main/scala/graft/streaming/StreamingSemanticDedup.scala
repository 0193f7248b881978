package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** INCREMENTAL semantic dedup — the streaming form of the batch
  * SemDeDup operator (`Similarity.dedupSemanticDrops`): every arriving
  * vector is assigned the SAME top-2 codebook cells as the batch
  * operator (JVM twin of `assignCellsTop2` — parity spec-pinned), each
  * cell holds the vectors seen there, and a duplicate pair is emitted
  * the moment an arrival's exact cosine against a cell-mate reaches the
  * threshold. The codebook is a PARAMETER — production trains it
  * offline on a bounded sample (exactly like the batch gate's
  * `ivfCodebookTrained`) and refreshes it out of band; the stream never
  * trains.
  *
  * Contracts, stated plainly (the `StreamingNearDup` contracts, on the
  * embedding axis):
  *  - a pair sharing both top-2 cells is emitted (up to) twice,
  *    possibly in different micro-batches — at-least-once per shared
  *    cell; route through a downstream distinct for exactly-once;
  *  - pairs are (lo, hi) by vec_id regardless of arrival order, so the
  *    keep-lowest-id drop rule (drop every distinct `vec_b`) reproduces
  *    the batch decision even under reordering, as long as both vectors
  *    are retained in a shared cell's state;
  *  - state per cell is capped at `maxCell` vectors (first-seen kept —
  *    the batch keep-lowest convention makes early arrivals the
  *    representatives that matter); an overflowing cell stops
  *    accumulating but keeps matching against what it holds;
  *  - at scale the cell keyspace is the codebook (k cells, k ∝ n/occ in
  *    the production sizing — SCALE.md §Round-11): state is
  *    hash-partitioned across executors like the batch pair join's
  *    shuffle, and `idleTimeout` evicts cells cold for the horizon.
  */
object StreamingSemanticDedup {

  case class DupPair(vec_a: Long, vec_b: Long, sim: Double)

  /** JVM twin of the `CosineSimilarity` expression + the batch `sim`
    * rounding: one fused accumulation loop (identical order ⇒ identical
    * doubles), then HALF_UP round to 6 decimals (Spark's `round`). */
  def cosine6(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = a(i).toDouble
      val yi = b(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** JVM twin of the batch top-2 cell assignment (`assignCellsTop2`):
    * rank centroids by (rounded cosine desc, cent_id asc), take two.
    * `book(i)` is centroid `cent_id = i`. */
  def topCells(v: Array[Float], book: Array[Array[Float]]): Array[Int] = {
    var b1 = -1; var s1 = Double.NegativeInfinity
    var b2 = -1; var s2 = Double.NegativeInfinity
    var ci = 0
    while (ci < book.length) {
      val s = cosine6(v, book(ci))
      // strict > keeps the LOWEST cent_id on ties, matching the batch
      // sort on (-sim, cent_id)
      if (s > s1) { b2 = b1; s2 = s1; b1 = ci; s1 = s }
      else if (s > s2) { b2 = ci; s2 = s }
      ci += 1
    }
    if (b2 < 0) Array(b1) else Array(b1, b2)
  }

  /** Per-cell state transition — exposed for `TestGroupState` unit
    * drive (wall-clock timeouts are not deterministically drivable
    * through MemoryStream). A timed-out cell is removed outright. */
  private[streaming] def cellUpdate(
      threshold: Double, maxCell: Int,
      idleTimeout: Option[scala.concurrent.duration.FiniteDuration])(
      key: Int, it: Iterator[(Int, Long, Array[Float])],
      state: GroupState[Seq[(Long, Array[Float])]]): Iterator[DupPair] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val held = state.getOption.getOrElse(Seq.empty)
      val heldIds = held.iterator.map(_._1).toSet
      // deterministic intra-batch order; an exact replay must not pair
      // a vector with itself
      val arrivals = it.map(t => (t._2, t._3)).toSeq
        .filterNot(a => heldIds(a._1))
        .distinctBy(_._1).sortBy(_._1)
      var acc = held
      val out = Seq.newBuilder[DupPair]
      arrivals.foreach { case (id, v) =>
        acc.foreach { case (oid, ov) =>
          val s = cosine6(v, ov)
          if (s >= threshold)
            out += DupPair(math.min(id, oid), math.max(id, oid), s)
        }
        if (acc.size < maxCell) acc = acc :+ ((id, v))
      }
      // Skip the state-store write for full cells that accepted nothing:
      // rewriting an unchanged maxCell-sized entry every batch is pure
      // churn (RocksDB compaction pressure at scale).
      if (acc ne held) state.update(acc)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Duplicate pairs (vec_a < vec_b, exact rounded cosine ≥ threshold)
    * from a stream of (vec_id, embedding), against the given codebook.
    * Drop rule for consumers: quarantine every distinct `vec_b`. */
  def pairs(
      vecs: Dataset[(Long, Array[Float])],
      book: Array[Array[Float]],
      threshold: Double = graft.functions.Similarity.EmbDupThreshold,
      maxCell: Int = 512,
      idleTimeout: Option[scala.concurrent.duration.FiniteDuration] = None)
      : Dataset[DupPair] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    vecs
      .flatMap { case (id, v) => topCells(v, book).map(c => (c, id, v)) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        cellUpdate(threshold, maxCell, idleTimeout))
  }
}
