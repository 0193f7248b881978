package graft.functions.sketch

import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi —
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005): at most `capacity` counters; an unseen item
  * evicts the minimum counter and inherits its count as overestimation
  * error.
  *
  * Guarantees (n = total weight observed):
  *  - any item with true count > n / capacity is in the sketch;
  *  - for every tracked item: est − err ≤ true count ≤ est.
  * Merging two sketches (pairwise sum, then re-truncate) preserves both
  * bounds with summed errors — which is what makes the aggregate form
  * partial-aggregable (map-side combine) and the streaming form
  * cross-batch correct.
  *
  * Exact top-k over 100 TB of tokens needs a full vocabulary shuffle;
  * this sketch needs O(capacity) state per partition/group and one
  * merge pass, the standard trade for frequent-item mining at scale.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0, "capacity must be positive")

  /** item -> (estimated count, overestimation error) */
  private val counters = mutable.LinkedHashMap.empty[String, (Long, Long)]
  private var totalWeight = 0L

  def n: Long = totalWeight
  def size: Int = counters.size

  def add(item: String, weight: Long = 1L): Unit = {
    require(weight >= 0)
    totalWeight += weight
    counters.get(item) match {
      case Some((est, err)) => counters.update(item, (est + weight, err))
      case None if counters.size < capacity =>
        counters.update(item, (weight, 0L))
      case None =>
        // evict the minimum counter; the newcomer inherits its count as error
        val (minItem, (minEst, _)) = counters.minBy(_._2._1)
        counters.remove(minItem)
        counters.update(item, (minEst + weight, minEst))
    }
  }

  /** Merge `other` into this sketch (pairwise sum, re-truncate to
    * capacity keeping the largest estimates). */
  def merge(other: SpaceSaving): SpaceSaving = {
    require(other.capacity == capacity, "capacity mismatch")
    totalWeight += other.totalWeight
    // items in both: sum est and err; items in one: the absent sketch may
    // have counted it up to its own min estimate — that bound is kept
    // conservative by leaving err unchanged (standard merged-SS variant)
    other.counters.foreach { case (item, (est, err)) =>
      counters.get(item) match {
        case Some((e0, r0)) => counters.update(item, (e0 + est, r0 + err))
        case None => counters.update(item, (est, err))
      }
    }
    if (counters.size > capacity) {
      val keep = counters.toSeq.sortBy { case (item, (est, _)) => (-est, item) }
        .take(capacity)
      counters.clear()
      keep.foreach { case (item, v) => counters.update(item, v) }
    }
    this
  }

  /** Top-k by estimated count (ties by item), with (lower, upper) count
    * bounds: upper = est, lower = est − err. */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq
      .sortBy { case (item, (est, _)) => (-est, item) }
      .take(k)
      .map { case (item, (est, err)) => (item, est - err, est) }

  private[sketch] def restore(item: String, est: Long, err: Long): Unit =
    counters.update(item, (est, err))
  private[sketch] def restoreTotal(t: Long): Unit = totalWeight = t

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(capacity); out.writeLong(totalWeight); out.writeInt(counters.size)
    counters.foreach { case (item, (est, err)) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(est); out.writeLong(err)
    }
    out.flush(); bos.toByteArray
  }
}

object SpaceSaving {
  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val cap = in.readInt()
    val s = new SpaceSaving(cap)
    val total = in.readLong()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      val est = in.readLong(); val err = in.readLong()
      s.restore(new String(b, "UTF-8"), est, err)
      i += 1
    }
    s.restoreTotal(total)
    s
  }
}
