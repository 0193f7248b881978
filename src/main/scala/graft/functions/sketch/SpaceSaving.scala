package graft.functions.sketch

import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi —
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005): at most `capacity` counters; an unseen item
  * evicts the minimum counter and inherits its count as overestimation
  * error.
  *
  * Guarantees (n = total weight observed):
  *  - any item with true count > n / capacity is TRACKED (among the
  *    capacity counters — not necessarily in the top-k of estimates,
  *    since evict-inheritors can overestimate past it);
  *  - for every tracked item: est − err ≤ true count ≤ est.
  *
  * Merge follows the standard merged-SS rule: an item absent from one
  * side may have been counted and evicted there up to that side's
  * minimum counter, so the absent side contributes its min estimate to
  * BOTH est and err — keeping est an upper bound and est−err a lower
  * bound after any merge tree, which is what makes the aggregate form
  * partial-aggregable (map-side combine) and the streaming form
  * cross-batch correct.
  *
  * Eviction uses a TreeMap bucket index (est → items, insertion-ordered
  * within a bucket): O(log capacity) per update instead of a linear
  * min-scan — this sits in the per-token hot loop of TopKSketchAgg.
  *
  * Exact top-k over 100 TB of tokens needs a full vocabulary shuffle;
  * this sketch needs O(capacity) state per partition/group and one
  * merge pass, the standard trade for frequent-item mining at scale.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0, "capacity must be positive")

  /** item -> (estimated count, overestimation error) */
  private val counters = mutable.HashMap.empty[String, (Long, Long)]
  /** est -> items at that estimate, insertion-ordered (deterministic victim) */
  private val buckets = new java.util.TreeMap[Long, mutable.LinkedHashSet[String]]
  private var totalWeight = 0L

  def n: Long = totalWeight
  def size: Int = counters.size

  private def bucketAdd(est: Long, item: String): Unit = {
    var set = buckets.get(est)
    if (set == null) { set = mutable.LinkedHashSet.empty[String]; buckets.put(est, set) }
    set.add(item)
  }

  private def bucketRemove(est: Long, item: String): Unit = {
    val set = buckets.get(est)
    set.remove(item)
    if (set.isEmpty) buckets.remove(est)
  }

  def add(item: String, weight: Long = 1L): Unit = {
    require(weight >= 0)
    totalWeight += weight
    counters.get(item) match {
      case Some((est, err)) =>
        counters.update(item, (est + weight, err))
        bucketRemove(est, item); bucketAdd(est + weight, item)
      case None if counters.size < capacity =>
        counters.update(item, (weight, 0L))
        bucketAdd(weight, item)
      case None =>
        // evict the (deterministic) minimum counter; the newcomer
        // inherits its count as overestimation error
        val minEst = buckets.firstKey()
        val victim = buckets.firstEntry().getValue.head
        bucketRemove(minEst, victim)
        counters.remove(victim)
        counters.update(item, (minEst + weight, minEst))
        bucketAdd(minEst + weight, item)
    }
  }

  /** This sketch's floor for untracked items: anything not in the
    * counters has true count ≤ this. */
  private def minEstimateFloor: Long =
    if (counters.size >= capacity) buckets.firstKey() else 0L

  /** Merge `other` into this sketch (standard merged-SS: absent side
    * contributes its min-estimate floor to est AND err), re-truncating
    * to capacity by largest estimate with a deterministic tiebreak. */
  def merge(other: SpaceSaving): SpaceSaving = {
    require(other.capacity == capacity, "capacity mismatch")
    val myFloor = minEstimateFloor
    val otherFloor = other.minEstimateFloor
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    counters.foreach { case (item, (est, err)) =>
      other.counters.get(item) match {
        case Some((oEst, oErr)) => merged.update(item, (est + oEst, err + oErr))
        case None => merged.update(item, (est + otherFloor, err + otherFloor))
      }
    }
    other.counters.foreach { case (item, (oEst, oErr)) =>
      if (!counters.contains(item))
        merged.update(item, (oEst + myFloor, oErr + myFloor))
    }
    totalWeight += other.totalWeight
    val kept = merged.toSeq.sortBy { case (item, (est, _)) => (-est, item) }.take(capacity)
    counters.clear(); buckets.clear()
    kept.foreach { case (item, (est, err)) =>
      counters.update(item, (est, err)); bucketAdd(est, item)
    }
    this
  }

  /** Top-k by estimated count (ties by item), with (lower, upper) count
    * bounds: upper = est, lower = est − err. Pass `capacity` to list
    * every tracked item (the set the frequency guarantee covers). */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq
      .sortBy { case (item, (est, _)) => (-est, item) }
      .take(k)
      .map { case (item, (est, err)) => (item, est - err, est) }

  private[sketch] def restore(item: String, est: Long, err: Long): Unit = {
    counters.update(item, (est, err)); bucketAdd(est, item)
  }
  private[sketch] def restoreTotal(t: Long): Unit = totalWeight = t

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(capacity); out.writeLong(totalWeight); out.writeInt(counters.size)
    // BUCKET order (ascending estimate; insertion order within a
    // bucket), NOT item-sorted: restore() replays adds in read order,
    // so this reproduces every bucket's LinkedHashSet insertion order
    // exactly and the deterministic-victim eviction tiebreak survives
    // serialize/deserialize (checkpoint restore, partial-agg shuffle)
    // — an item-sorted dump silently re-ordered the tiebreak (ADVICE r2)
    val it = buckets.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val est = e.getKey
      e.getValue.foreach { item =>
        val err = counters(item)._2
        val b = item.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.writeLong(est); out.writeLong(err)
      }
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
