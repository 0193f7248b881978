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
  * The counter index is the paper's Stream-Summary structure: a
  * doubly-linked list of buckets in ascending estimate order, each
  * holding its items in insertion order (deterministic victim). A unit
  * update moves an item at most one bucket forward, eviction reads the
  * head bucket — O(1) amortized per `add(_, 1)`, the shape of the
  * per-token hot loop in TopKSketchAgg (a TreeMap index paid O(log
  * capacity) plus boxed-Long key churn per token). Weighted adds walk
  * forward bucket-by-bucket (bounded by the distinct estimates passed,
  * with a direct tail append when the new estimate exceeds the max).
  *
  * Exact top-k over 100 TB of tokens needs a full vocabulary shuffle;
  * this sketch needs O(capacity) state per partition/group and one
  * merge pass, the standard trade for frequent-item mining at scale.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0, "capacity must be positive")

  /** One distinct estimate value; items in insertion order. */
  private final class Bucket(val est: Long) extends Serializable {
    val items = mutable.LinkedHashSet.empty[String]
    var prev: Bucket = _
    var next: Bucket = _
  }

  /** ascending-estimate bucket list: head = minimum, tail = maximum */
  private var head: Bucket = _
  private var tail: Bucket = _
  /** item -> (its bucket, overestimation error) */
  private val index = mutable.HashMap.empty[String, (Bucket, Long)]
  private var totalWeight = 0L

  def n: Long = totalWeight
  def size: Int = index.size

  private def linkAfter(prevB: Bucket, est: Long): Bucket = {
    val b = new Bucket(est)
    b.prev = prevB
    b.next = if (prevB == null) head else prevB.next
    if (b.prev == null) head = b else b.prev.next = b
    if (b.next == null) tail = b else b.next.prev = b
    b
  }

  /** Remove `item` from `b`, unlinking `b` when it empties (its own
    * prev/next stay intact so a caller can keep walking from it). */
  private def removeFrom(b: Bucket, item: String): Unit = {
    b.items.remove(item)
    if (b.items.isEmpty) {
      if (b.prev == null) head = b.next else b.prev.next = b.next
      if (b.next == null) tail = b.prev else b.next.prev = b.prev
    }
  }

  /** Find-or-create the bucket for `est`, walking forward from `start`
    * (`null` ⇒ the list head; every bucket before `start` must hold a
    * smaller estimate). O(1) when the target is at most one bucket
    * ahead (the unit-weight hot path) or beyond the tail. */
  private def locate(start: Bucket, startPrev: Bucket, est: Long): Bucket = {
    if (head == null) return linkAfter(null, est)
    if (est > tail.est) return linkAfter(tail, est)
    if (est == tail.est) return tail
    var prevB = if (start == null) null else startPrev
    var cur = if (start == null) head else start
    while (cur != null && cur.est < est) { prevB = cur; cur = cur.next }
    if (cur != null && cur.est == est) cur else linkAfter(prevB, est)
  }

  def add(item: String, weight: Long = 1L): Unit = {
    require(weight >= 0)
    totalWeight += weight
    index.get(item) match {
      case Some((b, err)) =>
        if (weight > 0) {
          val newEst = b.est + weight
          val wasTail = b.next == null
          removeFrom(b, item) // may unlink b; b.prev/b.next survive
          val target =
            if (wasTail) locate(null, null, newEst) // tail fast path fires
            else locate(b.next, if (b.items.isEmpty) b.prev else b, newEst)
          target.items.add(item)
          index.update(item, (target, err))
        } else {
          // weight 0: estimate unchanged, but the touch still refreshes
          // the item's position within its bucket (remove + re-append),
          // exactly as the previous remove/re-add index did — keeps the
          // deterministic eviction tiebreak identical across versions
          b.items.remove(item)
          b.items.add(item)
        }
      case None if index.size < capacity =>
        val target = locate(null, null, weight)
        target.items.add(item)
        index.update(item, (target, 0L))
      case None =>
        // evict the (deterministic) minimum counter — the head bucket's
        // earliest-inserted item; the newcomer inherits its count as
        // overestimation error
        val minEst = head.est
        val victim = head.items.head
        removeFrom(head, victim)
        index.remove(victim)
        val target = locate(null, null, minEst + weight)
        target.items.add(item)
        index.update(item, (target, minEst))
    }
  }

  /** This sketch's floor for untracked items: anything not in the
    * counters has true count ≤ this. */
  private def minEstimateFloor: Long =
    if (index.size >= capacity) head.est else 0L

  /** Merge `other` into this sketch (standard merged-SS: absent side
    * contributes its min-estimate floor to est AND err), re-truncating
    * to capacity by largest estimate with a deterministic tiebreak. */
  def merge(other: SpaceSaving): SpaceSaving = {
    require(other.capacity == capacity, "capacity mismatch")
    val myFloor = minEstimateFloor
    val otherFloor = other.minEstimateFloor
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    index.foreach { case (item, (b, err)) =>
      other.index.get(item) match {
        case Some((ob, oErr)) => merged.update(item, (b.est + ob.est, err + oErr))
        case None => merged.update(item, (b.est + otherFloor, err + otherFloor))
      }
    }
    other.index.foreach { case (item, (ob, oErr)) =>
      if (!index.contains(item))
        merged.update(item, (ob.est + myFloor, oErr + myFloor))
    }
    totalWeight += other.totalWeight
    val kept = merged.toSeq.sortBy { case (item, (est, _)) => (-est, item) }.take(capacity)
    index.clear(); head = null; tail = null
    // descending-estimate replay: every insert lands at (or before) the
    // current head, so the rebuild is O(capacity)
    kept.foreach { case (item, (est, err)) => restore(item, est, err) }
    this
  }

  /** Top-k by estimated count (ties by item), with (lower, upper) count
    * bounds: upper = est, lower = est − err. Pass `capacity` to list
    * every tracked item (the set the frequency guarantee covers). */
  def topK(k: Int): Seq[(String, Long, Long)] =
    index.toSeq
      .sortBy { case (item, (b, _)) => (-b.est, item) }
      .take(k)
      .map { case (item, (b, err)) => (item, b.est - err, b.est) }

  private[sketch] def restore(item: String, est: Long, err: Long): Unit = {
    val target = locate(null, null, est)
    target.items.add(item)
    index.update(item, (target, err))
  }
  private[sketch] def restoreTotal(t: Long): Unit = totalWeight = t

  def serialized: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(capacity); out.writeLong(totalWeight); out.writeInt(index.size)
    // BUCKET order (ascending estimate; insertion order within a
    // bucket), NOT item-sorted: restore() replays adds in read order,
    // so this reproduces every bucket's insertion order exactly and the
    // deterministic-victim eviction tiebreak survives serialize/
    // deserialize (checkpoint restore, partial-agg shuffle) — an
    // item-sorted dump silently re-ordered the tiebreak (ADVICE r2).
    // Ascending replay appends at the tail, so deserialize is O(m).
    var b = head
    while (b != null) {
      val est = b.est
      b.items.foreach { item =>
        val err = index(item)._2
        val bytes = item.getBytes("UTF-8")
        out.writeInt(bytes.length); out.write(bytes)
        out.writeLong(est); out.writeLong(err)
      }
      b = b.next
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
