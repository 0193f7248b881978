package graft.functions.sketch

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch: the multi-level compacting-buffer scheme of
  * Manku/Rajagopalan/Lindsay ("Approximate medians and other quantiles
  * in one pass and with limited memory", SIGMOD 1998), the deterministic
  * ancestor of KLL — `levels(i)` holds a sorted array of items each
  * representing 2^i originals; when a level outgrows `capacity` it is
  * compacted (every other element survives) into the level above.
  *
  * Determinism: the surviving parity alternates per level compaction
  * (an explicit counter, not a random bit as in KLL) so a given insert
  * sequence always yields the same sketch — the property that lets the
  * exact regime be oracle-checked. The randomized variant's guarantees
  * degrade to deterministic worst-case rank error O(log²(n/k)·2^i/k)
  * terms; the observed error is pinned empirically in QuantileSketchSpec.
  *
  * EXACT MODE (the gate trick, same as SpaceSaving's approx_top_terms):
  * while total inserted count ≤ capacity, no compaction ever fires, every
  * weight is 1, and [[quantile]] is the exact nearest-rank statistic —
  * reproducible by plain ranked SQL regardless of merge order.
  *
  * Query semantics: nearest-rank — `quantile(q)` is the smallest tracked
  * value whose cumulative weight ≥ max(1, ceil(q·n)).
  *
  * Scale: O(capacity · log(n/capacity)) state per partial, merged
  * level-wise — against an exact per-group sort this is the standard
  * trade for percentile profiling over 100 TB (and the batch aggregate
  * gets map-side combine from TypedImperativeAggregate for free).
  */
final class QuantileSketch(val capacity: Int) extends Serializable {
  require(capacity >= 2, "capacity must be >= 2")

  /** levels(i): SORTED values of weight 2^i (level 0's buffer is kept
    * unsorted until a compaction or query touches it). */
  private var levels = ArrayBuffer(ArrayBuffer.empty[Double])
  private var level0Sorted = true
  /** per-level compaction counter — parity picks the surviving offset */
  private var compactions = ArrayBuffer(0L)
  private var totalCount = 0L

  def n: Long = totalCount
  def numLevels: Int = levels.size
  /** retained items across all levels (the memory footprint) */
  def size: Int = levels.iterator.map(_.size).sum

  def add(v: Double): Unit = {
    levels(0) += v
    level0Sorted = false
    totalCount += 1
    if (levels(0).size > capacity) compactLevel(0)
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) { levels += ArrayBuffer.empty[Double]; compactions += 0L }

  private def sortLevel0(): Unit =
    if (!level0Sorted) { levels(0) = levels(0).sorted; level0Sorted = true }

  /** Sort (level 0 only), keep elements at parity, parity+2, … of the
    * EVEN prefix and spill them one level up (2m items of weight w →
    * m items of weight 2w — total weight conserved exactly); an odd
    * leftover stays at this level. Cascades when the upper level
    * overflows. */
  private def compactLevel(i: Int): Unit = {
    if (i == 0) sortLevel0()
    val src = levels(i)
    val even = src.size - (src.size % 2)
    val parity = (compactions(i) % 2).toInt
    compactions(i) += 1
    ensureLevel(i + 1)
    val up = levels(i + 1)
    var j = parity
    while (j < even) { up += src(j); j += 2 }
    levels(i) =
      if (src.size % 2 == 1) ArrayBuffer(src.last) else ArrayBuffer.empty[Double]
    // the upper level must stay sorted for its own future compaction
    levels(i + 1) = up.sorted
    if (levels(i + 1).size > capacity) compactLevel(i + 1)
  }

  /** Level-wise merge; compaction only when a level overflows, so two
    * exact-mode sketches whose total count fits stay exact. */
  def merge(other: QuantileSketch): QuantileSketch = {
    require(other.capacity == capacity, "merge requires equal capacity")
    other.sortLevel0()
    sortLevel0()
    var i = 0
    while (i < other.levels.size) {
      ensureLevel(i)
      levels(i) = (levels(i) ++ other.levels(i)).sorted
      compactions(i) += other.compactions(i)
      i += 1
    }
    totalCount += other.totalCount
    i = 0
    while (i < levels.size) {
      if (levels(i).size > capacity) compactLevel(i)
      i += 1
    }
    this
  }

  /** All (value, weight) pairs in ascending value order. */
  private def weighted(): Array[(Double, Long)] = {
    sortLevel0()
    val out = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortBy(_._1).toArray
  }

  /** Nearest-rank quantile: smallest value with cumulative weight ≥
    * max(1, ceil(q·n)). Returns NaN on an empty sketch. */
  def quantile(q: Double): Double = {
    if (totalCount == 0) return Double.NaN
    val target = math.max(1L, math.ceil(q * totalCount).toLong)
    val items = weighted()
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    items.last._1
  }

  /** Estimated rank (cumulative weight of values ≤ v). */
  def rank(v: Double): Long = {
    var cum = 0L
    for ((x, w) <- weighted() if x <= v) cum += w
    cum
  }

  def serialized: Array[Byte] = {
    sortLevel0()
    val nItems = size
    val buf = ByteBuffer.allocate(4 + 8 + 4 + levels.size * (8 + 4) + nItems * 8)
    buf.putInt(capacity)
    buf.putLong(totalCount)
    buf.putInt(levels.size)
    for (i <- levels.indices) {
      buf.putLong(compactions(i))
      buf.putInt(levels(i).size)
      levels(i).foreach(buf.putDouble)
    }
    buf.array()
  }
}

object QuantileSketch {
  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val buf = ByteBuffer.wrap(bytes)
    val sk = new QuantileSketch(buf.getInt)
    sk.totalCount = buf.getLong
    val nLevels = buf.getInt
    sk.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Double])
    sk.compactions = ArrayBuffer.fill(nLevels)(0L)
    for (i <- 0 until nLevels) {
      sk.compactions(i) = buf.getLong
      val sz = buf.getInt
      val arr = ArrayBuffer.empty[Double]
      var j = 0
      while (j < sz) { arr += buf.getDouble; j += 1 }
      sk.levels(i) = arr
    }
    sk.level0Sorted = true
    sk
  }
}
