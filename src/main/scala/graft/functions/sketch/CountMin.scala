package graft.functions.sketch

/** JVM-side Count-Min counter array — the same d×2^wBits cells the
  * relational `Profiling.cmsCounters` computes: identical md5-derived
  * 52-bit hash ([[Hll.h52]]), identical wBits-bit slice buckets
  * (row i reads h52 bits [wBits·i, wBits·(i+1))), so a sketch built
  * here from raw tokens equals the batch aggregate's counter table
  * cell-for-cell (spec-pinned). Powers the streaming form
  * ([[graft.streaming.StreamingCountMin]]), where the cell array is the
  * per-group `GroupState` payload: fixed d·2^wBits longs per group,
  * cell-wise-add merge, O(d) per token.
  */
object CountMin {
  /** Batch-gate geometry (Profiling.CmsWBits/CmsD): d=4 × 2^11. */
  val GateWBits = 11
  val GateD = 4
  /** Streaming default: d=4 × 2^8 = 8 KB of longs per group. */
  val StreamWBits = 8

  def apply(wBits: Int, d: Int): CountMin = {
    require(wBits * d <= 52, s"d·wBits must fit the 52-bit hash; got $d×$wBits")
    new CountMin(wBits, d, new Array[Long](d << wBits))
  }

  def deserialize(wBits: Int, d: Int, cells: Array[Long]): CountMin = {
    require(cells.length == (d << wBits),
      s"cell array must be d·2^wBits = ${d << wBits} longs, got ${cells.length}")
    new CountMin(wBits, d, cells.clone())
  }
}

final class CountMin private (
    val wBits: Int, val d: Int, private val cells: Array[Long]) {
  private val w = 1 << wBits
  private val mask = (w - 1).toLong

  def add(token: String): Unit = add(token, 1L)

  def add(token: String, n: Long): Unit = {
    val h = Hll.h52(token)
    var i = 0
    while (i < d) {
      cells(i * w + ((h >>> (wBits * i)) & mask).toInt) += n
      i += 1
    }
  }

  /** Cell-wise addition — counters are linear, so shard sketches fold. */
  def merge(other: CountMin): Unit = {
    require(other.wBits == wBits && other.d == d, "geometry mismatch")
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
  }

  /** Point-frequency estimate: min over the token's d cells — never
    * undercounts, overcounts only by colliding mass. */
  def estimate(token: String): Long = {
    val h = Hll.h52(token)
    var min = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = cells(i * w + ((h >>> (wBits * i)) & mask).toInt)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def serialized: Array[Long] = cells.clone()
}
