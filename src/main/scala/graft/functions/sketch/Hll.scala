package graft.functions.sketch

import java.nio.charset.StandardCharsets

import graft.functions.Profiling

/** Driver/executor-side HLL register array — the same registers the
  * `approx_ndv` gate computes relationally (`Profiling.hllSummary`):
  * identical md5-derived 52-bit hash, identical bucket/rank split, so a
  * sketch built here from raw tokens equals the batch aggregate's
  * register summary bit-for-bit (spec-pinned). Powers the streaming
  * form ([[graft.streaming.StreamingNdv]]), where the register array is
  * the per-group `GroupState` payload: fixed 2^p bytes per group, an
  * elementwise-max merge, O(1) per token.
  */
object Hll {
  val P: Int = Profiling.HllP
  val M: Int = Profiling.HllM
  val MaxRank: Int = Profiling.HllMaxRank

  /** Per-thread MD5 instance (r20): `MessageDigest.getInstance` does a
    * provider lookup + allocation PER CALL, and [[h52]] runs once per
    * token/hit in the streaming sketch kernels (paths_agg, kmv, ndv) —
    * `digest()` resets the instance, so reuse is value-identical. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 52-bit md5-derived hash, equal to the relational
    * `h32(tok)·2^20 + (h32b(tok) mod 2^20)` (md5 hex chars 1-8 and 9-16
    * are the digest's first and second 4 bytes). */
  def h52(token: String): Long = {
    val d = md5.get().digest(token.getBytes(StandardCharsets.UTF_8))
    def be32(off: Int): Long =
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    be32(0) * (1L << 20) + (be32(4) % (1L << 20))
  }

  def deserialize(bytes: Array[Byte]): Hll = {
    require(bytes.length == M, s"register array must be $M bytes")
    new Hll(bytes.clone())
  }
}

final class Hll private[sketch] (private val ranks: Array[Byte]) {
  def this() = this(new Array[Byte](Hll.M))

  def add(token: String): Unit = {
    val h = Hll.h52(token)
    val b = (h % Hll.M).toInt
    val w = h >>> Hll.P
    // bitlen(w) = 64 - nlz(w); rank = maxRank - bitlen, w = 0 -> maxRank
    val r =
      if (w == 0L) Hll.MaxRank
      else Hll.MaxRank - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (r > ranks(b)) ranks(b) = r.toByte
  }

  def merge(other: Hll): Unit = {
    var i = 0
    while (i < ranks.length) {
      if (other.ranks(i) > ranks(i)) ranks(i) = other.ranks(i)
      i += 1
    }
  }

  /** Registers in the gate's integer-summary form. */
  def nBucketsHit: Long = ranks.count(_ > 0).toLong
  def sumRank: Long = { var s = 0L; ranks.foreach(s += _); s }
  def zScaled: Long =
    ranks.iterator.filter(_ > 0).map(r => 1L << (Hll.MaxRank - r)).sum

  def estimate: Double = Profiling.hllEstimate(nBucketsHit, zScaled.toDouble)

  def serialized: Array[Byte] = ranks.clone()
}
