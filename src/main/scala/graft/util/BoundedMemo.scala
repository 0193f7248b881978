package graft.util

/** Bounded LRU memo — the one cache shape every driver-side trained
  * artifact (PCA axis, k-means centroids, quantized embed frames,
  * dedup pipeline frames) shares, so a long-lived session cycling
  * many (session, dir) keys can never pin unbounded driver state.
  *
  * Semantics:
  *  - `getOrElseUpdate` is LRU, not FIFO: a HIT re-inserts the key at
  *    the back, so the hot long-lived entry is never the eviction
  *    victim while idle entries age out (the ADVICE r16 finding on
  *    pcaFrameMemo's insertion-order eviction).
  *  - eviction (and `clear`) calls `onEvict` so holders of Spark-side
  *    resources (cached frames, localCheckpoint blocks) can release
  *    them; for plain values the default no-op applies.
  *  - all access is synchronized on the memo. `build` runs under the
  *    lock — these builds happen once per QUERY CONSTRUCTION, never
  *    per row, and serializing them also dedupes concurrent trainers
  *    racing on the same key (the pre-existing contract of every
  *    call site).
  *
  * A just-evicted value may still be referenced by a caller that
  * fetched it earlier — eviction only releases the CACHE SLOT;
  * lifetime of the value itself is the caller's (and, for frames,
  * the ContextCleaner's) business. */
final class BoundedMemo[K, V](
    val max: Int, onEvict: (K, V) => Unit = (_: K, _: V) => ()) {
  require(max >= 1, s"memo bound must be >= 1, got $max")

  private val m = scala.collection.mutable.LinkedHashMap.empty[K, V]

  def getOrElseUpdate(k: K)(build: => V): V = synchronized {
    m.remove(k) match {
      case Some(v) =>
        m.put(k, v) // move-to-end: LRU touch
        v
      case None =>
        val v = build
        m.put(k, v)
        while (m.size > max) {
          val (ek, ev) = m.head
          m.remove(ek)
          onEvict(ek, ev)
        }
        v
    }
  }

  /** Drop one key (with onEvict) — returns whether it existed. */
  def invalidate(k: K): Boolean = synchronized {
    m.remove(k) match {
      case Some(v) => onEvict(k, v); true
      case None => false
    }
  }

  /** Drop everything (each entry gets onEvict). */
  def clear(): Unit = synchronized {
    val all = m.toList
    m.clear()
    all.foreach { case (k, v) => onEvict(k, v) }
  }

  def size: Int = synchronized(m.size)

  /** Current keys, eldest (next victim) first — for tests/telemetry. */
  def keysEldestFirst: List[K] = synchronized(m.keys.toList)
}
