package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** INCREMENTAL near-duplicate detection — the streaming form of the
  * batch MinHash-LSH pipeline (`Dedup.dedupMinhash`): every arriving
  * document is sketched to the SAME 64-lane MinHash signature and the
  * same 16×4 LSH bands as the batch operator (JVM twin of the
  * `MinHash64` expression — equality spec-pinned), then routed to its
  * 16 (band, band_hash) buckets; each bucket holds the signatures of
  * the documents seen there and emits a candidate pair the moment a new
  * arrival collides with one. Pair similarity is the signature-estimated
  * Jaccard (matching lanes / 64) — the streaming trade: no shingle sets
  * in state, so verification is sketch-based rather than exact.
  *
  * Contracts, stated plainly:
  *  - a pair sharing k bands is emitted (up to) k times, possibly in
  *    different micro-batches — at-least-once per band; route through
  *    `StreamingDedup` (or a downstream `dropDuplicates`) for
  *    exactly-once pairs;
  *  - state per bucket is capped at `maxBucket` signatures (first-seen
  *    kept — the batch operator's keep-smallest-id convention makes
  *    first-seen the representative that matters); an overflowing
  *    bucket stops ACCUMULATING but keeps matching against what it
  *    holds, so recall degrades gracefully on adversarial bucket skew
  *    instead of state growing without bound;
  *  - at 100 TB/day the bucket keyspace is the band space — state is
  *    hash-partitioned across executors exactly like the batch band
  *    join's shuffle, and `idleTimeout` evicts buckets cold for the
  *    horizon (the batch twin of a time-windowed dedup scope).
  */
object StreamingNearDup {

  val Perms = 64
  val BandRows = 4
  val Bands: Int = Perms / BandRows
  private val Mod = 2147483647L

  case class CandidatePair(doc_a: Long, doc_b: Long, est_jacc: Double)

  /** JVM twin of the batch signature path: lower-cased whitespace
    * tokens → distinct word 3-shingles (whole text when shorter) →
    * 64-lane MinHash. Must stay bit-equal to
    * `MinHash64(array_distinct(shingles3(tokens(text))))` —
    * StreamingNearDupSpec pins it against the expression. */
  def signature(text: String): Array[Long] = {
    // parity traps, both spec-pinned: limit -1 keeps trailing empty
    // tokens exactly like Spark's split (Java's default limit 0 drops
    // them), and Locale.ROOT matches Spark's locale-independent lower()
    // (a Turkish-locale JVM would otherwise produce a dotless ı)
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val shingles: Array[String] =
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toArray.distinct
      else Array(toks.mkString(" "))
    val sig = Array.fill(Perms)(Mod)
    shingles.foreach { sh =>
      // ThreadLocal digest (Md5Hash) — getInstance per shingle would
      // dominate the per-event cost
      val h = graft.functions.expressions.Md5Hash
        .hashPair(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))._1
      var j = 0
      while (j < Perms) {
        val x = ((2L * j + 1) * h + 1000003L * j + 12345L) % Mod
        if (x < sig(j)) sig(j) = x
        j += 1
      }
    }
    sig
  }

  /** The batch band hashes: positional 31^k weighted sum of each band's
    * [[BandRows]] lanes. */
  def bandHashes(sig: Array[Long]): Array[Long] =
    Array.tabulate(Bands) { b =>
      var h = 0L
      var k = 0
      while (k < BandRows) { h += sig(b * BandRows + k) * math.pow(31, k).toLong; k += 1 }
      h
    }

  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < Perms) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / Perms
  }

  /** The per-bucket state transition — exposed so the timeout/overflow
    * semantics are unit-testable with `TestGroupState` (wall-clock
    * processing-time timeouts are not deterministically drivable
    * through MemoryStream). A timed-out bucket is removed outright: its
    * payload IS the value (no version chain to preserve), so one idle
    * period frees both payload and key. */
  /** r20 (state-encoder packing, the q76 discipline): the bucket's held
    * signatures are (ids: Array[Long], sigs: Array[Long] flattened
    * n×[[Perms]]) instead of Seq[(Long, Array[Long])] — the Seq-of-struct
    * wrapper paid a per-entry Catalyst round-trip per bucket per batch;
    * both arrays encode as primitive UnsafeArrayData copies. Held order,
    * cap semantics (first-seen kept; an overflowing bucket stops
    * accumulating but keeps matching) and emitted pairs are identical —
    * StreamingNearDupSpec's cross-batch/cap/overflow pins are unchanged. */
  private[streaming] def bucketUpdate(
      maxBucket: Int,
      idleTimeout: Option[scala.concurrent.duration.FiniteDuration])(
      key: (Int, Long), it: Iterator[((Int, Long), Long, Array[Long])],
      state: GroupState[(Array[Long], Array[Long])]): Iterator[CandidatePair] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val (heldIds0, heldSigs0) = state.getOption
        .getOrElse((Array.emptyLongArray, Array.emptyLongArray))
      // deterministic intra-batch order; skip ids already held
      // (an exact replay must not pair a doc with itself)
      val heldIds = heldIds0.toSet
      val arrivals = it.map(t => (t._2, t._3)).toSeq
        .filterNot(a => heldIds(a._1))
        .distinctBy(_._1).sortBy(_._1)
      val n0 = heldIds0.length
      val appended = math.min(arrivals.length, math.max(0, maxBucket - n0))
      val ids = java.util.Arrays.copyOf(heldIds0, n0 + appended)
      val sigs = java.util.Arrays.copyOf(heldSigs0, (n0 + appended) * Perms)
      var nHeld = n0
      val out = Seq.newBuilder[CandidatePair]
      arrivals.foreach { case (id, sig) =>
        var i = 0
        while (i < nHeld) {
          var eq = 0
          var j = 0
          while (j < Perms) {
            if (sigs(i * Perms + j) == sig(j)) eq += 1
            j += 1
          }
          out += CandidatePair(math.min(id, ids(i)), math.max(id, ids(i)),
            eq.toDouble / Perms)
          i += 1
        }
        if (nHeld < maxBucket) {
          ids(nHeld) = id
          System.arraycopy(sig, 0, sigs, nHeld * Perms, Perms)
          nHeld += 1
        }
      }
      state.update((ids, sigs))
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Candidate pairs (doc_a < doc_b, signature-estimated Jaccard) from
    * a stream of (doc_id, text). */
  def candidates(
      docs: Dataset[(Long, String)],
      maxBucket: Int = 64,
      idleTimeout: Option[scala.concurrent.duration.FiniteDuration] = None)
      : Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    docs
      .flatMap { case (id, text) =>
        val sig = signature(text)
        bandHashes(sig).zipWithIndex.map { case (h, b) => ((b, h), id, sig) }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        bucketUpdate(maxBucket, idleTimeout))
  }
}
