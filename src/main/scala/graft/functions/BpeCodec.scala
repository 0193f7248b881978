package graft.functions

/** Rank-indexed BPE encoder over a TRAINED merge table — the scalable
  * per-token form (VERDICT r15 residual 1: the nested-HOF batch encode
  * cannot reach a realistic 2k–50k-merge table, and the naive
  * fold-over-all-merges is O(K·len) per token at K merges).
  *
  * The fold the gates pin — apply merge k = 1..K via
  * [[TextAnalysis.mergePass]] in rank order — is replayed here as the
  * classic lowest-rank-present loop: repeatedly find the adjacent pair
  * with the smallest rank and exhaust it. The two are IDENTICAL for
  * any table a BPE trainer emits, because a trained rule's sides must
  * already exist as symbols when the rule is learned, so merging rank
  * r can only create adjacencies whose pair rank is > r (a pair
  * containing the new symbol can only have been learned after the
  * symbol existed) and can never re-create (l, r) itself (new
  * adjacencies all contain the strictly-longer lr). The constructor
  * VALIDATES the two properties that argument actually needs, loudly,
  * instead of silently diverging on a hand-built table the
  * equivalence doesn't cover: (1) every side is a single codepoint or
  * the product of an earlier rule (rank-monotonicity), and (2) no two
  * rules concatenate to the same symbol string — with a duplicate
  * product like (a,bc) and (ab,c) both making "abc", a rule keyed on
  * "abc" could validate against the EARLIER producer while the symbol
  * is created at runtime by the LATER one, re-opening the
  * lower-rank-pair-appears-late hole that breaks loop≡fold. Cost per
  * token: O(passes·len) pair scans with hash lookups,
  * passes ≤ len — independent of K, so a 50k-merge production table
  * encodes at the same per-token price as the 24-merge gate table.
  * Equivalence is differential-pinned against the HOF fold and the
  * driver fold in BpeDeepSpec.
  */
final class BpeCodec(val merges: IndexedSeq[(String, String)]) extends Serializable {
  {
    val produced = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (l, r) =>
      def known(s: String): Boolean =
        s.nonEmpty && (s.codePointCount(0, s.length) == 1 || produced(s))
      require(known(l) && known(r),
        s"merge table is not rank-monotone at ($l, $r): each side must be " +
          "a single codepoint or the product of an earlier merge — the " +
          "lowest-rank encode loop only equals the rank-order fold for " +
          "tables a BPE trainer produced")
      require(!produced(l + r),
        s"two merge rules produce the same symbol '${l + r}': a side keyed " +
          "on it could validate against the earlier producer while the " +
          "later one creates it at runtime, breaking the loop≡fold " +
          "equivalence — BPE vocab entries must be unique")
      produced += (l + r)
    }
  }

  private val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      require(m.put(p, Int.box(i)) == null, s"duplicate merge rule $p")
    }
    m
  }

  /** BPE tokenization of one pretoken. */
  def encode(w: String): Vector[String] = {
    var ts = TextAnalysis.codepointChars(w)
    var done = ts.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < ts.length - 1) {
        val r = ranks.get((ts(i), ts(i + 1)))
        if (r != null && r.intValue < bestRank) bestRank = r.intValue
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (l, r) = merges(bestRank)
        ts = TextAnalysis.mergePass(ts, l, r)
        done = ts.length < 2
      }
    }
    ts
  }

  def encodedLen(w: String): Long = encode(w).length.toLong
}

object BpeCodec {
  def apply(merges: Seq[(String, String)]): BpeCodec =
    new BpeCodec(merges.toIndexedSeq)
}
