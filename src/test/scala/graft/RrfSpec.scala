package graft

import graft.functions.{Similarity, TextAnalysis}

/** Pins the RRF fusion against a driver-side recomputation from the
  * two ranking gates' own outputs — the fusion is pure bounded-list
  * algebra, so the model is exact. */
class RrfSpec extends SparkTestBase {

  test("retrieval_rrf == driver RRF over the two gate outputs (exact)") {
    val ann = Similarity.annBrute(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bmRanked = TextAnalysis.bm25Score(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (d, sc) => (-sc, d) }
      .zipWithIndex.map { case ((d, _), i) => d -> (i + 1L) }
      .filter(_._2 <= Similarity.TopK).toMap
    val qids = ann.keysIterator.map(_._1).toSeq.distinct
    val want = qids.flatMap { q =>
      val cands = ann.keysIterator.collect { case (`q`, c) => c }.toSet ++ bmRanked.keySet
      cands.toSeq.map { c =>
        val rrf = ann.get((q, c)).map(r => 1000000L / (Similarity.RrfK + r)).getOrElse(0L) +
          bmRanked.get(c).map(r => 1000000L / (Similarity.RrfK + r)).getOrElse(0L)
        (q, c, rrf)
      }.sortBy { case (_, c, rrf) => (-rrf, c) }
        .zipWithIndex.map { case ((_, c, rrf), i) => (q, c, rrf, i + 1L) }
    }.toSet
    val got = Similarity.retrievalRrf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"fusion diverges from the driver model")
    // sanity: every query fuses both lists — some doc carries BOTH discounts
    assert(got.exists { case (_, c, rrf, _) =>
      bmRanked.contains(c) && rrf > 1000000L / (Similarity.RrfK + Similarity.TopK) })
  }
}
