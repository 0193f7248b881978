package graft

import graft.functions.Dedup

/** Pins the leakage-safety CONTRACT (the hash gate only pins
  * determinism): no near-dup cluster spans train and eval, eval mass
  * tracks the hash rate, and a doc-level hash split on the same corpus
  * WOULD leak — the failure mode this operator exists to prevent. */
class SplitSpec extends SparkTestBase {

  test("no cluster spans splits; eval rate tracks; doc-level split would leak") {
    val s = spark
    import s.implicits._
    val rows = Dedup.splitLeakageSafe(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // leakage safety: one split per cluster
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length == 1, s"cluster $c spans splits")
    }
    // the eval rate tracks the 10% hash rate at cluster granularity
    val evalFrac = rows.count(_._3 == "eval").toDouble / rows.length
    assert(evalFrac > 0.02 && evalFrac < 0.25, s"eval fraction $evalFrac")
    // the counterfactual: doc-id-hash splits DO split at least one
    // multi-doc cluster on this corpus (so the cluster hash is load-
    // bearing, not vacuous)
    import graft.functions.Portable
    import org.apache.spark.sql.functions._
    val docSplit = rows.map { case (d, c, _) => (d, c) }.toSeq
      .toDF("doc_id", "cluster")
      .select(col("cluster"),
        (pmod(Portable.h32(col("doc_id").cast("string")), lit(100L)) < 10)
          .as("eval"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val leaky = docSplit.groupBy(_._1).exists(_._2.map(_._2).distinct.length > 1)
    assert(leaky, "corpus has no multi-doc cluster a doc-level split would break")
  }

  test("contamination card: cluster policy zero, doc policy matches a driver replay") {
    val got = Dedup.reportSplitContamination(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == Set("cluster_hash", "doc_hash"))
    val (nd, _, leakC, ppmC) = got("cluster_hash")
    assert(leakC == 0L && ppmC == 0L,
      s"cluster-hash split leaked $leakC eval docs — leakage-safety broken")
    // driver replay of the doc-hash leak from the pair set + the same
    // md5 bucket rule
    import graft.functions.Portable
    import org.apache.spark.sql.functions._
    val pairs = Dedup.dedupDropList(spark, sf0001) // warm shared pipeline
    assert(pairs.columns.nonEmpty)
    val verified = Dedup.verifiedPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val corpus = Dedup.corpusWithNearDupes(spark, sf0001)
      .select(col("doc_id"),
        (pmod(Portable.h32(col("doc_id").cast("string")), lit(100L)) < 10).as("ed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val leakedDocs = (verified.flatMap { case (a, b) => Seq((a, b), (b, a)) })
      .collect { case (d, o) if corpus(d) && !corpus(o) => d }.distinct.length
    val (nd2, nEvalD, leakD, ppmD) = got("doc_hash")
    assert(nd == nd2 && nd == corpus.size.toLong)
    assert(leakD == leakedDocs.toLong,
      s"doc-hash leak $leakD != driver replay $leakedDocs")
    assert(ppmD == leakD * 1000000L / math.max(nEvalD, 1L))
  }
}
