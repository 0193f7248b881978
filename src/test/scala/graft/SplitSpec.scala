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
}
