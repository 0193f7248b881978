package graft

import graft.functions.Dedup

/** Differential pin for incremental dedup: the full verified pair set
  * (`dedupMinhash`, itself oracle-gated) implies exactly which incoming
  * (odd-id) docs the incremental run must drop — a pair (a < b) drops b
  * when b is incoming (its partner is the index or an earlier incoming
  * doc), and drops a when a is incoming and b is the index.
  */
class IncrementalDedupSpec extends SparkTestBase {

  test("incremental decisions match the full pair set restricted to index ∪ earlier-incoming") {
    val pairs = Dedup.dedupMinhash(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    val expectedDrop = pairs.flatMap { case (a, b) =>
      (if (b % 2 == 1) Seq(b) else Seq.empty) ++ // incoming with index or smaller-incoming partner
        (if (a % 2 == 1 && b % 2 == 0) Seq(a) else Seq.empty) // incoming with (larger-id) index partner
    }.toSet
    val out = Dedup.dedupIncremental(spark, sf0001).collect()
    val got = out.filter(_.getAs[String]("action") == "drop")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got === expectedDrop)
    // exactly the incoming half is adjudicated, each doc once
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
    assert(out.forall(_.getAs[Long]("doc_id") % 2 == 1))
  }
}
