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

  test("a parquet round-tripped index produces identical decisions") {
    // the production shape: index tables written once, read back on
    // every increment — storage must not change a single decision
    val corpus = Dedup.corpusWithNearDupes(spark, sf0001)
    val (ish, ib) = Dedup.dedupIndexTables(
      corpus.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0))
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-idx-").toString
    ish.write.mode("overwrite").parquet(s"$dir/shingles.parquet")
    ib.write.mode("overwrite").parquet(s"$dir/bands.parquet")
    val stored = Dedup.dedupIncrementalAgainst(
        spark.read.parquet(s"$dir/shingles.parquet"),
        spark.read.parquet(s"$dir/bands.parquet"),
        corpus.filter(org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val direct = Dedup.dedupIncremental(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(stored === direct)
  }
}
