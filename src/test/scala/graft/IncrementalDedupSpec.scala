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

  test("two increments through the index update equal one batched increment") {
    // the composability contract that closes the daily-pipeline loop:
    // adjudicate increment 1, fold its keepers into the index
    // (dedupIncrementalStep), adjudicate increment 2 against the updated
    // index — the union of decisions must be byte-identical to pushing
    // both increments through as one batch. Increments are id-ordered
    // (all inc1 ids < all inc2 ids), matching the first-writer-wins rule.
    import org.apache.spark.sql.functions.col
    val corpus = Dedup.corpusWithNearDupes(spark, sf0001)
    val idx = corpus.filter(col("doc_id") % 2 === 0)
    val incoming = corpus.filter(col("doc_id") % 2 =!= 0)
    val median = incoming.stat.approxQuantile("doc_id", Array(0.5), 0.0)(0)
    val inc1 = incoming.filter(col("doc_id") < median)
    val inc2 = incoming.filter(col("doc_id") >= median)
    val (ish, ib) = Dedup.dedupIndexTables(idx)
    val (dec1, ish2, ib2) = Dedup.dedupIncrementalStep(ish, ib, inc1)
    val dec2 = Dedup.dedupIncrementalAgainst(ish2, ib2, inc2)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val sequential = rows(dec1) ++ rows(dec2)
    val batched = rows(Dedup.dedupIncrementalAgainst(ish, ib, incoming))
    assert(sequential.map(_._2).contains("drop"), "regime check: dupes must exist")
    assert(sequential === batched)
    // the stored-decision update path builds the same index tables
    val (ishU, ibU) = Dedup.dedupIndexUpdate(ish, ib, inc1, dec1)
    assert(rows(ishU.select(col("doc_id"), org.apache.spark.sql.functions.lit("x")))
      === rows(ish2.select(col("doc_id"), org.apache.spark.sql.functions.lit("x"))))
    assert(ibU.count() === ib2.count())
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
