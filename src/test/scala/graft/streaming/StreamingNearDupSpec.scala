package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.Tables
import graft.functions.{Dedup, Portable}
import graft.functions.expressions.MinHash64

/** The incremental near-dup index: signature parity with the batch
  * expression, and cross-batch recall of every batch-verified near-dup
  * pair on the same planted corpus.
  */
class StreamingNearDupSpec extends SparkTestBase {

  test("JVM signature equals the batch MinHash64 expression") {
    val rows = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"),
        MinHash64(array_distinct(Portable.shingles3(Portable.tokens(col("text")))))
          .as("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2).toArray))
    rows.foreach { case (id, text, batchSig) =>
      assert(StreamingNearDup.signature(text).sameElements(batchSig),
        s"signature diverges for doc $id")
    }
  }

  test("cross-batch candidates cover every batch-verified near-dup pair") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val originals = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    // the batch operator's planted corpus: perturbed copies of every 7th
    val copies = originals.filter(_._1 % 7 == 0)
      .map { case (id, t) => (id + Dedup.NearDupOffset) -> (t + " graft near dup tail marker") }

    val stream = MemoryStream[(Long, String)]
    val out = StreamingNearDup.candidates(stream.toDS())
    val query = SourceKit.Sinks.toMemory(out.toDF(), "near_dup_cands")
    try {
      stream.addData(originals); query.processAllAvailable()
      stream.addData(copies); query.processAllAvailable() // cross-batch state match
      val emitted = spark.table("near_dup_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      val pairs = emitted.map(_._1).toSet

      val batchPairs = Dedup.dedupMinhash(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchPairs.subsetOf(pairs),
        s"batch-verified pairs missing from the stream: ${batchPairs.diff(pairs)}")

      // planted (original, copy) pairs: LSH can genuinely miss one whose
      // document is short enough that the tail marker rewrites most of
      // its shingles (no band survives — the batch operator misses the
      // same pair), so the contract is high recall, not totality, and a
      // high estimated Jaccard on what IS detected
      val planted = copies.map { case (cid, _) => (cid - Dedup.NearDupOffset, cid) }
      val est = emitted.toMap
      val detected = planted.filter(pairs.contains)
      assert(detected.size * 10 >= planted.size * 8,
        s"planted recall ${detected.size}/${planted.size} below 80%")
      detected.foreach { p =>
        assert(est(p) >= 0.4, s"planted pair $p est_jacc ${est(p)} < 0.4")
      }
    } finally query.stop()
  }

  test("bucket cap bounds state but held docs keep matching") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // identical texts all land in the same buckets; cap = 2 holds only
    // the first two, later arrivals still pair against the held ones
    val stream = MemoryStream[(Long, String)]
    val out = StreamingNearDup.candidates(stream.toDS(), maxBucket = 2)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "near_dup_cap")
    try {
      stream.addData((1L to 4L).map(i => i -> "alpha beta gamma delta epsilon"))
      query.processAllAvailable()
      val pairs = spark.table("near_dup_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
      // held = {1, 2}: pairs are every later id against each held doc
      // (plus 1-2 themselves); 3-4 never pairs because neither is held
      val expected = Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      assert(pairs == expected, s"got $pairs")
    } finally query.stop()
  }

  test("bucket overflow across micro-batches: state rows stay bounded, held docs keep matching") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamingNearDup.candidates(stream.toDS(), maxBucket = 2)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "near_dup_bound")
    def stateRows: Long = query.lastProgress.stateOperators.head.numRowsTotal
    try {
      val text = "alpha beta gamma delta epsilon zeta"
      // batch 1 fills every bucket to the cap (identical texts share all
      // 16 (band, hash) keys)
      stream.addData(Seq(1L -> text, 2L -> text)); query.processAllAvailable()
      assert(stateRows == StreamingNearDup.Bands.toLong,
        s"expected one state row per band, got $stateRows")
      // batch 2 overflows: arrivals still match the HELD docs but the
      // state-store row count must not move — recall degrades gracefully
      // (3-4 never pair: neither is held) instead of state growing
      stream.addData(Seq(3L -> text, 4L -> text)); query.processAllAvailable()
      assert(stateRows == StreamingNearDup.Bands.toLong,
        s"state grew past the bucket cap: $stateRows rows")
      val pairs = spark.table("near_dup_bound").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
      val expected = Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      assert(pairs == expected, s"got $pairs")
    } finally query.stop()
  }

  test("idle eviction removes cold buckets outright (TestGroupState)") {
    // deterministic timeout drive — wall-clock ProcessingTimeTimeout
    // through MemoryStream schedules continuous no-data micro-batches
    // and starves processAllAvailable
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    val sigA = StreamingNearDup.signature("alpha beta gamma delta epsilon zeta")
    // r20 packed bucket state: (ids, flattened signatures)
    type Bucket = (Array[Long], Array[Long])
    def held(ids: Long*): Bucket =
      (ids.toArray, ids.toArray.flatMap(_ => sigA))
    def mkState(s: Option[Bucket], timedOut: Boolean) =
      TestGroupState.create[Bucket](
        s.map(Optional.of[Bucket]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)

    // a cold bucket is removed in one idle period — the payload IS the
    // value (no version chain), so nothing is tombstoned
    val cold = mkState(Some(held(1L, 2L)), timedOut = true)
    val out = StreamingNearDup.bucketUpdate(64, timeout)((0, 7L), Iterator.empty, cold)
    assert(out.isEmpty && cold.isRemoved, "cold bucket not removed on idle timeout")

    // live updates re-arm the idle timer and pair against held docs;
    // eviction then means later arrivals simply re-index fresh
    val live = mkState(Some(held(1L, 2L)), timedOut = false)
    val emitted = StreamingNearDup.bucketUpdate(2, timeout)(
      (0, 7L), Iterator(((0, 7L), 3L, sigA)), live).toSeq
    assert(emitted.map(p => (p.doc_a, p.doc_b)).toSet == Set((1L, 3L), (2L, 3L)))
    assert(live.get._1.length == 2, "full bucket must not grow past maxBucket")
    assert(live.getTimeoutTimestampMs.get() == 1500L, "live bucket timer not re-armed")
  }
}
