package graft

import java.sql.Timestamp

import graft.StreamingBench.BEv

/** Pins the bench-harness invariants the ADVICE pass flagged: the
  * event-time split must always yield two non-empty batches (or fail
  * loudly), and the top-k pipeline's expected snapshot count must be
  * exact — a sketch bug dropping rows has to fail the bench, not time a
  * "green" run.
  */
class StreamingBenchSpec extends SparkTestBase {

  private def ev(id: Long, ms: Long): BEv = BEv(id, id % 3, new Timestamp(ms), 1L)

  test("eventTimeBatches splits on a boundary with both halves non-empty") {
    val rows = Array(ev(1, 10), ev(2, 20), ev(3, 20), ev(4, 30), ev(5, 40))
    val (a, b) = StreamingBench.eventTimeBatches(rows)
    assert(a.nonEmpty && b.nonEmpty)
    assert(a.map(r => r.ts.getTime).max < b.map(r => r.ts.getTime).min)
  }

  test("eventTimeBatches falls back BACKWARD when the tie run reaches the end") {
    // midpoint lands inside a tie run of 20s that extends to the last
    // element — the forward scan alone would leave batch 2 empty
    val rows = Array(ev(1, 10), ev(2, 20), ev(3, 20), ev(4, 20), ev(5, 20))
    val (a, b) = StreamingBench.eventTimeBatches(rows)
    assert(a.map(_.event_id) == IndexedSeq(1L))
    assert(b.map(_.event_id) == IndexedSeq(2L, 3L, 4L, 5L))
  }

  test("eventTimeBatches fails loudly on a single-timestamp feed") {
    val rows = Array(ev(1, 20), ev(2, 20), ev(3, 20))
    intercept[IllegalArgumentException] {
      StreamingBench.eventTimeBatches(rows)
    }
  }

  test("topk pipeline's exact expected-count formula matches the stream") {
    // requireCount inside the pipeline throws if the driver-side
    // min(k, min(distinct, capacity)) derivation mispredicts even one
    // snapshot row
    StreamingBench.topKPipeline(spark, "/root/testdata/sf0.001")
  }

  test("hot-key TTL probe emits exactly one row per event through a single key") {
    // the whole corpus through ONE key in bounded admission slices;
    // requireCount throws if the watermark drops a row (the slices'
    // global event-time order is the contract this pins) or the fold
    // emits anything but one row per event
    StreamingBench.ttlHotKeyPipeline(spark, "/root/testdata/sf0.001")
  }

  test("interval-join pipeline's exact expected pair count matches the stream") {
    // requireCount inside the pipeline throws if the streamed join emits
    // a different pair set than the driver-side binary-search count —
    // late-drop or premature state eviction would both surface here
    StreamingBench.intervalJoinPipeline(spark, "/root/testdata/sf0.001")
  }
}
