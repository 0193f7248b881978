package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingRetention.RetState
import graft.streaming.StreamingTransitions.Ev

/** Streaming retention hits == batch q57 triangle when fed in order,
  * ≤ horizon+1 rows per user, dedup across batches through the seen-k
  * bitmask, idle eviction + no-op state-write discipline.
  */
class StreamingRetentionSpec extends SparkTestBase {

  test("cross-batch (wk0, k) hit counts == batch q57 triangle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingRetention.hits(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "ret_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("ret_out")
        .groupBy("wk0", "k").agg(count(lit(1)).as("n_users"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = Relational.q57Retention(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"diff: ${(streamed.toSet diff batch.toSet) ++ (batch.toSet diff streamed.toSet)}")
      assert(spark.table("ret_out").count() == batch.values.sum)
    } finally q.stop()
  }

  test("bitmask dedup, horizon cut, eviction restart, no-op state writes") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    def mkState(st: Option[RetState], timedOut: Boolean) =
      TestGroupState.create[RetState](
        st.map(Optional.of[RetState]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)
    def ev(day: Long, id: Long) =
      Ev(7L, new java.sql.Timestamp(day * 86400000L), id, "view")

    // weeks 0,0,1,3 within horizon → k = 0,1,3 once each; week 5 beyond
    // horizon 3 → dropped
    val fresh = mkState(None, timedOut = false)
    val out = StreamingRetention.retentionUpdate(3, timeout)(
      7L, Iterator(ev(0, 1), ev(3, 2), ev(8, 3), ev(22, 4), ev(36, 5)),
      fresh).toSeq
    assert(out.map(h => (h.wk0, h.k)) == Seq((0L, 0L), (0L, 1L), (0L, 3L)))
    assert(fresh.get == RetState(0L, (1L << 0) | (1L << 1) | (1L << 3)))

    // an already-seen k in a later batch emits nothing and skips the
    // state write
    val seen = mkState(Some(RetState(0L, 1L)), timedOut = false)
    assert(StreamingRetention.retentionUpdate(3, timeout)(
      7L, Iterator(ev(2, 6)), seen).isEmpty)
    assert(!seen.isUpdated)

    // idle eviction removes; a returning user becomes a NEW cohort
    val idle = mkState(Some(RetState(0L, 1L)), timedOut = true)
    assert(StreamingRetention.retentionUpdate(3, timeout)(
      7L, Iterator.empty, idle).isEmpty)
    assert(idle.isRemoved)
    val back = mkState(None, timedOut = false)
    val out2 = StreamingRetention.retentionUpdate(3, timeout)(
      7L, Iterator(ev(70, 7)), back).toSeq
    assert(out2.map(h => (h.wk0, h.k)) == Seq((10L, 0L)))
  }
}
