package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

/** Stacked daily-close → EWMA stream == the batch q75 gate on every
  * CLOSED day when fed in order; replayed closes smooth exactly once;
  * the unchanged-state update is skipped.
  */
class StreamingEwmaSpec extends SparkTestBase {

  test("cross-batch stacked ewma == batch q75 minus each user's open day") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[StreamingProfile.PEv].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[StreamingProfile.PEv]
    val out = StreamingEwma.ewma(StreamingDailyClose.closes(stream.toDS()))
    val q = SourceKit.Sinks.toMemory(out.toDF(), "ewma_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("ewma_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // batch truth: q75 rows, dropping each user's LAST observed day
      // (still open upstream in the daily-close stage)
      val batch = Relational.q75Ewma(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          (r.getLong(2), r.getLong(3), r.getLong(4))))
      val lastDay = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expected = batch
        .filter { case (u, d, _) => d < lastDay(u) }
        .map { case (u, d, v) => (u, d) -> v }.toMap
      assert(expected.nonEmpty && streamed == expected,
        s"ewma diverged: ${streamed.size} streamed vs ${expected.size} expected")
      // both anomaly classes appear in the streamed closed-day rows
      val flags = streamed.values.map(_._3).toSet
      assert(flags == Set(0L, 1L), s"anomaly flag mix missing: $flags")
      // exactly-once: one row per closed (user, day)
      assert(spark.table("ewma_out").count() == expected.size.toLong)
    } finally q.stop()
  }

  test("ewma state machine: fold, band flag, replay drop, unchanged-state skip") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingEwma.EwmaState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    def close(day: Long, cents: Long) =
      StreamingDailyClose.CloseRow(7L, day, cents)
    // first close seeds s = c with anomaly 0; second folds the
    // recurrence: (1·1000 + 4·100) div 5 = 280, |1000−100|·1e6/100 =
    // 9e6 ppm > threshold → anomaly 1
    val out1 = StreamingEwma.ewmaUpdate(Some(500.millis))(
      7L, Iterator(close(0, 100), close(1, 1000)), st).toSeq
    assert(out1 == Seq(
      StreamingEwma.EwmaRow(7L, 0L, 100L, 100L, 0L),
      StreamingEwma.EwmaRow(7L, 1L, 1000L, 280L, 1L)))
    assert(st.get == StreamingEwma.EwmaState(1L, 280L))
    // replayed close (day <= stored) drops; state untouched AND the
    // update call itself is skipped (RocksDB churn rule) — fresh
    // TestGroupState because isUpdated latches across invocations
    val st2 = TestGroupState.create[StreamingEwma.EwmaState](
      Optional.of(st.get), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out2 = StreamingEwma.ewmaUpdate(Some(500.millis))(
      7L, Iterator(close(1, 999), close(0, 5)), st2).toSeq
    assert(out2.isEmpty && st2.get == st.get && !st2.isUpdated)
    // a small move stays inside the band: (1·300 + 4·280) div 5 = 284,
    // |300−280|·1e6/280 = 71428 ppm → anomaly 0
    val out3 = StreamingEwma.ewmaUpdate(Some(500.millis))(
      7L, Iterator(close(2, 300)), st).toSeq
    assert(out3 == Seq(StreamingEwma.EwmaRow(7L, 2L, 300L, 284L, 0L)))
  }
}
