package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

/** Streaming daily-close == the batch gap-fill gate's observed daily
  * closes on every CLOSED day when fed in order; each (user, day)
  * closes exactly once across batches; the still-open last day is
  * withheld.
  */
class StreamingDailyCloseSpec extends SparkTestBase {

  test("cross-batch closes == batch q74 observed closes minus each user's open day") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .filter(pmod(col("user_id"), lit(Relational.GapFillUserMod)) === 0)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[StreamingProfile.PEv].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[StreamingProfile.PEv]
    val out = StreamingDailyClose.closes(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "close_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("close_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch truth: q74's observed rows are exactly the daily closes;
      // drop each user's LAST observed day (still open in the stream)
      val observed = Relational.q74GapFill(spark, sf0001).collect()
        .filter(_.getLong(3) == 1L)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val lastDay = observed.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expected = observed
        .filter { case (u, d, _) => d < lastDay(u) }
        .map { case (u, d, c) => (u, d) -> c }.toMap
      assert(expected.nonEmpty && streamed == expected,
        s"closes diverged: ${streamed.size} streamed vs ${expected.size} expected")
      // exactly-once: the memory sink row count equals the map size
      assert(spark.table("close_out").count() == expected.size.toLong)
    } finally q.stop()
  }

  test("close state machine: argmax within day, close on advance, behind-day ignored") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingDailyClose.OpenDay](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    def ev(dayN: Long, ms: Long, id: Long, cents: Long) =
      StreamingProfile.PEv(id, 7L,
        new java.sql.Timestamp(dayN * 86400000L + ms), "view", cents)
    // day 0: two events — later one is the close; day 2 advances
    val out1 = StreamingDailyClose.closeUpdate(Some(500.millis))(
      7L, Iterator(ev(0, 5, 1, 100), ev(0, 9, 2, 200), ev(2, 1, 3, 300)), st).toSeq
    assert(out1 == Seq(StreamingDailyClose.CloseRow(7L, 0L, 200L)))
    // same-µs tie: higher event_id wins the argmax (the batch struct order)
    val out2 = StreamingDailyClose.closeUpdate(Some(500.millis))(
      7L, Iterator(ev(2, 1, 5, 555), ev(3, 0, 6, 600)), st).toSeq
    assert(out2 == Seq(StreamingDailyClose.CloseRow(7L, 2L, 555L)))
    // an event behind the open day is ignored, state unchanged
    val out3 = StreamingDailyClose.closeUpdate(Some(500.millis))(
      7L, Iterator(ev(1, 0, 7, 999)), st).toSeq
    assert(out3.isEmpty && st.get.day == 3L && st.get.cents == 600L)
  }
}
