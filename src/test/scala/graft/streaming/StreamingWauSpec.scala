package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingWau.WauState
import graft.streaming.StreamingTransitions.Ev

/** Streaming rolling-WAU == batch q64 on the batch spine when fed in
  * order; each (user, wday) counts exactly once across batches; the
  * rolling mask rebases without re-emission.
  */
class StreamingWauSpec extends SparkTestBase {

  test("cross-batch WAU hits == batch q64 on the calendar spine") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingWau.hits(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "wau_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("wau_out")
        .groupBy("wday").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
      val batch = Relational.q64RollingWau(spark, sf0001).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      assert(batch.nonEmpty)
      // the batch spine truncates at the last observed day; the stream
      // also carries trailing coverage beyond it (live-dashboard
      // semantics) — compare on the spine
      batch.foreach { case (d, wau) =>
        assert(streamed(d) == wau, s"day $d: streamed ${streamed(d)} vs $wau")
      }
      val maxDay = batch.map(_._1).max
      val beyond = streamed.keys.filter(_ > maxDay)
      assert(beyond.forall(d => d <= maxDay + Relational.WauWindowDays - 1))
    } finally q.stop()
  }

  test("rolling mask: dedup across batches, rebase without re-emission, window drop") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    def mkState(st: Option[WauState], timedOut: Boolean) =
      TestGroupState.create[WauState](
        st.map(Optional.of[WauState]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)
    def ev(dayN: Long, id: Long) =
      Ev(7L, new java.sql.Timestamp(dayN * 86400000L), id, "view")

    // day 0 covers wdays 0..6; a repeat of day 0 adds nothing; day 3
    // adds only 7..9
    val fresh = mkState(None, timedOut = false)
    val out = StreamingWau.wauUpdate(7, timeout)(
      7L, Iterator(ev(0, 1), ev(0, 2), ev(3, 3)), fresh).toSeq
    assert(out.map(_.wday) == (0L to 6L) ++ (7L to 9L))

    // far-future day forces a rebase; earlier coverage must not re-emit
    val out2 = StreamingWau.wauUpdate(7, timeout)(
      7L, Iterator(ev(100, 4), ev(100, 5)), fresh).toSeq
    assert(out2.map(_.wday) == (100L to 106L))
    assert(fresh.get.baseDay == 100L + 7L - 64L)

    // a day behind the rebased window is dropped (beyond-watermark)
    val out3 = StreamingWau.wauUpdate(7, timeout)(
      7L, Iterator(ev(10, 6)), fresh).toSeq
    assert(out3.isEmpty)
  }

  test("late-drop side channel counts exactly the behind-window days") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def mkState() =
      TestGroupState.create[WauState](
        Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], hasTimedOut = false)
    def ev(dayN: Long, id: Long) =
      Ev(7L, new java.sql.Timestamp(dayN * 86400000L), id, "view")
    val drops = spark.sparkContext.longAccumulator("wauLateDrops")

    // in-order feed: zero drops
    StreamingWau.wauUpdate(7, Some(500.millis), Some(drops))(
      7L, Iterator(ev(0, 1), ev(3, 2)), mkState()).toSeq
    assert(drops.value == 0L)

    // day 100 rebases the window to base 43; days 10 and 5 then arrive
    // behind it — exactly two counted drops, and they emit nothing
    val st = mkState()
    StreamingWau.wauUpdate(7, Some(500.millis), Some(drops))(
      7L, Iterator(ev(100, 3)), st).toSeq
    val out = StreamingWau.wauUpdate(7, Some(500.millis), Some(drops))(
      7L, Iterator(ev(10, 4), ev(5, 5)), st).toSeq
    assert(out.isEmpty)
    assert(drops.value == 2L)
  }
}
