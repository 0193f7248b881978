package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingTransitions.Ev

/** Streaming two-mask stickiness == batch q72 on the calendar spine
  * when fed in order — dau, wau AND the integer-ppm ratio; the DAU
  * mask dedups repeat same-day activity; cover() refactor equivalence
  * is implied (StreamingWauSpec pins the WAU half on the same helper).
  */
class StreamingStickinessSpec extends SparkTestBase {

  test("cross-batch stickiness curve == batch q72 on the calendar spine") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingStickiness.hits(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "stick_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("stick_out")
        .groupBy("wday")
        .agg(sum(when(col("is_day"), 1L).otherwise(0L)).as("dau"),
          sum(when(col("is_day"), 0L).otherwise(1L)).as("wau"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        .withDefaultValue((0L, 0L))
      val batch = Relational.q72Stickiness(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(batch.nonEmpty)
      batch.foreach { case (d, dau, wau, ppm) =>
        val (sd, sw) = streamed(d)
        assert(sd == dau && sw == wau,
          s"day $d: streamed ($sd, $sw) vs batch ($dau, $wau)")
        val sppm = if (sw == 0) 0L else (sd * 1000000L) / sw
        assert(sppm == ppm, s"day $d: ppm $sppm vs $ppm")
      }
    } finally q.stop()
  }

  test("cover() fuzz: in-order feeds emit exactly the coverage union, never a duplicate") {
    // the rolling-mask primitive both StreamingWau and the stickiness
    // twin share: for ANY in-order day sequence the emitted wdays must
    // equal ∪ [d, d+w) exactly (nothing dropped, nothing duplicated);
    // for arbitrary (out-of-order) sequences emissions must still
    // never duplicate and late days must be the only losses
    val rnd = new scala.util.Random(1414)
    for (w <- Seq(1, 7, 28); trial <- 1 to 8) {
      val steps = 1 + rnd.nextInt(40)
      var days = Vector.fill(steps)(rnd.nextInt(200).toLong + 100L)
      val inOrder = trial % 2 == 0
      if (inOrder) days = days.sorted
      var st = StreamingWau.WauState(days.head, 0L)
      val emitted = Seq.newBuilder[Long]
      var dropped = 0
      days.foreach { d =>
        val (st2, covered, late) = StreamingWau.cover(st, d, w)
        st = st2
        emitted ++= covered
        if (late) dropped += 1
      }
      val out = emitted.result()
      assert(out.size == out.distinct.size,
        s"w=$w trial $trial: duplicate emissions in $out")
      if (inOrder) {
        val expected = days.flatMap(d => d until (d + w)).toSet
        assert(dropped == 0 && out.toSet == expected,
          s"w=$w trial $trial: in-order coverage ${out.toSet} != $expected")
      }
    }
  }

  test("two-mask state: DAU dedups same-day repeats; WAU half keeps its contract") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingStickiness.StickState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    def ev(dayN: Long, id: Long) =
      Ev(7L, new java.sql.Timestamp(dayN * 86400000L), id, "view")
    // day 0 twice + day 3: DAU hits exactly {0, 3}; WAU hits 0..6 ∪ 7..9
    val out = StreamingStickiness.stickUpdate(7, Some(500.millis))(
      7L, Iterator(ev(0, 1), ev(0, 2), ev(3, 3)), st).toSeq
    assert(out.filter(_.is_day).map(_.wday) == Seq(0L, 3L))
    assert(out.filterNot(_.is_day).map(_.wday) == (0L to 6L) ++ (7L to 9L))
    // next batch, same day again: nothing new on either mask
    val out2 = StreamingStickiness.stickUpdate(7, Some(500.millis))(
      7L, Iterator(ev(3, 4)), st).toSeq
    assert(out2.isEmpty)
  }

  test("late event is dropped ATOMICALLY from both masks (no dau-without-wau hit)") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val st = TestGroupState.create[StreamingStickiness.StickState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    def ev(dayN: Long, id: Long) =
      Ev(9L, new java.sql.Timestamp(dayN * 86400000L), id, "view")
    val drops = spark.sparkContext.longAccumulator("lateDrops")
    // day 0 then day 100 at w=7: the WAU mask rebases to base 43
    // (100+7−64) but the DAU mask only to base 37 (100+1−64) — day 40
    // lands in the (w−1)-day band that is WAU-late yet DAU-coverable
    val out = StreamingStickiness.stickUpdate(7, Some(500.millis), Some(drops))(
      9L, Iterator(ev(0, 1), ev(100, 2)), st).toSeq
    assert(out.count(_.is_day) == 2 && drops.value == 0L)
    val held = st.get
    assert(40L < held.wau.baseDay && 40L >= held.dau.baseDay,
      s"test setup no longer straddles the masks: wauBase=${held.wau.baseDay} dauBase=${held.dau.baseDay}")
    val out2 = StreamingStickiness.stickUpdate(7, Some(500.millis), Some(drops))(
      9L, Iterator(ev(40, 3)), st).toSeq
    assert(out2.isEmpty,
      s"late day 40 leaked hits $out2 — dau>wau divergence at the band")
    assert(drops.value == 1L, s"late drop not counted: ${drops.value}")
  }
}
