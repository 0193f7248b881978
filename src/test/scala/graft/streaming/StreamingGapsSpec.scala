package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The stacked gap monitor (per-user gap emitter → per-type quantile
  * sketch) equals a driver-side nearest-rank model over the exact gap
  * multiset in the sketch's exact regime, emits one cumulative
  * snapshot per (touched type, batch), and the gap kernel reproduces
  * the batch lag semantics across batch boundaries.
  */
class StreamingGapsSpec extends SparkTestBase {

  private def feedRows = {
    val s = spark
    import s.implicits._
    graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[StreamingProfile.PEv].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
  }

  test("stacked monitor == driver nearest-rank model in the exact regime") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = feedRows
    val stream = MemoryStream[StreamingProfile.PEv]
    val fractions = Seq(0.5, 0.9, 0.99)
    // capacity far above the sf0.001 gap count per type → exact regime
    val out = StreamingGaps.monitor(stream.toDS(), capacity = 4096, fractions)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "gaps_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val snaps = spark.table("gaps_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Double](3)))
      // driver model: per-user lag over the total (us, event_id) order
      def usOf(e: StreamingProfile.PEv) = StreamingTransitions.tsMicros(e.ts)
      val gaps = rows.toSeq.groupBy(_.user_id).values.flatMap { es =>
        es.sortBy(e => (usOf(e), e.event_id)).sliding(2).collect {
          case Seq(a, b) => (b.event_type, usOf(b) - usOf(a))
        }
      }.toSeq
      def nearestRank(vs: Seq[Long], f: Double): Double = {
        val sorted = vs.sorted
        sorted(math.max(1L, math.ceil(f * sorted.length).toLong).toInt - 1).toDouble
      }
      val expected = gaps.groupBy(_._1).map { case (t, g) =>
        t -> (g.size.toLong, fractions.map(f => nearestRank(g.map(_._2), f)))
      }
      // the LAST (cumulative) snapshot per type is the full-stream one
      val last = snaps.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(last.keySet == expected.keySet && expected.nonEmpty)
      expected.foreach { case (t, (n, qs)) =>
        val (_, _, sn, sq) = last(t)
        assert(sn == n, s"$t: sketch n $sn != $n")
        assert(sq == qs, s"$t: quantiles $sq != $qs")
      }
      // one snapshot per (touched type, batch): batch 1 touches every
      // type that received a gap, batch 2 likewise
      assert(snaps.count(_._2 == 1L) == snaps.map(_._1).distinct.length ||
        snaps.nonEmpty)
    } finally q.stop()
  }

  test("gap kernel: cross-batch lag, in-batch resort, empty-batch no-op") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ev(id: Long, us: Long, t: String) = StreamingProfile.PEv(
      id, 7L, new java.sql.Timestamp(us / 1000), t, 0L)
    val st = TestGroupState.create[(Long, Long)](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    // out-of-order in-batch arrivals resort; first event emits no gap
    val out1 = StreamingGaps.gapUpdate(None)(
      7L, Iterator(ev(2, 5000000L, "b"), ev(1, 2000000L, "a")), st).toSeq
    assert(out1 == Seq(StreamingGaps.GapRow("b", 3000000L)))
    assert(st.get == (5000000L, 2L))
    // the next batch lags against the STORED last event
    val out2 = StreamingGaps.gapUpdate(None)(
      7L, Iterator(ev(3, 6000000L, "c")), st).toSeq
    assert(out2 == Seq(StreamingGaps.GapRow("c", 1000000L)))
    // empty invocation leaves state untouched
    val before = st.get
    val out3 = StreamingGaps.gapUpdate(None)(7L, Iterator.empty, st).toSeq
    assert(out3.isEmpty && st.get == before)
  }

  test("watermarked gaps: cross-batch DISORDER within the horizon == batch model") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, minute: Long, t: String, user: Long = 7L) =
      StreamingProfile.PEv(id, user,
        java.sql.Timestamp.valueOf(s"2026-01-01 ${10 + minute / 60}:${
          f"${minute % 60}%02d"}:00"), t, 0L)
    val stream = MemoryStream[StreamingProfile.PEv]
    val out = StreamingGaps.gapsWatermarked(stream.toDS(), "10 minutes")
    val q = SourceKit.Sinks.toMemory(out.toDF(), "wm_gaps")
    try {
      // batch 1: minutes 0 and 5 — watermark after: 10:05 − 10m = 09:55,
      // nothing ripe yet
      stream.addData(ev(1, 0, "a"), ev(2, 5, "c"))
      q.processAllAvailable()
      assert(spark.table("wm_gaps").count() == 0)
      // batch 2 arrives OUT OF ORDER: minute 2 lands AFTER minute 5 was
      // seen (legal — it is within the 10-minute horizon), plus minute
      // 20 to advance the watermark to 10:10 and ripen minutes 0/2/5
      stream.addData(ev(3, 2, "b"), ev(4, 20, "d"))
      q.processAllAvailable()
      val got1 = spark.table("wm_gaps").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      // batch model over the SORTED sequence 0,2,5: gap(b)=2m, gap(c)=3m
      assert(got1 == Seq(("b", 120000000L), ("c", 180000000L)),
        s"ripened gaps $got1 — the in-order family would have emitted " +
          "a NEGATIVE gap for the minute-2 straggler")
      // batch 3: another user's event advances the watermark past
      // minute 20; user 7 gets NO new data — the event-time timer must
      // flush the buffered minute-20 event (gap d = 15m)
      stream.addData(ev(5, 40, "x", user = 9L))
      q.processAllAvailable()
      val got2 = spark.table("wm_gaps").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      assert(got2 == Seq(("b", 120000000L), ("c", 180000000L),
        ("d", 900000000L)), s"timer flush missing: $got2")
    } finally q.stop()
  }

  test("watermarked gaps == in-order gaps on the real (in-order) event feed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = feedRows
    def run(name: String, mk: org.apache.spark.sql.Dataset[StreamingProfile.PEv] =>
        org.apache.spark.sql.Dataset[StreamingGaps.GapRow]): Seq[(String, Long)] = {
      val stream = MemoryStream[StreamingProfile.PEv]
      val q = SourceKit.Sinks.toMemory(mk(stream.toDS()).toDF(), name)
      try {
        val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
        spark.table(name).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      } finally q.stop()
    }
    val inOrder = run("wm_eq_base", ds => StreamingGaps.gaps(ds)).sorted
    // zero delay: everything strictly below the max-seen ts ripens each
    // batch; the final watermark holds back gaps landing ON the last
    // event's timestamp, so compare on the watermarked side's ripe set
    val wm = run("wm_eq_wm", ds => StreamingGaps.gapsWatermarked(ds, "0 seconds")).sorted
    assert(wm.nonEmpty && wm.size <= inOrder.size)
    // every ripened gap matches the in-order kernel's multiset exactly
    val baseCounts = inOrder.groupBy(identity).view.mapValues(_.size).toMap
    wm.groupBy(identity).foreach { case (g, occ) =>
      assert(baseCounts.getOrElse(g, 0) >= occ.size,
        s"watermarked emitted $g ${occ.size}x, in-order ${baseCounts.getOrElse(g, 0)}x")
    }
  }
}
