package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.operators.Relational

/** The live drift monitor over the frozen batch reference equals the
  * batch q79 gate once the live half is consumed, emits exactly one
  * cumulative row per (touched type, batch), and the kernel's integer
  * chi-square matches a hand model.
  */
class StreamingDriftSpec extends SparkTestBase {

  test("cumulative streamed chi-square == batch q79 after the live half") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = StreamingDrift.referenceFrom(spark, sf0001)
    val live = StreamingDrift.liveHalf(spark, sf0001)
    val stream = MemoryStream[StreamingProfile.PEv]
    val out = StreamingDrift.drift(stream.toDS(), ref)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "drift_out")
    try {
      val (b1, b2) = live.toIndexedSeq.splitAt(live.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val rows = spark.table("drift_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // exactly one row per (touched type, batch)
      val perBatch = Seq(b1, b2).map(_.map(_.event_type).toSet)
      assert(rows.length == perBatch.map(_.size).sum)
      // the LAST (cumulative) row per type equals the batch gate
      val last = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val batch = Relational.q79DriftChisq(spark, sf0001).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(batch.nonEmpty && last.keySet == batch.keySet)
      batch.foreach { case (t, (nLive, chisq)) =>
        val (_, n, c) = last(t)
        assert(n == nLive && c == chisq,
          s"$t: streamed ($n, $c) != batch ($nLive, $chisq)")
      }
    } finally q.stop()
  }

  test("kernel: binning, cumulative counts, integer chi-square, unseen type") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val p = StreamingDrift.RefProfile(
      bounds = Vector(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L),
      refCounts = Vector.fill(10)(4L)) // R = 40, uniform reference
    def ev(cents: Long) = StreamingProfile.PEv(
      1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "t", cents)
    val st = TestGroupState.create[StreamingDrift.DriftState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    // 4 events in bins 1 (5 ≤ 10), 1 (10: not > 10), 2 (15), 10 (95):
    // L=4, uniform e_i = (4·4) div 40 = 0 → div by max(e,1)=1
    // chisq = (2-0)²·1e6 + (1-0)²·1e6 + (1-0)²·1e6 + 7·(0-0)² = 6e6
    val out = StreamingDrift.driftUpdate(Map("t" -> p), None)(
      "t", Iterator(ev(5), ev(10), ev(15), ev(95)), st).toSeq
    assert(out == Seq(StreamingDrift.DriftRow("t", 4L, 6000000L)))
    assert(st.get.o == Vector(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // second batch accumulates: +4 in bin 1 → o=(6,1,..,1), L=8,
    // e_i = (8·4) div 40 = 0 → chisq = (36+1+1)·1e6 = 38e6
    val out2 = StreamingDrift.driftUpdate(Map("t" -> p), None)(
      "t", Iterator(ev(1), ev(2), ev(3), ev(4)), st).toSeq
    assert(out2 == Seq(StreamingDrift.DriftRow("t", 8L, 38000000L)))
    // a type absent from the reference emits nothing and keeps no state
    val st2 = TestGroupState.create[StreamingDrift.DriftState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val out3 = StreamingDrift.driftUpdate(
      Map.empty[String, StreamingDrift.RefProfile], None)(
      "unseen", Iterator(ev(5)), st2).toSeq
    assert(out3.isEmpty && !st2.exists)
  }

  test("sparse type: partial bounds accepted (batch-parity coarse bins), not a crash") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // a reference half with < 10 rows yields fewer than 9 decile bounds
    // (missing rank targets) — batch q79 silently bins against whatever
    // bounds exist, so the monitor must start with the same partial
    // profile instead of refusing the whole stream
    val p = StreamingDrift.RefProfile(
      bounds = Vector(10L, 30L), refCounts = Vector(1L, 1L, 1L)) // R = 3
    def ev(cents: Long) = StreamingProfile.PEv(
      1L, 1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "t", cents)
    val st = TestGroupState.create[StreamingDrift.DriftState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    // bins: 5→0 bounds below→bin 0; 20→1; 99→2; L=3, e_i=(3·1) div 3=1
    // → o=e everywhere → chisq 0
    val out = StreamingDrift.driftUpdate(Map("t" -> p), None)(
      "t", Iterator(ev(5), ev(20), ev(99)), st).toSeq
    assert(out == Seq(StreamingDrift.DriftRow("t", 3L, 0L)))
    assert(st.get.o == Vector(1L, 1L, 1L))
    // malformed (counts ≠ bounds+1) still refuses loudly
    intercept[IllegalArgumentException] {
      StreamingDrift.RefProfile(Vector(10L), Vector(1L, 1L, 1L))
    }
  }
}
