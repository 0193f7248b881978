package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

/** One histogram state must price all three statistics exactly: the
  * live panel's final row per type equals batch report_drift_panel bit
  * for bit once the live half is consumed.
  */
class StreamingDriftPanelSpec extends SparkTestBase {

  test("cumulative live panel == batch report_drift_panel per type") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (dists, profs) = StreamingDriftPanel.referencesFrom(spark, sf0001)
    val live = StreamingDrift.liveHalf(spark, sf0001)
    val stream = MemoryStream[StreamingProfile.PEv]
    val out = StreamingDriftPanel.panel(stream.toDS(), dists, profs)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "panel_out")
    try {
      val (b1, b2) = live.toIndexedSeq.splitAt(live.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val last = spark.table("panel_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val batch = Relational.reportDriftPanel(spark, sf0001).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      assert(last.keySet == batch.keySet && batch.nonEmpty)
      batch.foreach { case (t, (nRef, nLive, ks, uX2, auc, chisq)) =>
        val (_, _, sRef, sLive, sKs, sU, sAuc, sChi) = last(t)
        assert((sRef, sLive, sKs, sU, sAuc, sChi) ==
          ((nRef, nLive, ks, uX2, auc, chisq)),
          s"$t: streamed != batch panel")
      }
      // one cumulative row per (touched type, batch)
      val perBatch = spark.table("panel_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(perBatch.distinct.length == perBatch.length)
    } finally q.stop()
  }

  test("kernel: timed-out state is removed and the invocation is silent") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val dist = StreamingAuc.RefDist(Vector((10L, 2L)))
    val prof = StreamingDrift.RefProfile(Vector(10L), Vector(1L, 1L))
    val st = TestGroupState.create[StreamingDriftPanel.PanelState](
      Optional.of(StreamingDriftPanel.PanelState(2L, Map(10L -> 1L))),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(1L)), hasTimedOut = true)
    val out = StreamingDriftPanel.panelUpdate(
      Map("t" -> dist), Map("t" -> prof), Some(1.minute))(
      "t", Iterator.empty, st).toSeq
    assert(out.isEmpty && st.isRemoved)
  }

  test("kernel silence: type missing from either frozen artifact emits nothing") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val dist = StreamingAuc.RefDist(Vector((10L, 2L)))
    val prof = StreamingDrift.RefProfile(Vector(10L), Vector(1L, 1L))
    def ev(v: Long) = StreamingProfile.PEv(1L, 1L,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "t", v)
    def st = TestGroupState.create[StreamingDriftPanel.PanelState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    assert(StreamingDriftPanel.panelUpdate(
      Map.empty, Map("t" -> prof), None)("t", Iterator(ev(5L)), st).isEmpty)
    assert(StreamingDriftPanel.panelUpdate(
      Map("t" -> dist), Map.empty, None)("t", Iterator(ev(5L)), st).isEmpty)
    val out = StreamingDriftPanel.panelUpdate(
      Map("t" -> dist), Map("t" -> prof), None)("t", Iterator(ev(5L)), st).toSeq
    assert(out.length == 1 && out.head.n_live == 1L)
  }
}
