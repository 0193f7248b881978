package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

/** The live KS monitor over the frozen reference equals batch q83 bit
  * for bit once the live half is consumed, and the kernel's merged-
  * support walk handles the boundary cases.
  */
class StreamingKsSpec extends SparkTestBase {

  test("cumulative live stream == batch q83 per type after the live half") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = StreamingAuc.referenceFrom(spark, sf0001)
    val all = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .as[StreamingProfile.PEv].collect()
    val days = all.map(e => Math.floorDiv(e.ts.getTime, 86400000L))
    val mid = Math.floorDiv(days.min + days.max, 2L)
    val live = all.zip(days).collect { case (e, d) if d > mid => e }
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[StreamingProfile.PEv]
    val out = StreamingKs.ks(stream.toDS(), ref)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "ks_out")
    try {
      val (b1, b2) = live.toIndexedSeq.splitAt(live.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val last = spark.table("ks_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val batch = Relational.q83KsTest(spark, sf0001).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(last.keySet == batch.keySet && batch.nonEmpty)
      batch.foreach { case (t, (nRef, nLive, ks)) =>
        val (_, _, sRef, sLive, sKs) = last(t)
        assert((sRef, sLive, sKs) == ((nRef, nLive, ks)),
          s"$t: streamed ($sRef, $sLive, $sKs) != batch ($nRef, $nLive, $ks)")
      }
      val perBatch = spark.table("ks_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(perBatch.distinct.length == perBatch.length)
    } finally q.stop()
  }

  test("kernel: timed-out state is removed and the invocation is silent") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val dist = StreamingAuc.RefDist(Vector((10L, 2L)))
    val st = TestGroupState.create[StreamingKs.KsState](
      Optional.of(StreamingKs.KsState(3L, Map(10L -> 1L))),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(1L)), hasTimedOut = true)
    val out = StreamingKs.ksUpdate(Map("t" -> dist), Some(1.minute))(
      "t", Iterator.empty, st).toSeq
    assert(out.isEmpty && st.isRemoved)
  }

  test("kernel: merged-support walk boundaries") {
    val dist = StreamingAuc.RefDist(Vector((10L, 2L), (20L, 2L)))
    // empty live: gap peaks at full ref CDF vs 0 — ks = 1e6 with the
    // greatest(n,1) guard (cumLive/1 = 0 everywhere)
    assert(StreamingKs.ksPpm(dist, Map.empty[Long, Long]) == ((0L, 1000000L)))
    // identical distribution: gap 0 at every support point
    assert(StreamingKs.ksPpm(dist, Map(10L -> 2L, 20L -> 2L)) == ((4L, 0L)))
    // live mass entirely above the ref: at cents=20 ref CDF is 1e6,
    // live still 0 -> ks = 1e6
    assert(StreamingKs.ksPpm(dist, Map(30L -> 5L))._2 == 1000000L)
    // live value BETWEEN ref points contributes a support point: live
    // all at 15 -> at 15, ref = 0.5, live = 1.0 -> gap 5e5
    assert(StreamingKs.ksPpm(dist, Map(15L -> 4L))._2 == 500000L)
  }
}
