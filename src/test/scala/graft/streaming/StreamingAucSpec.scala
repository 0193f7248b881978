package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

/** The live AUC monitor over the frozen reference equals batch q84 bit
  * for bit once the live half is consumed — n_live, the doubled win
  * count (== doubled U) and the AUC ppm — and the kernel's binary-
  * search win arithmetic handles every boundary case.
  */
class StreamingAucSpec extends SparkTestBase {

  test("cumulative live stream == batch q84 per type after the live half") {
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
    val out = StreamingAuc.auc(stream.toDS(), ref)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "auc_out")
    try {
      val (b1, b2) = live.toIndexedSeq.splitAt(live.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val last = spark.table("auc_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val batch = Relational.q84MannWhitney(spark, sf0001).collect()
        .map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(last.keySet == batch.keySet && batch.nonEmpty)
      batch.foreach { case (t, (nLive, uX2, auc)) =>
        val (_, _, sn, sw, sa) = last(t)
        assert((sn, sw, sa) == (nLive, uX2, auc),
          s"$t: streamed ($sn, $sw, $sa) != batch ($nLive, $uX2, $auc)")
      }
      // one cumulative row per (touched type, batch)
      val perBatch = spark.table("auc_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(perBatch.distinct.length == perBatch.length)
    } finally q.stop()
  }

  test("kernel: win arithmetic boundaries, versioning, no-news silence") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val dist = StreamingAuc.RefDist(Vector((10L, 2L), (20L, 3L), (30L, 1L)))
    assert(dist.nRef == 6L)
    assert(dist.winsX2Of(5L) == 0L)           // below all
    assert(dist.winsX2Of(10L) == 2L)          // ties only
    assert(dist.winsX2Of(15L) == 4L)          // above the 2
    assert(dist.winsX2Of(20L) == 2L * 2 + 3L) // above 2, ties 3
    assert(dist.winsX2Of(31L) == 12L)         // above all
    def ev(v: Long) = StreamingProfile.PEv(1L, 1L,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "t", v)
    val st = TestGroupState.create[StreamingAuc.AucState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val ref = Map("t" -> dist)
    val out1 = StreamingAuc.aucUpdate(ref, None)(
      "t", Iterator(ev(15L), ev(31L)), st).toSeq
    assert(out1 == Seq(StreamingAuc.AucRow("t", 1L, 2L, 16L,
      StreamingAuc.aucPpm(6L, 2L, 16L))))
    // 16/(2*6*2) = 0.666..: floor ppm
    assert(out1.head.auc_ppm == 666666L)
    // cumulative second batch bumps the version
    val out2 = StreamingAuc.aucUpdate(ref, None)("t", Iterator(ev(10L)), st).toSeq
    assert(out2 == Seq(StreamingAuc.AucRow("t", 2L, 3L, 18L,
      StreamingAuc.aucPpm(6L, 3L, 18L))))
    // empty invocation: no emission, no state write
    assert(StreamingAuc.aucUpdate(ref, None)("t", Iterator.empty, st).isEmpty)
    // unseen type: silent
    assert(StreamingAuc.aucUpdate(ref, None)("u", Iterator(ev(1L)),
      TestGroupState.create[StreamingAuc.AucState](Optional.empty(),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long],
        hasTimedOut = false)).isEmpty)
  }
}
