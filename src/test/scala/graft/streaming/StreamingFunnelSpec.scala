package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingFunnel.FunnelState
import graft.streaming.StreamingTransitions.Ev

/** Streaming funnel == batch q50 cohort counters when fed in order,
  * ≤ 4 stage rows per user, cross-batch chaining through the stored
  * timestamps, idle eviction + no-op-state-write discipline.
  */
class StreamingFunnelSpec extends SparkTestBase {

  test("cross-batch stage counts == batch q50 cohort counters") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingFunnel.stages(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "funnel_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("funnel_out")
        .groupBy(pmod(col("user_id"), lit(10)).cast("long").as("cohort"),
          col("stage"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        .withDefaultValue(0L)
      val batch = Relational.q50Funnel(spark, sf0001).collect()
      assert(batch.nonEmpty)
      batch.foreach { r =>
        val c = r.getLong(0)
        assert(streamed((c, "user")) == r.getLong(1), s"n_users cohort $c")
        assert(streamed((c, "view")) == r.getLong(2), s"n_viewed cohort $c")
        assert(streamed((c, "click_after_view")) == r.getLong(3),
          s"n_clicked_after_view cohort $c")
        assert(streamed((c, "purchase_after_click")) == r.getLong(4),
          s"n_purchased_after_click cohort $c")
      }
      // the exact count model: Σ stage rows == Σ q50 counters
      val total = batch.map(r =>
        r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
      assert(spark.table("funnel_out").count() == total)
    } finally q.stop()
  }

  test("event-time session funnel == batch q63 cohort counters (TTL gap = session rule)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import scala.concurrent.duration._
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val ttl = (Relational.TtlMicros / 1000L).millis
    val out = StreamingFunnel.sessionStages(
      stream.toDS().withWatermark("ts", "0 seconds"), ttl)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "sess_funnel_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("sess_funnel_out")
        .select(pmod(col("user_id"), lit(10)).cast("long").as("cohort"),
          explode(col("stages")).as("stage"))
        .groupBy("cohort", "stage").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        .withDefaultValue(0L)
      val batch = Relational.q63SessionFunnel(spark, sf0001).collect()
      assert(batch.nonEmpty)
      batch.foreach { r =>
        val c = r.getLong(0)
        assert(streamed((c, "session")) == r.getLong(1), s"n_sessions cohort $c")
        assert(streamed((c, "view")) == r.getLong(2), s"n_viewed cohort $c")
        assert(streamed((c, "click_after_view")) == r.getLong(3),
          s"n_clicked_after_view cohort $c")
        assert(streamed((c, "purchase_after_click")) == r.getLong(4),
          s"n_purchased_after_click cohort $c")
      }
    } finally q.stop()
  }

  test("conversion lags == per-user min-based (tc - tv) model, one row per converter") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingFunnel.conversionLags(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "lag_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("lag_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // independent model from the batch-q56 definition: tv = min view
      // ts, tc = min click ts strictly after tv
      def us(e: Ev): Long =
        Math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
      val model = rows.groupBy(_.user_id).flatMap { case (u, evs) =>
        val tv = evs.filter(_.event_type == "view").map(us).minOption
        val tc = tv.flatMap(t =>
          evs.filter(e => e.event_type == "click" && us(e) > t).map(us).minOption)
        tv.zip(tc).map { case (v, c) => u -> (c - v) }
      }
      assert(model.nonEmpty)
      assert(streamed == model,
        s"diff: ${(streamed.toSet diff model.toSet) ++ (model.toSet diff streamed.toSet)}")
      // and the converter count matches batch q56's cohort totals
      val q56 = Relational.q56FunnelLatency(spark, sf0001).collect()
        .map(_.getLong(1)).sum
      assert(streamed.size.toLong == q56)
    } finally q.stop()
  }

  test("stage machine: ordering guards, idle eviction, no-op state writes") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    def mkState(st: Option[FunnelState], timedOut: Boolean) =
      TestGroupState.create[FunnelState](
        st.map(Optional.of[FunnelState]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)
    def ev(sec: Long, id: Long, tpe: String) =
      Ev(7L, new java.sql.Timestamp(sec * 1000), id, tpe)

    // a click BEFORE any view and a click AT the view instant never
    // advance; the first qualifying click does
    val fresh = mkState(None, timedOut = false)
    val out = StreamingFunnel.funnelUpdate(timeout)(
      7L, Iterator(ev(1, 1, "click"), ev(2, 2, "view"), ev(2, 3, "click"),
        ev(5, 4, "click"), ev(6, 5, "purchase")), fresh).toSeq
    assert(out.map(_.stage) ==
      Seq("user", "view", "click_after_view", "purchase_after_click"))
    assert(fresh.get == FunnelState(2000000L, 5000000L, 6000000L))

    // completed funnel: further events emit nothing AND skip the
    // state-store write (no-op discipline)
    val done = mkState(Some(FunnelState(2000000L, 5000000L, 6000000L)),
      timedOut = false)
    assert(StreamingFunnel.funnelUpdate(timeout)(
      7L, Iterator(ev(9, 6, "purchase"), ev(10, 7, "view")), done).isEmpty)
    assert(!done.isUpdated)

    // idle eviction removes; a returning user restarts from `user`
    val idle = mkState(Some(FunnelState(2000000L, -1L, -1L)), timedOut = true)
    assert(StreamingFunnel.funnelUpdate(timeout)(
      7L, Iterator.empty, idle).isEmpty)
    assert(idle.isRemoved)
    val back = mkState(None, timedOut = false)
    val out2 = StreamingFunnel.funnelUpdate(timeout)(
      7L, Iterator(ev(20, 8, "view")), back).toSeq
    assert(out2.map(_.stage) == Seq("user", "view"))
  }
}
