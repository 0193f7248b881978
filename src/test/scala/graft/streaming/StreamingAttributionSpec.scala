package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingAttribution.Touch
import graft.streaming.StreamingTransitions.Ev

/** Streaming last-touch attribution == batch q62 when fed in order, one
  * row per purchase, lookback + strictly-before semantics, eviction and
  * no-op state-write discipline.
  */
class StreamingAttributionSpec extends SparkTestBase {

  test("cross-batch attribution report == batch q62 row-for-row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingAttribution.hits(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "attr_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .groupBy("attribution")
        .agg(count(lit(1)).as("n_purchases"), sum("lag_s").as("total_lag_s"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = Relational.q62Attribution(spark, sf0001).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"diff: ${(streamed.toSet diff batch.toSet) ++ (batch.toSet diff streamed.toSet)}")
      // exactly one row per purchase
      val nPurchases = rows.count(_.event_type == "purchase").toLong
      assert(spark.table("attr_out").count() == nPurchases)
    } finally q.stop()
  }

  test("lookback, strictly-before ordering, eviction, no-op state writes") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    val lookback = Relational.AttributionLookbackUs
    def mkState(st: Option[Touch], timedOut: Boolean) =
      TestGroupState.create[Touch](
        st.map(Optional.of[Touch]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)
    def ev(sec: Long, id: Long, tpe: String) =
      Ev(7L, new java.sql.Timestamp(sec * 1000), id, tpe)

    // purchase before any touch → none; after a click → click with the
    // right integer-seconds lag; a later view re-points attribution
    val fresh = mkState(None, timedOut = false)
    val out = StreamingAttribution.attributionUpdate(lookback, timeout)(
      7L, Iterator(ev(1, 1, "purchase"), ev(2, 2, "click"), ev(5, 3, "purchase"),
        ev(6, 4, "view"), ev(9, 5, "purchase")), fresh).toSeq
    assert(out.map(h => (h.attribution, h.lag_s)) ==
      Seq(("none", 0L), ("click", 3L), ("view", 3L)))
    assert(fresh.get == Touch("view", 6000000L))

    // a stale touch beyond the lookback reports none
    val stale = mkState(Some(Touch("click", 0L)), timedOut = false)
    val out2 = StreamingAttribution.attributionUpdate(lookback, timeout)(
      7L, Iterator(ev(8 * 86400L, 6, "purchase")), stale).toSeq
    assert(out2.map(_.attribution) == Seq("none"))
    assert(!stale.isUpdated) // purchases alone never rewrite the store

    // idle eviction removes; TTL >= lookback makes it lossless
    val idle = mkState(Some(Touch("view", 0L)), timedOut = true)
    assert(StreamingAttribution.attributionUpdate(lookback, timeout)(
      7L, Iterator.empty, idle).isEmpty)
    assert(idle.isRemoved)
  }
}
