package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.streaming.SourceKit.Sinks
import graft.streaming.StreamingTransitions.Ev

/** ListState recent-events buffer == batch "last n by (ts, event_id)"
  * on an in-order cross-batch feed; buffers stay bounded at n and in
  * event-time order.
  */
class StreamingRecentSpec extends SparkTestBase {

  test("latest buffer per user == batch last-n window, cross-batch; bounded and ordered") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sf0001)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .as[Ev].collect()
        .sortBy(e => (TsUtil.micros(e.ts), e.event_id))
      val n = StreamingRecent.DefaultN
      val stream = MemoryStream[Ev]
      val out = StreamingRecent.recent(stream.toDS(), n)
      val q = Sinks.toMemory(out.toDF(), "recent_out")
      try {
        val (b1, b2) = evs.toIndexedSeq.splitAt(evs.length / 2)
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
        val rows = spark.table("recent_out")
          .selectExpr("user_id",
            "transform(events, e -> struct(e.event_id, e.us, e.event_type)) AS events")
          .as[(Long, Seq[(Long, Long, String)])].collect()
        // the LATEST snapshot per user: buffers only grow within a run,
        // so the row with the max trailing event id is the final one...
        // except ids are not monotone — pick by longest-then-latest-us
        val latest = rows.groupBy(_._1).map { case (u, rs) =>
          u -> rs.maxBy(r => (r._2.last._2, r._2.last._1))._2
        }
        val expected = evs.groupBy(_.user_id).map { case (u, es) =>
          u -> es.sortBy(e => (TsUtil.micros(e.ts), e.event_id)).takeRight(n)
            .map(e => (e.event_id, TsUtil.micros(e.ts), e.event_type)).toSeq
        }
        assert(latest.nonEmpty && latest == expected,
          s"recent-buffer drift: ${(latest.toSet diff expected.toSet).take(2)}")
        // every snapshot ever emitted is bounded and event-time-ordered
        rows.foreach { case (_, es) =>
          assert(es.size <= n)
          assert(es == es.sortBy(e => (e._2, e._1)))
        }
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
