package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingTransitions.Ev

/** Streaming transitions == batch q58 matrix when fed in order, one
  * output row per event, and cross-batch chaining through the stored
  * last type.
  */
class StreamingTransitionsSpec extends SparkTestBase {

  test("cross-batch transition counts == batch q58 matrix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingTransitions.transitions(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "trans_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("trans_out")
        .groupBy("prev_type", "cur_type").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // exactly one transition per event
      assert(streamed.values.sum == rows.length)
      val batch = Relational.q58Transitions(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"diff: ${(streamed.toSet diff batch.toSet) ++ (batch.toSet diff streamed.toSet)}")
    } finally q.stop()
  }

  test("a returning user after idle eviction restarts from _start") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    def mkState(st: Option[String], timedOut: Boolean) =
      TestGroupState.create[String](
        st.map(Optional.of[String]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)
    def ev(id: Long, tpe: String) =
      Ev(7L, new java.sql.Timestamp(id * 1000), id, tpe)

    val idle = mkState(Some("click"), timedOut = true)
    assert(StreamingTransitions.transitionUpdate(timeout)(
      7L, Iterator.empty, idle).isEmpty)
    assert(idle.isRemoved)

    val fresh = mkState(None, timedOut = false)
    val out = StreamingTransitions.transitionUpdate(timeout)(
      7L, Iterator(ev(1, "view"), ev(2, "click")), fresh).toSeq
    assert(out.map(t => (t.prev_type, t.cur_type)) ==
      Seq(("_start", "view"), ("view", "click")))
    assert(fresh.get == "click")
  }
}
