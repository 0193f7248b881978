package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingTransitions.Ev

/** Streaming 3-gram journey paths == batch q69 when fed in order:
  * aggregating the emitted hits with the same count/distinct/order
  * reproduces the batch top-paths result row for row, including the
  * cross-batch chaining through the two-string suffix state.
  */
class StreamingPathsSpec extends SparkTestBase {

  test("cross-batch path hits aggregate == batch q69 top paths") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingPaths.paths(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "paths_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("paths_out")
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n_paths"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_paths").desc, col("e1").asc, col("e2").asc,
          col("e3").asc)
        .limit(20)
        .collect().map(_.toSeq).toSeq
      val batch = Relational.q69PathTopk(spark, sf0001)
        .collect().map(_.toSeq).toSeq
      assert(batch.nonEmpty && streamed == batch,
        s"streamed paths diverged: ${streamed.take(3)} vs ${batch.take(3)}")
    } finally q.stop()
  }

  test("exactly max(0, n-2) hits per user; suffix chains across batches") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def mkState(st: Option[StreamingPaths.PathState]) =
      TestGroupState.create[StreamingPaths.PathState](
        st.map(Optional.of[StreamingPaths.PathState]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], hasTimedOut = false)
    def ev(tMs: Long, id: Long, t: String) =
      Ev(5L, new java.sql.Timestamp(tMs), id, t)
    val st = mkState(None)
    // first batch: three events -> exactly one 3-gram
    val out1 = StreamingPaths.pathUpdate(Some(500.millis))(
      5L, Iterator(ev(0, 1, "view"), ev(1, 2, "click"), ev(2, 3, "purchase")),
      st).toSeq
    assert(out1 == Seq(StreamingPaths.PathHit(5L, "view", "click", "purchase")))
    // second batch: one event -> one more 3-gram chained through state
    val out2 = StreamingPaths.pathUpdate(Some(500.millis))(
      5L, Iterator(ev(3, 4, "view")), st).toSeq
    assert(out2 == Seq(StreamingPaths.PathHit(5L, "click", "purchase", "view")))
    // fewer than 3 events ever seen -> no hits
    val fresh = mkState(None)
    assert(StreamingPaths.pathUpdate(Some(500.millis))(
      5L, Iterator(ev(0, 1, "view"), ev(1, 2, "click")), fresh).isEmpty)
  }
}
