package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.Relational
import graft.streaming.SourceKit.Sinks

class RunningReduceSpec extends SparkTestBase {

  test("keyed running reduce emits the cumulative value per event (reference run-log trace)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[KV]
    // the WindowAllKeyedPoC run log observes (a,1)(a,4)(a,12)… — running sums
    val out = RunningReduce.keyed(stream.toDS(), zero = 0)(_.k, _.v.toLong)(
      (acc, in) => acc + in.v)
    val query = Sinks.toMemory(out, "rr_trace")
    try {
      stream.addData(KV("a", 1), KV("a", 3), KV("a", 8), KV("b", 2))
      query.processAllAvailable()
      stream.addData(KV("a", 4), KV("b", 5)) // state carries across batches
      query.processAllAvailable()
      val got = Sinks.collected[(String, Int)](spark, "rr_trace")
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(got("a") == Seq(1, 4, 12, 16), s"a trace was ${got("a")}")
      assert(got("b") == Seq(2, 7), s"b trace was ${got("b")}")
    } finally query.stop()
  }

  test("streaming running reduce == batch cumulative window oracle (q9)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev].collect()

    val stream = MemoryStream[Ev]
    val out = RunningReduce.keyed(stream.toDS(), zero = (0L, 0L))(
      _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
      (acc, in) => (in.event_id, acc._2 + in.cents))
    val query = Sinks.toMemory(out, "rr_vs_batch")
    try {
      stream.addData(evs.toIndexedSeq)
      query.processAllAvailable()
      val streaming = Sinks.collected[(Long, (Long, Long))](spark, "rr_vs_batch")
        .map { case (_, (eventId, cents)) => eventId -> cents }.toMap
      val batch = Relational.q9RunningSum(spark, sf0001)
        .select(col("event_id"), round(col("running_sum") * 100).cast("long"))
        .as[(Long, Long)].collect().toMap
      assert(streaming == batch,
        s"sizes ${streaming.size} vs ${batch.size}; sample diff: " +
          batch.collectFirst { case (k, v) if streaming.get(k) != Some(v) => (k, v, streaming.get(k)) })
    } finally query.stop()
  }
}
