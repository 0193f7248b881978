package graft.streaming

import scala.concurrent.duration._

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

  test("keyedWithTtl: idle keys are physically evicted and restart from zero") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // margins as in MapWithStateTTLSpec: eviction now needs a 15 s stall
    // between consecutive micro-batches to misfire
    val ttl = 15.seconds
    val stream = MemoryStream[KV]
    val out = RunningReduce.keyedWithTtl(stream.toDS(), zero = 0, ttl)(
      _.k, _.v.toLong)((acc, in) => acc + in.v)
    val query = Sinks.toMemory(out, "rr_ttl", triggerInterval = Some("100 milliseconds"))
    try {
      SourceKit.Script.empty[KV]
        .addElem(KV("a", 1)).addElem(KV("b", 2))
        .addGap(100.millis)
        .addElem(KV("a", 3))   // within ttl: a accumulates 1+3=4
        .addGap(20.seconds)    // > ttl: both keys evicted
        .addElem(KV("a", 5))   // fresh cycle: a restarts at 5
        .playByCount(stream, spark, "rr_ttl")
      val got = Sinks.collected[(String, Int)](spark, "rr_ttl")
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(got("a") == Seq(1, 4, 5), s"a trace was ${got("a")}")
      assert(got("b") == Seq(2), s"b trace was ${got("b")}")
      // b never came back: its state row must be GONE from the
      // StateStore (the un-TTL'd keyed() would report 2 rows forever)
      val rows = StateProbe.awaitStateRows(query, _ == 1L)
      assert(rows == 1, s"expected 1 state row after eviction, got $rows")
    } finally query.stop()
  }

  test("keyedWithTtlTws: transformWithState native-TTL twin reproduces the eviction script") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // differential pin (VERDICT r18 item 6): the SAME script the
    // GroupState keyedWithTtl test plays, same expected trace — native
    // TTLConfig eviction + data-path gap>ttl restart must be
    // observationally identical to ProcessingTimeTimeout + remove().
    // transformWithState requires the RocksDB provider.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ttl = 15.seconds
      val stream = MemoryStream[KV]
      val out = RunningReduce.keyedWithTtlTws(stream.toDS(), zero = 0, ttl)(
        _.k, _.v.toLong)((acc, in) => acc + in.v)
      val query = Sinks.toMemory(out, "rr_ttl_tws",
        triggerInterval = Some("100 milliseconds"))
      try {
        SourceKit.Script.empty[KV]
          .addElem(KV("a", 1)).addElem(KV("b", 2))
          .addGap(100.millis)
          .addElem(KV("a", 3))   // within ttl: a accumulates 1+3=4
          .addGap(20.seconds)    // > ttl: both keys swept by native TTL
          .addElem(KV("a", 5))   // fresh cycle: a restarts at 5
          .playByCount(stream, spark, "rr_ttl_tws")
        val got = Sinks.collected[(String, Int)](spark, "rr_ttl_tws")
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        assert(got("a") == Seq(1, 4, 5), s"a trace was ${got("a")}")
        assert(got("b") == Seq(2), s"b trace was ${got("b")}")
      } finally query.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("hot key: 100k events for ONE key in a single micro-batch fold correctly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // pins the documented per-key-per-batch buffering bound: the whole
    // batch lands on one key in one batch and must sort+fold without
    // incident at the default test heap
    val n = 100000
    val stream = MemoryStream[KV]
    val out = RunningReduce.keyed(stream.toDS(), zero = 0L)(
      _.k, _.v.toLong)((acc, in) => acc + in.v)
    val query = Sinks.toMemory(out, "rr_hot")
    try {
      stream.addData((1 to n).map(i => KV("hot", i)))
      query.processAllAvailable()
      val got = Sinks.collected[(String, Long)](spark, "rr_hot").map(_._2)
      assert(got.size == n)
      // orderOf sorts by v, so the trace is the prefix sums of 1..n
      assert(got.last == n.toLong * (n + 1) / 2, s"final sum was ${got.last}")
      assert(got.take(4) == Seq(1L, 3L, 6L, 10L), s"head was ${got.take(4)}")
    } finally query.stop()
  }
}
