package graft.streaming

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.Relational
import graft.streaming.SourceKit.{Script, Sinks}

/** Differential pin of the `transformWithState` twin (VERDICT r12 item
  * 4): [[MapWithStateTWS]] must emit EXACTLY what the flagship
  * [[MapWithStateTTL]] emits on identical feeds — event time against
  * the same batch-oracle-checked corpus, processing time against the
  * reference-shaped eviction script. transformWithState requires the
  * RocksDB state store provider, so every query here runs under it
  * (which also re-pins the flagship-vs-TWS comparison on the provider
  * the 100-TB posture uses).
  */
class MapWithStateTWSSpec extends SparkTestBase {

  private def withRocksDB[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("event-time: transformWithState twin == flagship on the q14 corpus, cross-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val ttl = (Relational.TtlMicros / 1000).toInt.millis

    def run(tag: String,
        build: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[(Long, Long, Long)])
        : Seq[(Long, Long, Long)] = {
      val stream = MemoryStream[Ev]
      val out = build(stream.toDS().withWatermark("ts", "0 seconds"))
      val query = Sinks.toMemory(out, tag)
      try {
        val (first, second) = evs.splitAt(evs.length / 2)
        stream.addData(first.toIndexedSeq); query.processAllAvailable()
        stream.addData(second.toIndexedSeq); query.processAllAvailable()
        Sinks.collected[(Long, Long, Long)](spark, tag).sorted
      } finally query.stop()
    }

    withRocksDB {
      val flagship = run("tws_diff_flagship", ds =>
        MapWithStateTTL.eventTime(ds, ttl, defaultState = 0L)(
          _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
          (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) }))
      val tws = run("tws_diff_tws", ds =>
        MapWithStateTWS.eventTime(ds, ttl, defaultState = 0L)(
          _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
          (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) }))
      assert(tws.nonEmpty && tws == flagship,
        s"transformWithState diverged: ${tws.size} rows vs ${flagship.size}")
    }
  }

  test("processing-time: native TTLConfig reproduces the flagship eviction script") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDB {
      val stream = MemoryStream[KV]
      val out = MapWithStateTWS.processingTime(
        stream.toDS(), ttl = 15.seconds, defaultState = 0)(_.k) {
        (k, in, sum) => val s2 = sum + in.v; ((k, s2), s2)
      }
      val query = Sinks.toMemory(out, "tws_proc",
        triggerInterval = Some("100 milliseconds"))
      try {
        // the flagship spec's script: bursts split by a short gap, then
        // a long (> ttl) gap forcing the idle-restart
        Script.empty[KV]
          .addElem(KV("a", 1)).addElem(KV("b", 2))
          .addGap(100.millis)
          .addElem(KV("a", 3))
          .addGap(20.seconds)
          .addElem(KV("a", 5))
          .addElem(KV("b", 1))
          .playByCount(stream, spark, "tws_proc")
        val got = Sinks.collected[(String, Int)](spark, "tws_proc")
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        assert(got("a") == Seq(1, 4, 5), s"a trace was ${got("a")}")
        assert(got("b") == Seq(2, 1), s"b trace was ${got("b")}")
      } finally query.stop()
    }
  }

  test("event-time: in-batch disorder is sorted away (shuffled feed == sorted feed)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev]
      .collect()
      .sortBy(e => (TsUtil.micros(e.ts), e.event_id))
    val ttl = (Relational.TtlMicros / 1000).toInt.millis
    def run(tag: String, b1: Seq[Ev], b2: Seq[Ev]): Seq[(Long, Long, Long)] = {
      val stream = MemoryStream[Ev]
      val out = MapWithStateTWS.eventTime(
        stream.toDS().withWatermark("ts", "0 seconds"), ttl, defaultState = 0L)(
        _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
        (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) })
      val query = Sinks.toMemory(out, tag)
      try {
        stream.addData(b1.toIndexedSeq); query.processAllAvailable()
        stream.addData(b2.toIndexedSeq); query.processAllAvailable()
        Sinks.collected[(Long, Long, Long)](spark, tag).sorted
      } finally query.stop()
    }
    withRocksDB {
      val (h, t) = evs.toIndexedSeq.splitAt(evs.length / 2)
      val sortedOut = run("tws_order_sorted", h, t)
      val rnd = new scala.util.Random(13)
      val shuffledOut = run("tws_order_shuffled", rnd.shuffle(h), rnd.shuffle(t))
      assert(shuffledOut.nonEmpty && shuffledOut == sortedOut,
        "in-batch arrival order leaked into the fold")
    }
  }

  test("event-time warm start: snapshot + streamed tail == full-stream tail output") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev]
      .collect()
      .sortBy(e => (TsUtil.micros(e.ts), e.event_id))
    val ttl = (Relational.TtlMicros / 1000).toInt.millis
    val (head, tail) = evs.toIndexedSeq.splitAt(evs.length / 2)

    def run(tag: String, feed: Seq[IndexedSeq[Ev]],
        build: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[(Long, Long, Long)])
        : Seq[(Long, Long, Long)] = {
      val stream = MemoryStream[Ev]
      val query = Sinks.toMemory(
        build(stream.toDS().withWatermark("ts", "0 seconds")), tag)
      try {
        feed.foreach { b => stream.addData(b); query.processAllAvailable() }
        Sinks.collected[(Long, Long, Long)](spark, tag).sorted
      } finally query.stop()
    }

    withRocksDB {
      // baseline: the whole history streamed through the cold operator
      val full = run("tws_warm_full", Seq(head, tail), ds =>
        MapWithStateTWS.eventTime(ds, ttl, defaultState = 0L)(
          _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
          (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) }))
      // state snapshot after the head, derived by an INDEPENDENT
      // driver-side replay of the fold semantics (gap > ttl resets)
      val snapshot = head.groupBy(_.user_id).map { case (u, es) =>
        var sum = 0L; var last = Long.MinValue
        es.sortBy(e => (TsUtil.micros(e.ts), e.event_id)).foreach { e =>
          val us = TsUtil.micros(e.ts)
          if (last != Long.MinValue && us - last > Relational.TtlMicros) sum = 0L
          sum += e.cents; last = us
        }
        (u, sum, last)
      }.toSeq
      val warm = run("tws_warm_tail", Seq(tail), ds =>
        MapWithStateTWS.eventTimeFrom(
          ds, s.createDataset(snapshot), ttl, defaultState = 0L)(
          _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
          (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) }))
      val tailIds = tail.map(_.event_id).toSet
      val expect = full.filter(r => tailIds(r._1))
      assert(warm.nonEmpty && warm == expect,
        s"warm handoff diverged: ${warm.size} rows vs ${expect.size}")
    }
  }

  test("event-time: eviction timer physically drops idle state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDB {
      val stream = MemoryStream[Ev]
      val out = MapWithStateTWS.eventTime(
        stream.toDS().withWatermark("ts", "0 seconds"),
        ttl = 1.minute, defaultState = 0L)(
        _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
        (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) })
      val query = Sinks.toMemory(out, "tws_evict")
      try {
        def ev(id: Long, user: Long, tMs: Long, c: Long) =
          Ev(id, user, new java.sql.Timestamp(tMs), c)
        // two users at t=0; user 2 alone far later — the watermark
        // passes user 1's (last + ttl) timer and its state is evicted
        stream.addData(ev(1, 1L, 0L, 10L), ev(2, 2L, 0L, 20L))
        query.processAllAvailable()
        stream.addData(ev(3, 2L, 10 * 60 * 1000L, 5L))
        query.processAllAvailable()
        // one more batch so the timer fires against the advanced watermark
        stream.addData(ev(4, 2L, 10 * 60 * 1000L + 1000L, 1L))
        query.processAllAvailable()
        val remaining = StateProbe.awaitStateRows(query, _ <= 1)
        assert(remaining <= 1,
          s"idle user's transformWithState state not evicted: $remaining rows")
        // and user 2's own sum survived its activity (5 then 6 after
        // the within-ttl follow-up)
        val got = Sinks.collected[(Long, Long, Long)](spark, "tws_evict")
        assert(got.contains((3L, 2L, 5L)) && got.contains((4L, 2L, 6L)), s"got $got")
      } finally query.stop()
    }
  }
}
