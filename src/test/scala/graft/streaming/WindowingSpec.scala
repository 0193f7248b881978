package graft.streaming

import java.sql.Timestamp

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.SourceKit.{EventTimeElements, Sinks}

/** Event-time tumbling windows + watermarks (SURVEY B14/B15/B18–B21):
  * the two modes of the reference's EventTimeDelayedElementsSource —
  * late-but-within-watermark data is retained; data older than the
  * watermark is dropped.
  */
class WindowingSpec extends SparkTestBase {

  private val startUs = 1700000000000000L // fixed epoch µs base

  private def tsAt(deltaMs: Long): Timestamp =
    new Timestamp(startUs / 1000 + deltaMs)

  test("tumbling event-time windows aggregate with window metadata (batch form)") {
    val s = spark
    import s.implicits._
    val elems = EventTimeElements.withEqualGaps(400.millis, Seq(1, 2, 3, 4, 5, 6, 7, 8))
    val ds = EventTimeElements.toDataset(spark, startUs, elems)
    val got = ds.toDF("value", "ts")
      .groupBy(window(col("ts"), "1 second"))
      .agg(sum("value").as("s"), count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("s"), col("n"))
      .orderBy("ws")
      .as[(Long, Long, Long)].collect().toSeq
    // delays 0,400,…,2800ms → windows [0s: 1,2,3][1s: 4,5][2s: 6,7,8]
    assert(got.map(_._2) == Seq(6, 9, 21), s"window sums were $got")
    assert(got.map(_._3) == Seq(3, 2, 3), s"window counts were $got")
    assert(got.head._1 == startUs / 1000000 * 1000000, "window not aligned to epoch second")
  }

  test("streaming tumbling windows over real events == batch q11 (closed windows)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.events(spark, sf0001)
      .select(col("value").cast("int").as("v"), col("ts"))
      .as[TsVal].collect()
    val maxTs = evs.map(_.ts.getTime).max

    val stream = MemoryStream[TsVal]
    val agg = stream.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("n"))
    val query = Sinks.toMemory(agg, "wm_events")
    try {
      stream.addData(evs.toIndexedSeq)
      query.processAllAvailable()
      // flush event far past the data advances the watermark so every data
      // window closes; its own window stays open and never emits
      stream.addData(TsVal(0, new Timestamp(maxTs + 7200000)))
      query.processAllAvailable()
      val streaming = Sinks.collected[(Long, Long)](spark, "wm_events").toMap
      val batch = graft.operators.Relational.q11WindowGlobal(spark, sf0001)
        .select(col("w_start"), col("n_events"))
        .as[(Long, Long)].collect().toMap
      assert(streaming == batch,
        s"${streaming.size} streaming windows vs ${batch.size} batch; " +
          s"diff: ${batch.collectFirst { case (k, v) if streaming.get(k) != Some(v) => (k, v, streaming.get(k)) }}")
    } finally query.stop()
  }

  test("streaming session_window over real events == batch q21 (closed sessions)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.events(spark, sf0001)
      .select(col("value").cast("int").as("v"), col("ts"))
      .as[TsVal].collect()
    val maxTs = evs.map(_.ts.getTime).max
    val flushUser = -1 // synthetic key whose open session we exclude

    val stream = MemoryStream[Ev]
    val agg = stream.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"), col("n_events"))
    val query = Sinks.toMemory(agg, "session_stream")
    try {
      val rows = graft.Tables.events(spark, sf0001)
        .selectExpr("event_id", "user_id", "ts", "0L as cents").as[Ev].collect()
      stream.addData(rows.toIndexedSeq)
      query.processAllAvailable()
      // far-future flush event closes every data session
      stream.addData(Ev(-1, flushUser, new Timestamp(maxTs + 86400000), 0))
      query.processAllAvailable()

      val streaming = Sinks.collected[(Long, Long, Long)](spark, "session_stream")
        .filter(_._1 != flushUser)
        .map { case (u, st, n) => (u, st) -> n }.toMap
      val batch = graft.operators.Relational.q21SessionWindow(spark, sf0001)
        .select(col("user_id"), col("session_start_us"), col("n_events"))
        .as[(Long, Long, Long)].collect()
        .map { case (u, st, n) => (u, st) -> n }.toMap
      assert(streaming == batch,
        s"${streaming.size} streaming sessions vs ${batch.size} batch; diff: " +
          batch.collectFirst { case (k, v) if streaming.get(k) != Some(v) => (k, v, streaming.get(k)) })
    } finally query.stop()
  }

  test("streaming sliding windows over real events == batch q22 (closed windows)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.Tables.events(spark, sf0001)
      .select(col("value").cast("int").as("v"), col("ts"))
      .as[TsVal].collect()
    val maxTs = evs.map(_.ts.getTime).max

    val stream = MemoryStream[TsVal]
    val agg = stream.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("n"))
    val query = Sinks.toMemory(agg, "slide_events")
    try {
      stream.addData(evs.toIndexedSeq)
      query.processAllAvailable()
      // flush far past the data: every one of the 4 overlapping windows
      // per event closes; the flush's own windows stay open
      stream.addData(TsVal(0, new Timestamp(maxTs + 7200000)))
      query.processAllAvailable()
      val streaming = Sinks.collected[(Long, Long)](spark, "slide_events").toMap
      val batch = graft.operators.Relational.q22SlidingWindow(spark, sf0001)
        .select(col("w_start"), col("n_events"))
        .as[(Long, Long)].collect().toMap
      assert(streaming == batch,
        s"${streaming.size} streaming windows vs ${batch.size} batch; " +
          s"diff: ${batch.collectFirst { case (k, v) if streaming.get(k) != Some(v) => (k, v, streaming.get(k)) }}")
    } finally query.stop()
  }

  test("streaming windowed agg: watermark retains in-order data and drops too-late data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TsVal]
    val agg = stream.toDS()
      .withWatermark("ts", "500 milliseconds")
      .groupBy(window(col("ts"), "1 second"))
      .agg(sum("v").as("s"))
      .select(unix_micros(col("window.start")).as("ws"), col("s"))
    val query = Sinks.toMemory(agg, "wm_agg") // append mode: emits closed windows

    try {
      stream.addData(TsVal(1, tsAt(0)), TsVal(2, tsAt(400)), TsVal(3, tsAt(900)))
      query.processAllAvailable() // watermark -> 900-500=400ms; window [0,1s) open
      stream.addData(TsVal(10, tsAt(2600)))
      query.processAllAvailable() // watermark -> 2100ms; [0,1s) closes with 6
      // too late: ts 800ms < watermark 2100ms and its window already closed
      stream.addData(TsVal(100, tsAt(800)))
      query.processAllAvailable()
      // advance far so [2,3s) closes too
      stream.addData(TsVal(20, tsAt(5000)))
      query.processAllAvailable()

      val got = Sinks.collected[(Long, Long)](spark, "wm_agg").toMap
      val w0 = startUs / 1000000 * 1000000
      assert(got(w0) == 6, s"window[0,1s) should be 1+2+3 without the late 100; got $got")
      assert(got(w0 + 2000000) == 10, s"got $got")
    } finally query.stop()
  }
}
