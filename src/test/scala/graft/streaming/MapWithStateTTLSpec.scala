package graft.streaming

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.Relational
import graft.streaming.SourceKit.{Script, Sinks}

/** Flagship acceptance tests (SURVEY §7.2 slice 0): the TTL-evicted
  * per-key running sum — semantics of the reference's
  * MapWithStateIterPoC/MapWithStateTest — via MapWithStateTTL, plus the
  * streaming/batch equivalence against the DuckDB-checked oracle query.
  */
class MapWithStateTTLSpec extends SparkTestBase {

  test("processing-time TTL: keys accumulate within ttl and restart after eviction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // generous ttl vs batch cadence (SURVEY §7.3: virtual-time control is
    // impossible for ProcessingTimeTimeout; margins make it deterministic.
    // 15 s ttl: a mis-eviction now needs a 15 s stall between consecutive
    // micro-batches — observed flake at 5 s under concurrent-JVM load)
    val ttl = 15.seconds
    val stream = MemoryStream[KV]
    val out = MapWithStateTTL.processingTime(
      stream.toDS(), ttl, defaultState = 0)(_.k) {
      (k, in, sum) => val s2 = sum + in.v; ((k, s2), s2)
    }
    // paced trigger: with ProcessingTimeTimeout the engine always has
    // another batch to run, so the script waits on sink row counts
    // (playByCount), not processAllAvailable
    val query = Sinks.toMemory(out, "ttl_trace", triggerInterval = Some("100 milliseconds"))

    try {
      // mirrors the MapWithStateTest script shape: bursts split by a
      // short (< ttl) gap, then a long (> ttl) gap forcing eviction
      Script.empty[KV]
        .addElem(KV("a", 1)).addElem(KV("b", 2))
        .addGap(100.millis)
        .addElem(KV("a", 3))          // within ttl: a accumulates 1+3=4
        .addGap(20.seconds)           // > ttl: both keys evicted
        .addElem(KV("a", 5))          // fresh cycle: a restarts at 5
        .addElem(KV("b", 1))          // fresh cycle: b restarts at 1
        .playByCount(stream, spark, "ttl_trace")

      val got = Sinks.collected[(String, Int)](spark, "ttl_trace")
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      // per-key traces are ordered; cross-key interleaving is not asserted
      // (same tolerance as the reference test's anyOf matchers)
      assert(got("a") == Seq(1, 4, 5), s"a trace was ${got("a")}")
      assert(got("b") == Seq(2, 1), s"b trace was ${got("b")}")
    } finally query.stop()
  }

  test("event-time TTL streaming == batch gap-sessionization oracle (q14), incl. cross-batch state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // value -> exact cents, same HALF_UP rounding as cast(value as decimal(18,2))
    val evs = Tables.events(spark, sf0001)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[Ev]
      .collect()
      .sortBy(e => (e.ts.getTime, e.event_id))

    val stream = MemoryStream[Ev]
    val withWm = stream.toDS().withWatermark("ts", "0 seconds")
    val ttl = (Relational.TtlMicros / 1000).toInt.millis // 30 min, as in the oracle
    val out = MapWithStateTTL.eventTime(
      withWm, ttl, defaultState = 0L)(
      _.user_id, e => TsUtil.micros(e.ts), _.event_id)(
      (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) })
    val query = Sinks.toMemory(out, "ttl_stream_vs_batch")

    try {
      // two batches split on the time axis: exercises state carried across
      // micro-batches and watermark-driven timeout cleanup of stale keys
      val (first, second) = evs.splitAt(evs.length / 2)
      stream.addData(first.toIndexedSeq); query.processAllAvailable()
      stream.addData(second.toIndexedSeq); query.processAllAvailable()

      val streaming = Sinks.collected[(Long, Long, Long)](spark, "ttl_stream_vs_batch")
        .map { case (eventId, _, cents) => eventId -> cents }.toMap

      val batch = Relational.q14MapWithStateTtl(spark, sf0001)
        .select(col("event_id"), round(col("running_value") * 100).cast("long"))
        .as[(Long, Long)].collect().toMap

      assert(streaming.size == batch.size, s"${streaming.size} streaming rows vs ${batch.size} batch rows")
      val diffs = batch.collect {
        case (id, v) if streaming.get(id) != Some(v) => (id, v, streaming.get(id))
      }
      assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
    } finally query.stop()
  }
}
