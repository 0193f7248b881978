package graft.streaming

import java.sql.Timestamp

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

case class Rec(id: Long, ts: Timestamp, payload: String)

class StreamingDedupSpec extends SparkTestBase {

  // +1: the initial watermark is epoch 0 and the late filter drops
  // ts <= watermark, so a minute-0 event would never enter the stream
  private def rec(id: Long, minute: Long, payload: String = "p"): Rec =
    Rec(id, new Timestamp((minute + 1) * 60000L), payload)

  test("withinWatermark: duplicates suppressed within and across batches, key re-admitted after horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Rec]
    val out = StreamingDedup.withinWatermark(stream.toDS(), "ts", "10 minutes", Seq("id"))
    val query = Sinks.toMemory(out, "dd_ww")
    try {
      // batch 1: in-batch duplicate of id=1 (different payloads — FIRST wins)
      stream.addData(rec(1, 0, "first"), rec(1, 0, "dup"), rec(2, 1))
      query.processAllAvailable()
      // batch 2: cross-batch duplicate of id=2 inside the horizon + new id=3
      stream.addData(rec(2, 5), rec(3, 6))
      query.processAllAvailable()
      // batch 3: far future — watermark passes, id=1's state is gone, so a
      // late re-occurrence of id=1 is re-admitted (bounded-state contract)
      stream.addData(rec(4, 1000))
      query.processAllAvailable()
      stream.addData(rec(1, 1001, "reborn"))
      query.processAllAvailable()

      val got = Sinks.collected[Rec](spark, "dd_ww")
      assert(got.map(_.id).sorted == Seq(1L, 1L, 2L, 3L, 4L), s"got $got")
      assert(got.filter(_.id == 1L).map(_.payload).toSet == Set("first", "reborn"))
    } finally query.stop()
  }

  test("firstSeenTtl: same suppression semantics, explicit TTL horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Rec]
    val out = StreamingDedup.firstSeenTtl(
      stream.toDS().withWatermark("ts", "0 seconds"), ttl = 10.minutes)(
      _.id, r => r.ts.getTime * 1000L)
    val query = Sinks.toMemory(out, "dd_ttl")
    try {
      stream.addData(rec(1, 0, "first"), rec(1, 0, "dup"), rec(2, 1))
      query.processAllAvailable()
      stream.addData(rec(2, 5), rec(3, 6))
      query.processAllAvailable()
      // advance the watermark far past 1's lastSeen + ttl → state evicted
      stream.addData(rec(4, 1000))
      query.processAllAvailable()
      stream.addData(rec(1, 1001, "reborn"))
      query.processAllAvailable()

      val got = Sinks.collected[Rec](spark, "dd_ttl")
      assert(got.map(_.id).sorted == Seq(1L, 1L, 2L, 3L, 4L), s"got $got")
      assert(got.filter(_.id == 1L).map(_.payload).toSet == Set("first", "reborn"))
    } finally query.stop()
  }

  test("firstSeenTtl matches batch distinct-first on an in-order feed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // id repeats every 7; all within one TTL horizon → batch semantics
    val rows = (0 until 200).map(i => rec(i % 7, i, s"v$i"))
    val expected = rows.groupBy(_.id).map { case (_, rs) => rs.minBy(_.ts.getTime) }.toSet

    val stream = MemoryStream[Rec]
    val out = StreamingDedup.firstSeenTtl(
      stream.toDS().withWatermark("ts", "0 seconds"), ttl = 1000.minutes)(
      _.id, r => r.ts.getTime * 1000L)
    val query = Sinks.toMemory(out, "dd_eq")
    try {
      val (a, b) = rows.splitAt(100)
      stream.addData(a); query.processAllAvailable()
      stream.addData(b); query.processAllAvailable()
      val got = Sinks.collected[Rec](spark, "dd_eq").toSet
      assert(got == expected, s"streaming ${got.size} vs batch ${expected.size}")
    } finally query.stop()
  }
}
