package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

/** Streaming exact dedup (SURVEY §7.4): `dropDuplicatesWithinWatermark`
  * is the scale form of exact dedup on unbounded streams — state is
  * bounded by the watermark horizon instead of growing with all keys
  * ever seen (the batch form, Dedup.dedupExact, is the oracle-checked
  * twin on the gate).
  */
class StreamingDedupSpec extends SparkTestBase {

  private def ts(ms: Long) = new Timestamp(1700000000000L + ms)

  test("dropDuplicatesWithinWatermark: duplicates within the horizon are dropped, state stays bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[TsVal]
    val deduped = stream.toDS()
      .withWatermark("ts", "1 second")
      .dropDuplicatesWithinWatermark("v")
    val query = Sinks.toMemory(deduped, "stream_dedup")
    try {
      stream.addData(TsVal(1, ts(0)), TsVal(1, ts(100)), TsVal(2, ts(200)))
      query.processAllAvailable()
      stream.addData(TsVal(1, ts(300)), TsVal(3, ts(400))) // 1 is still a dup
      query.processAllAvailable()
      val got = Sinks.collected[TsVal](spark, "stream_dedup").map(_.v).sorted
      assert(got == Seq(1, 2, 3), s"expected one row per value, got $got")

      // past the watermark horizon the duplicate state is expired, so the
      // same value is admitted again — bounded state by design
      stream.addData(TsVal(99, ts(10000))) // advances watermark to 9 s
      query.processAllAvailable()
      stream.addData(TsVal(1, ts(10100)))
      query.processAllAvailable()
      val again = Sinks.collected[TsVal](spark, "stream_dedup").count(_.v == 1)
      assert(again == 2, "value re-admitted after its dedup state expired with the watermark")
    } finally query.stop()
  }
}
