package graft.streaming

import java.sql.Timestamp

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

/** Stream-stream time-bounded join via [[StreamJoin.intervalJoin]] — the
  * streaming form of the interval-join query (q23). The reference has no
  * joins at all; Spark's watermarked stream-stream join buffers both
  * sides in the state store and evicts rows once the watermark passes
  * the bound derived from the range condition.
  */
class StreamStreamJoinSpec extends SparkTestBase {

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000)

  test("purchases join clicks within the preceding hour, across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDS().toDF("c_eid", "c_user", "c_ts", "c_cents")
      .withWatermark("c_ts", "2 hours")
    val p = purchases.toDS().toDF("p_eid", "p_user", "p_ts", "p_cents")
      .withWatermark("p_ts", "2 hours")
    val joined = StreamJoin.intervalJoin(
        p, c, Seq("p_user" -> "c_user"), "p_ts", "c_ts", 1.hour)
      .select(col("p_eid"), col("c_eid"))
    val query = Sinks.toMemory(joined, "ss_join")
    try {
      clicks.addData(Ev(1, 1, ts(0), 0), Ev(2, 1, ts(30), 0), Ev(3, 2, ts(0), 0))
      purchases.addData(Ev(100, 1, ts(45), 0), Ev(101, 2, ts(90), 0))
      query.processAllAvailable()
      // batch 2: a click arriving after the purchase it matches (state kept)
      clicks.addData(Ev(4, 2, ts(80), 0))
      purchases.addData(Ev(102, 2, ts(100), 0))
      query.processAllAvailable()

      val got = Sinks.collected[(Long, Long)](spark, "ss_join").toSet
      val expected = Set(
        (100L, 1L), (100L, 2L), // user1 purchase@45m matches clicks @0m,@30m
        (101L, 4L),             // user2 purchase@90m matches late click@80m (cross-batch)
        (102L, 4L))             // user2 purchase@100m matches click@80m
      assert(got == expected, s"got $got")
    } finally query.stop()
  }

  test("sub-second lookback keeps millisecond precision (no toSeconds truncation)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tms(ms: Long) = new Timestamp(1700000000000L + ms)
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDS().toDF("c_eid", "c_user", "c_ts", "c_cents")
      .withWatermark("c_ts", "1 minute")
    val p = purchases.toDS().toDF("p_eid", "p_user", "p_ts", "p_cents")
      .withWatermark("p_ts", "1 minute")
    val joined = StreamJoin.intervalJoin(
        p, c, Seq("p_user" -> "c_user"), "p_ts", "c_ts", 500.millis)
      .select(col("p_eid"), col("c_eid"))
    val query = SourceKit.Sinks.toMemory(joined, "ss_join_ms")
    try {
      clicks.addData(Ev(1, 1, tms(0), 0))
      // 400 ms later: inside the 500 ms window; 600 ms later: outside
      purchases.addData(Ev(100, 1, tms(400), 0), Ev(101, 1, tms(600), 0))
      query.processAllAvailable()
      val got = SourceKit.Sinks.collected[(Long, Long)](spark, "ss_join_ms").toSet
      assert(got == Set((100L, 1L)), s"got $got")
    } finally query.stop()
  }

  test("left-outer interval join emits the null-padded row once the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val c = clicks.toDS().toDF("c_eid", "c_user", "c_ts", "c_cents")
      .withWatermark("c_ts", "0 seconds")
    val p = purchases.toDS().toDF("p_eid", "p_user", "p_ts", "p_cents")
      .withWatermark("p_ts", "0 seconds")
    val joined = StreamJoin.intervalJoin(
        p, c, Seq("p_user" -> "c_user"), "p_ts", "c_ts", 1.hour, "left_outer")
      .select(col("p_eid"), col("c_eid"))
    val query = Sinks.toMemory(joined, "ss_left_join")
    try {
      // user 1 purchase has a click in range; user 9's has none
      clicks.addData(Ev(1, 1, ts(10), 0))
      purchases.addData(Ev(100, 1, ts(30), 0), Ev(101, 9, ts(30), 0))
      query.processAllAvailable()
      // flush both streams far past 101's match horizon (30m + 1h) so the
      // watermark (min across inputs) releases the unmatched row
      clicks.addData(Ev(2, 50, ts(600), 0))
      purchases.addData(Ev(999, 50, ts(600), 0))
      query.processAllAvailable()

      val got = Sinks.collected[(Long, Option[Long])](spark, "ss_left_join").toSet
      assert(got.contains((100L, Some(1L))), s"matched row missing: $got")
      assert(got.contains((101L, None)), s"null-padded row missing: $got")
    } finally query.stop()
  }
}
