package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.SourceKit.Sinks

/** Stream-stream time-bounded inner join — the streaming form of the
  * interval-join query (q23). The reference has no joins at all; Spark's
  * watermarked stream-stream join buffers both sides in the state store
  * and evicts rows once the watermark passes the join bound.
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
    val joined = p.join(c,
        expr("p_user = c_user AND c_ts < p_ts AND c_ts >= p_ts - interval 1 hour"))
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
}
