package graft

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.MapWithStateTTL

/** Streaming side of the benchmark: pushes the whole `events` table of a
  * scale factor through the flagship TTL-evicted stateful map
  * (MemoryStream → flatMapGroupsWithState(EventTimeTimeout) → memory
  * sink) and blocks until everything is processed. Event-time TTL
  * matches the q14 batch oracle semantics, and `processAllAvailable`
  * terminates (unlike the processing-time form — see MapWithStateTTL
  * scaladoc).
  */
object StreamingBench {

  case class BEv(event_id: Long, user_id: Long, ts: java.sql.Timestamp, cents: Long)

  def ttlPipeline(spark: SparkSession, sfDir: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Tables.events(spark, sfDir)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[BEv].collect()

    val stream = MemoryStream[BEv]
    // exact epoch µs: Timestamp.getTime is ms-truncated, sub-ms lives in
    // getNanos — matches q14's unix_micros arithmetic exactly
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
    val out = MapWithStateTTL.eventTime(
      stream.toDS().withWatermark("ts", "0 seconds"),
      ttl = 30.minutes, defaultState = 0L)(
      _.user_id, e => micros(e.ts), _.event_id)(
      (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) })
    val sinkName = s"bench_ttl_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      // two batches so cross-batch state and watermark-driven cleanup both
      // run, like a real incremental deployment
      val (a, b) = rows.sortBy(_.ts.getTime).splitAt(rows.length / 2)
      stream.addData(a.toIndexedSeq); query.processAllAvailable()
      stream.addData(b.toIndexedSeq); query.processAllAvailable()
      val n = spark.table(sinkName).count()
      require(n == rows.length, s"streaming emitted $n of ${rows.length} rows")
    } finally {
      query.stop()
      spark.catalog.dropTempView(sinkName)
    }
  }
}
