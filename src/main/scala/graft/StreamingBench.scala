package graft

import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CountWindows, MapWithStateTTL, RunningReduce, StreamingTopK}

/** Streaming side of the benchmark: pushes the whole `events` table of a
  * scale factor through the stateful operators (MemoryStream →
  * flatMapGroupsWithState → memory sink) and blocks until everything is
  * processed — per-round throughput line items for the flagship TTL map
  * AND the rest of the stateful surface (RunningReduce, CountWindows,
  * StreamingTopK, and a RocksDB-provider TTL run), so a streaming perf
  * regression is visible round-over-round, not just the batch side.
  * Event-time TTL matches the q14 batch oracle semantics, and
  * `processAllAvailable` terminates (unlike the processing-time form —
  * see MapWithStateTTL scaladoc).
  */
object StreamingBench {

  case class BEv(event_id: Long, user_id: Long, ts: java.sql.Timestamp, cents: Long)

  /** Exact epoch µs: Timestamp.getTime is ms-truncated, sub-ms lives in
    * getNanos — matches q14's unix_micros arithmetic exactly. */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  private def eventRows(spark: SparkSession, sfDir: String): Array[BEv] = {
    val s = spark
    import s.implicits._
    Tables.events(spark, sfDir)
      .select(
        col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[BEv].collect()
  }

  /** Feed `rows` in two halves (cross-batch state and watermark-driven
    * cleanup both run, like a real incremental deployment), block until
    * drained, hand the sink row count to `check`. Callers with a
    * watermark must pre-sort by the FULL event-time precision — see
    * [[eventTimeOrdered]]. */
  private def runTwoBatches[T](
      spark: SparkSession,
      stream: MemoryStream[T],
      out: org.apache.spark.sql.Dataset[_],
      rows: IndexedSeq[T],
      tag: String)(check: Long => Unit): Unit = {
    val sinkName = s"bench_${tag}_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(sinkName)
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      stream.addData(a); query.processAllAvailable()
      stream.addData(b); query.processAllAvailable()
      check(spark.table(sinkName).count())
    } finally {
      query.stop()
      spark.catalog.dropTempView(sinkName)
    }
  }

  /** Rows in full-µs event-time order: the batch boundary must respect
    * MICROsecond precision — a ms-truncated sort key could split a
    * sub-ms tie across batches, and batch 1's 0-delay watermark would
    * then drop the batch-2 twin as late. */
  private def eventTimeOrdered(rows: Array[BEv]): IndexedSeq[BEv] =
    rows.sortBy(r => (micros(r.ts), r.event_id)).toIndexedSeq

  private def requireCount(tag: String, expected: Long)(n: Long): Unit =
    require(n == expected, s"$tag emitted $n of $expected rows")

  /** Flagship: TTL-evicted keyed stateful map, event-time variant. */
  def ttlPipeline(spark: SparkSession, sfDir: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(spark, sfDir)
    val stream = MemoryStream[BEv]
    val out = MapWithStateTTL.eventTime(
      stream.toDS().withWatermark("ts", "0 seconds"),
      ttl = 30.minutes, defaultState = 0L)(
      _.user_id, e => micros(e.ts), _.event_id)(
      (k, in, sum) => { val s2 = sum + in.cents; ((in.event_id, k, s2), s2) })
    runTwoBatches(spark, stream, out, eventTimeOrdered(rows), "ttl")(
      requireCount("ttl", rows.length.toLong))
  }

  /** The flagship TTL pipeline on the RocksDB state store provider —
    * the 100 TB state posture (bounded heap, spill-to-disk); a
    * regression in the RocksDB round-trip cost shows up here. */
  def ttlPipelineRocksDB(spark: SparkSession, sfDir: String): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try ttlPipeline(spark, sfDir)
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** Keyed running reduce (B10): per-user running cents sum, one output
    * row per event. */
  def runningReducePipeline(spark: SparkSession, sfDir: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(spark, sfDir)
    val stream = MemoryStream[BEv]
    val out = RunningReduce.keyed(stream.toDS(), 0L)(
      _.user_id, e => micros(e.ts), _.event_id)(
      (acc, e) => acc + e.cents)
    runTwoBatches(spark, stream, out, eventTimeOrdered(rows), "running_reduce")(
      requireCount("running_reduce", rows.length.toLong))
  }

  /** Keyed count windows (B17): size-5 tumbling count window per user,
    * one output row per COMPLETED window (the incomplete tail stays
    * buffered in state — expected count derived from the input). */
  def countWindowsPipeline(spark: SparkSession, sfDir: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(spark, sfDir)
    val stream = MemoryStream[BEv]
    val out = CountWindows.keyed(stream.toDS(), size = 5)(
      _.user_id, e => micros(e.ts), _.event_id)(
      (k, items) => (k, items.map(_.cents).sum))
    val expected = rows.groupBy(_.user_id).valuesIterator.map(_.size / 5).sum.toLong
    runTwoBatches(spark, stream, out, eventTimeOrdered(rows), "count_windows")(
      requireCount("count_windows", expected))
  }

  /** Streaming heavy hitters: SpaceSaving sketches over the event_type
    * stream (one sketch per group key), top-k snapshots per batch. */
  def topKPipeline(spark: SparkSession, sfDir: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val types = Tables.events(spark, sfDir)
      .select(col("event_type")).as[String].collect()
    val stream = MemoryStream[String]
    val out = StreamingTopK.topK(stream.toDS(), groups = 4, capacity = 64, k = 10)
    runTwoBatches(spark, stream, out, types.toIndexedSeq, "topk")(
      n => require(n > 0, "topk emitted no snapshots"))
  }
}
