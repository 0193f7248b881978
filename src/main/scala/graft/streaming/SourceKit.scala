package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Test-source kit mirroring the reference's deterministic sources
  * (SURVEY §2.1 C7/C8). The reference implements custom Flink
  * `SourceFunction`s; on Spark the test-time equivalents are
  * `MemoryStream` scripts (micro-batch = gap boundary) and computed
  * event-time columns — no custom source machinery needed.
  */
object SourceKit {

  /** Scripted stream: elements interleaved with wall-clock gaps — the
    * builder surface of `ElementsWithGapsSource.addElem(e).addGap(t)`
    * (`/root/reference/.../source/ElementsWithGapsSource.java:52-60`).
    *
    * `play` drives a MemoryStream + running query: elements accumulate
    * into the current micro-batch; each gap flushes the batch
    * (`processAllAvailable`) and then advances wall-clock time by
    * sleeping, which is what arms processing-time TTL timeouts.
    *
    * Checkpoint fidelity note: the reference's source checkpoints its
    * REMAINING SCRIPT and resumes playback mid-script after a restart
    * (ElementsWithGapsSource.java:165-172, the snapshotState/
    * restoreState pair). This replay rides MemoryStream, which is not
    * recoverable across a restart — a test that kills the query
    * mid-script must replay from the top. OPERATOR state recovery (the
    * thing the source feeds) is covered by CheckpointRecoverySpec via
    * foreachBatch + checkpointLocation; a restart-recoverable scripted
    * source would need a file-backed source with offset tracking,
    * machinery the test surface doesn't warrant. */
  final case class Script[T](steps: Vector[Either[T, FiniteDuration]]) {
    def addElem(e: T): Script[T] = copy(steps :+ Left(e))
    def addGap(d: FiniteDuration): Script[T] = copy(steps :+ Right(d))

    /** All scripted elements in order (the batch-surface view). */
    def elements: Vector[T] = steps.collect { case Left(e) => e }

    def play(stream: MemoryStream[T], query: StreamingQuery): Unit = {
      steps.foreach {
        case Left(e) =>
          stream.addData(e)
        case Right(gap) =>
          query.processAllAvailable()
          Thread.sleep(gap.toMillis)
      }
      query.processAllAvailable()
    }

    /** Gap-driver for queries with ProcessingTimeTimeout state: with such
      * timeouts registered the engine always has "another batch" to run, so
      * `processAllAvailable` never observes quiescence and would block
      * forever. Instead, wait until the sink has absorbed every element
      * sent so far (rowsPerElem output rows per input element), then sleep
      * the gap. */
    def playByCount(
        stream: MemoryStream[T],
        spark: SparkSession,
        sinkTable: String,
        rowsPerElem: Int = 1,
        timeoutMs: Long = 60000): Unit = {
      var sent = 0
      // surface a dead query's real exception instead of burying it
      // under a misleading "sink stuck" timeout
      def failIfQueryDead(): Unit =
        spark.streams.active.foreach { q =>
          q.exception.foreach(e => throw new IllegalStateException(
            s"streaming query ${q.name} failed while script waited", e))
        }
      def waitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis + timeoutMs
        var rows = spark.table(sinkTable).count()
        while (rows < n && System.currentTimeMillis < deadline) {
          failIfQueryDead()
          Thread.sleep(50)
          rows = spark.table(sinkTable).count()
        }
        failIfQueryDead()
        require(rows >= n, s"sink $sinkTable stuck below $n rows (got $rows)")
      }
      steps.foreach {
        case Left(e) =>
          stream.addData(e); sent += 1
        case Right(gap) =>
          waitRows(sent.toLong * rowsPerElem)
          Thread.sleep(gap.toMillis)
      }
      waitRows(sent.toLong * rowsPerElem)
    }
  }

  object Script {
    def empty[T]: Script[T] = Script(Vector.empty)
  }

  /** Event-time scripted elements: each element carries a relative delay
    * from a fixed start, yielding a deterministic TimestampType column —
    * the `EventTimeDelayedElementsSource` surface
    * (`/root/reference/.../source/EventTimeDelayedElementsSource.java:50-206`,
    * which likewise assigns `start + delay` without real emission delay).
    */
  object EventTimeElements {

    /** `(value, delay)` — mirror of the reference's `Elem<T>`
      * (EventTimeDelayedElementsSource.java:54-66). */
    final case class Elem[T](value: T, delay: FiniteDuration)

    /** Batch DataFrame of (value, ts) with ts = startMicros + delay. */
    def toDataset[T](
        spark: SparkSession,
        startMicros: Long,
        elems: Seq[Elem[T]])(
        implicit enc: Encoder[(T, Long)]): DataFrame = {
      val rows = elems.map(e => (e.value, startMicros + e.delay.toMicros))
      spark.createDataset(rows)
        .withColumnRenamed("_1", "value")
        .withColumn("ts", timestamp_micros(col("_2")))
        .drop("_2")
    }

    /** Delays 0, gap, 2·gap, … — mirror of `withEqualGaps`
      * (EventTimeDelayedElementsSource.java:106-142). */
    def withEqualGaps[T](gap: FiniteDuration, values: Seq[T]): Seq[Elem[T]] =
      values.zipWithIndex.map { case (v, i) => Elem(v, gap * i.toLong) }
  }

  /** Sink kit (C10/C11): the reference's assertion sink is replaced by the
    * memory sink + a collect, and `printWithName` by a labeled
    * foreachBatch console dump. */
  object Sinks {

    /** Start `ds` into the memory sink under `name`; read results with
      * `spark.table(name)`. An optional trigger interval paces the engine —
      * required for ProcessingTimeTimeout queries, which otherwise run
      * batches back-to-back (the trigger interval is the Spark counterpart
      * of the reference's `ttlRefreshInterval` tombstone re-arm period). */
    def toMemory[T](
        ds: Dataset[T],
        name: String,
        outputMode: String = "append",
        triggerInterval: Option[String] = None): StreamingQuery = {
      val w = ds.writeStream.format("memory").queryName(name).outputMode(outputMode)
      triggerInterval.fold(w)(i => w.trigger(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(i))).start()
    }

    /** Collected rows of a memory-sink table (the
      * `DataStreamUtils.collect` replacement, SURVEY B5). */
    def collected[T](spark: SparkSession, name: String)(implicit enc: Encoder[T]): Seq[T] =
      spark.table(name).as[T].collect().toSeq

    /** Labeled debug print — `StreamingUtils.printWithName`
      * (`/root/reference/.../StreamingUtils.java:8-15`). */
    def namedPrint[T](ds: Dataset[T], name: String): StreamingQuery =
      ds.writeStream.outputMode("append").foreachBatch {
        (batch: Dataset[T], id: Long) =>
          println(s"$name (batch $id):")
          batch.show(truncate = false)
      }.start()
  }
}
