package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingAnomaly.Metric

/** Streaming anomaly monitor: replayed breach counts equal batch q59's
  * n_outliers per event type, untrained types emit nothing, and every
  * breach carries the exact batch deviation.
  */
class StreamingAnomalySpec extends SparkTestBase {

  test("replayed breach counts per type == batch q59 n_outliers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thresholds = StreamingAnomaly.trainThresholds(spark, sf0001)
    val feed = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Metric].collect().sortBy(_.event_id)
    val stream = MemoryStream[Metric]
    val out = StreamingAnomaly.breaches(stream.toDS(), thresholds)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "anomaly_out")
    try {
      val (b1, b2) = feed.toIndexedSeq.splitAt(feed.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("anomaly_out")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
      val batch = Relational.q59AnomalyMad(spark, sf0001).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(batch.nonEmpty && batch.values.sum > 0L,
        "corpus produced no outliers — the parity check would be vacuous")
      batch.foreach { case (t, n) =>
        assert(streamed(t) == n, s"$t: streamed ${streamed(t)} vs batch $n")
      }
      assert(spark.table("anomaly_out").count() == batch.values.sum)
    } finally q.stop()
  }

  test("untrained types emit nothing; deviations match the batch rule") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thresholds = Map("known" -> ((1000.0, 100.0))) // med 10.00, mad 1.00
    val feed = Seq(
      Metric(1L, "known", 1000L),   // adev 0 — fine
      Metric(2L, "known", 1301L),   // adev 301 > 300 — breach
      Metric(3L, "known", 1300L),   // adev 300, NOT > 3·mad — fine
      Metric(4L, "mystery", 999999L)) // untrained — ignored
    val stream = MemoryStream[Metric]
    val out = StreamingAnomaly.breaches(stream.toDS(), thresholds)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "anomaly_unit_out")
    try {
      stream.addData(feed.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("anomaly_unit_out").collect()
        .map(r => (r.getLong(0), r.getDouble(2)))
      assert(got.toSeq == Seq((2L, 301.0)), s"got ${got.toSeq}")
    } finally q.stop()
  }
}
