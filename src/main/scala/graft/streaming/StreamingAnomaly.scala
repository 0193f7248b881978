package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming ANOMALY MONITOR — the ingest-side form of the batch
  * median/MAD profile (`Relational.q59AnomalyMad`): thresholds are
  * TRAINED OFFLINE on the batch profile (median and MAD per event
  * type, in cents) and shipped to the stream as a broadcast map
  * literal; every arriving metric is a STATELESS codegen'd probe —
  * `|cents − median| > 3·MAD` — emitting one breach row per outlier.
  * This is the robust-statistics alerting rule monitoring pipelines
  * prefer over mean/stddev (one spike cannot drag the threshold), in
  * the same trained-artifact-vs-stream shape as
  * [[StreamingDecontamination]]'s Bloom probe.
  *
  * Contracts:
  *  - breach decisions on a replayed feed equal the batch rule row for
  *    row — per-type breach counts equal q59's `n_outliers` exactly
  *    (spec-pinned);
  *  - metrics of types absent from the trained profile emit nothing
  *    (an untrained stream is a training gap, not an alert storm);
  *  - no state store at all — the monitor scales with executor count,
  *    not key cardinality; thresholds are O(#event_types). */
object StreamingAnomaly {

  case class Metric(event_id: Long, event_type: String, cents: Long)

  /** `adev_cents` may carry an exact .5 (continuous-percentile medians
    * of integers interpolate at half-cents). */
  case class Breach(event_id: Long, event_type: String, adev_cents: Double)

  /** Breach stream for a metric stream against trained
    * (median_cents, mad_cents) thresholds per event type. */
  def breaches(
      metrics: Dataset[Metric],
      thresholds: Map[String, (Double, Double)]): Dataset[Breach] = {
    val spark = metrics.sparkSession
    import spark.implicits._
    val medMap = typedlit(thresholds.map { case (k, v) => k -> v._1 })
    val madMap = typedlit(thresholds.map { case (k, v) => k -> v._2 })
    metrics.toDF()
      .withColumn("med", element_at(medMap, col("event_type")))
      .withColumn("mad", element_at(madMap, col("event_type")))
      .filter(col("med").isNotNull &&
        abs(col("cents").cast("double") - col("med")) > col("mad") * 3.0)
      .select(col("event_id"), col("event_type"),
        abs(col("cents").cast("double") - col("med")).as("adev_cents"))
      .as[Breach]
  }

  /** Offline trainer: the q59 batch profile folded back to cents.
    * True medians/MADs of integer cents are integers or EXACT halves
    * (continuous-percentile midpoints), but the gate reports 6-decimal
    * DOLLARS whose /100 is not binary-exact — so the reconstruction
    * snaps to the half-cent grid (`rint(x·200)/2`), recovering the
    * exact threshold and keeping the strict `>` comparison identical
    * to the batch rule at borderline values. */
  def trainThresholds(
      s: org.apache.spark.sql.SparkSession,
      dir: String): Map[String, (Double, Double)] = {
    def halfCents(dollars: Double): Double = Math.rint(dollars * 200.0) / 2.0
    graft.operators.Relational.q59AnomalyMad(s, dir).collect()
      .map(r => r.getString(0) ->
        ((halfCents(r.getDouble(3)), halfCents(r.getDouble(4)))))
      .toMap
  }
}
