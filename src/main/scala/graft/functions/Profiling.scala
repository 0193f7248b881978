package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.expressions.QuantileSketchAgg

/** Data-profiling aggregates for the curation pipeline: distribution
  * statistics computed with bounded-state mergeable sketches rather
  * than per-group value buffers. The quantile sketch is the
  * order-statistics sibling of the SpaceSaving heavy-hitter sketch —
  * together they are the two profiling summaries a 100 TB corpus scan
  * ships back per column/group.
  */
object Profiling {

  /** Gate regime: capacity above the largest l_returnflag group at any
    * test SF, so the sketch never compacts and the nearest-rank outputs
    * are exact (the oracle is plain ranked SQL). The genuinely
    * compacting regime is pinned in QuantileSketchSpec. */
  val QuantileGateCapacity: Int = 1 << 19
  val GateFractions: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)

  /** Per-group nearest-rank quantiles of l_quantity via the mergeable
    * sketch aggregate: one shuffle of O(capacity) partials per group —
    * map-side combine, no per-group global sort (contrast q28's exact
    * interpolated path, which must sort the group). */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
      .groupBy("l_returnflag")
      .agg(QuantileSketchAgg(col("v"), QuantileGateCapacity, GateFractions).as("qs"))
      .select(col("l_returnflag"),
        element_at(col("qs"), 1).as("q25"),
        element_at(col("qs"), 2).as("q50"),
        element_at(col("qs"), 3).as("q75"),
        element_at(col("qs"), 4).as("q95"))
      .orderBy("l_returnflag")
}
