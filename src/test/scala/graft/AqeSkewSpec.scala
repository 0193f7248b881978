package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the AUTOMATIC complement of q33's manual
  * salting (SkewJoin.saltedInner): when one join key dominates a
  * shuffle partition, AQE's OptimizeSkewedJoin splits the oversized
  * partition and replicates the matching side, so the hot key no
  * longer serializes on one task. Manual salting remains for the cases
  * AQE can't see (broadcast-ineligible skew inside a single stage,
  * pre-AQE engines); this spec pins that the automatic path engages on
  * this build so the library's skew story is both belts.
  */
class AqeSkewSpec extends SparkTestBase {

  test("AQE splits the hot-key partition of a skewed sort-merge join") {
    val s = spark
    import s.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the hot partition is ~MBs, not the
      // production 256 MB default
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // key 0 carries 120k rows; 31 cold keys carry 200 each
      val probe = ((0 until 120000).map(i => (0L, i.toLong)) ++
        (1L to 31L).flatMap(k => (0 until 200).map(i => (k, i.toLong))))
        .toDF("k", "v")
      val dim = (0L to 31L).map(k => (k, s"dim$k")).toDF("rk", "name")
      val joined = probe.join(dim, col("k") === col("rk"))

      // collect() on THIS df so its own AQE plan finalizes (count()
      // would spin up a separate query execution)
      val n = joined.collect().length
      assert(n == 120000 + 31 * 200, s"join lost rows: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not engage skew handling:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
