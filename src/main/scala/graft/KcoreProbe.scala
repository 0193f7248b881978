package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Measures the CONVERGENCE round of the q70 k-core peel on a gate
  * corpus: per-round edge counts, the first stable round (edge count
  * unchanged from the previous round), and the min in-core degree at
  * that point. Evidence for pinning `KcoreRounds` ≥ convergence — the
  * fixed-round gate then provably computes the k-core, not a truncated
  * peel (VERDICT r13 item 1; measured numbers recorded in SCALE.md).
  *
  * Usage: runMain graft.KcoreProbe <sfDir> [maxRounds]
  */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxRounds = if (args.length > 1) args(1).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // kcoreEdges(i) replays rounds 1..i from scratch — O(maxRounds²)
    // total rounds, fine for a diagnostic at these SFs
    val counts = (0 to maxRounds).map(i =>
      Relational.kcoreEdges(spark, sfDir, i).count())
    val stable = (1 to maxRounds).find(i => counts(i) == counts(i - 1))
    val minDeg = stable.map { i =>
      val edges = Relational.kcoreEdges(spark, sfDir, i)
      edges.select(col("pa").as("v"))
        .unionAll(edges.select(col("pb").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .agg(min(col("d"))).head().getLong(0)
    }
    println(s"KCORE_PROBE sf_dir=$sfDir k=${Relational.KcoreK} " +
      s"counts=${counts.mkString(",")} " +
      s"converged_at=${stable.getOrElse(-1)} " +
      s"min_core_degree=${minDeg.getOrElse(-1L)}")
    spark.stop()
  }
}
