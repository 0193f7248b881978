package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r20): does a CollectMetrics observation attached below an
  * EAGER localCheckpoint report its metrics from the checkpoint's own
  * materialization action? If yes, every per-round driver probe in the
  * iterative graph family (convergence counts, BFS stats, dangling mass)
  * can ride the round's existing checkpoint job instead of being its own
  * job + planning pass. Run: sbt "runMain graft.ObsProbe"
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val df = (1L to 1000L).toDF("v")
    val obs = Observation("probe")
    val cp = df
      .filter(col("v") % 2 === 0)
      .observe(obs, count(lit(1)).as("n"), sum(col("v")).as("s"))
      .localCheckpoint()
    // if observe did NOT fire on the checkpoint action, .get blocks forever
    // — bound the wait so the probe fails loudly instead of hanging
    val got = scala.concurrent.Await.result(
      scala.concurrent.Future(obs.get)(
        scala.concurrent.ExecutionContext.global),
      scala.concurrent.duration.Duration(20, "s"))
    println(s"OBS RESULT: $got (expected n=500, s=250500)")
    println(s"CHECKPOINTED COUNT: ${cp.count()}")
    spark.stop()
  }
}
