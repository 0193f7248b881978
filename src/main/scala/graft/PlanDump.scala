package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): dumps `.explain("formatted")` of named
  * queries to `plans/<tag>/<name>_<suffix>.txt` — the before/after plan
  * evidence the optimization judge checks claims against.
  *
  *   sbt "runMain graft.PlanDump <suffix> <name> [<name> ...]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1 — plans are dumped at the bench
  * SF so join-strategy/AQE decisions match the timed runs), SPARK_GRAFT_CPUS
  * (default 32), SPARK_GRAFT_PLAN_TAG (default r19).
  *
  * Like [[Plans]], the query is executed first (collect) so the captured
  * formatted plan is the AQE-finalized one; both the pre-execution
  * `explain("formatted")` and the executed plan string are written, since
  * the formatted form carries PushedFilters/ReadSchema detail while the
  * executed form carries final AQE decisions.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix: before|after> <query> [...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r19")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.collect()
      val executed = df.queryExecution.executedPlan.toString
      val out = s"== explain(formatted), pre-execution ==\n$formatted\n" +
        s"== executed plan (AQE final) ==\n$executed\n"
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), out)
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
