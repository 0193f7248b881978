package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): runs ONE registered query (or a named
  * streaming bench line) under a SparkListener and prints a per-job wall
  * time table — the attribution step of guide §1 ("decide whether the time
  * is going to shuffle read/write, compute, or scheduling") without a live
  * UI. Each sample is repeated `reps` times (default 2) so one-time costs
  * (codegen/classloading, localCheckpoint builds behind session memos) are
  * separable from steady-state cost.
  *
  *   sbt "runMain graft.JobProbe <name> [reps]"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProbe <query> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment confs: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_EXTRA_CONF token without '=': '$kv' (want k=v;k=v)")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, desc: String, start: Long, var end: Long = -1L,
        var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
        var shuffleReadMb: Double = 0, var shuffleWriteMb: Double = 0)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    // stage → owning job, registered at job start (ADVICE r19: AQE
    // stage-materialization jobs overlap even in a sequential probe, so
    // "most recently started job" mis-attributed stage metrics)
    val stageOwner = new scala.collection.mutable.HashMap[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short"))).getOrElse("")
        jobs(e.jobId) = Job(e.jobId, desc, e.time)
        e.stageInfos.foreach(si => stageOwner(si.stageId) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageOwner.get(si.stageId).flatMap(jobs.get)
            .orElse(jobs.values.lastOption).foreach { j =>
              j.stages += 1
              j.tasks += si.numTasks
              j.taskMs += si.taskMetrics.executorRunTime
              j.shuffleReadMb += si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
              j.shuffleWriteMb += si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
            }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val batch = SparkEntry.queries.get(name)
    // streaming bench lines resolve through StreamingBench's public
    // pipeline methods (streaming_ttl_pipeline -> ttlPipeline, etc.)
    val streamMethod: Option[java.lang.reflect.Method] =
      if (batch.isDefined) None
      else {
        val camel = {
          val base = name.stripPrefix("streaming_").stripSuffix("_pipeline")
          val parts = base.split("_")
          parts.head + parts.tail.map(_.capitalize).mkString
        }
        StreamingBench.getClass.getMethods
          .find(m => m.getName == s"${camel}Pipeline" &&
            m.getParameterCount == 2)
      }
    if (batch.isEmpty && streamMethod.isEmpty)
      sys.error(s"unknown query $name")
    if (streamMethod.isDefined) StreamingBench.prepare(spark, sfDir, _ == name)
    def runOnce(): Unit = batch match {
      case Some(fn) =>
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      case None =>
        streamMethod.get.invoke(StreamingBench, spark, sfDir)
    }

    (1 to reps).foreach { rep =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      runOnce()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"%n=== $name rep $rep: wall $wall%.3f s, ${jobs.size} jobs ===")
      println(f"${"job"}%4s ${"wall_ms"}%8s ${"stg"}%3s ${"tasks"}%5s " +
        f"${"taskMs"}%7s ${"shRdMB"}%7s ${"shWrMB"}%7s  desc")
      jobs.synchronized(jobs.values.toSeq).foreach { j =>
        val w = if (j.end > 0) j.end - j.start else -1L
        println(f"${j.id}%4d ${w}%8d ${j.stages}%3d ${j.tasks}%5d " +
          f"${j.taskMs}%7d ${j.shuffleReadMb}%7.1f ${j.shuffleWriteMb}%7.1f  " +
          j.desc.take(60))
      }
      val totalJobMs = jobs.synchronized(
        jobs.values.map(j => if (j.end > 0) j.end - j.start else 0L).sum)
      println(f"[probe] rep $rep: wall $wall%.3f s, job wall sum ${totalJobMs / 1000.0}%.3f s, " +
        f"gap ${(wall - totalJobMs / 1000.0)}%.3f s (driver/planning)")
    }
    spark.stop()
  }
}
