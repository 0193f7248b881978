package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** Fault tolerance of operator state (SURVEY B23): the reference
  * hand-rolls `Checkpointed` snapshot/restore of pending tombstones
  * (`MapWithState.java:376-392`); in Structured Streaming the StateStore is
  * checkpointed per micro-batch — stop a stateful query and restart it from
  * `checkpointLocation`, and per-key state must survive.
  *
  * The sink is foreachBatch (the memory sink is not checkpoint-recoverable).
  */
class CheckpointRecoverySpec extends SparkTestBase {

  test("running-reduce state survives query stop/restart via checkpointLocation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val stream = MemoryStream[KV]
    def plan = RunningReduce.keyed(stream.toDS(), zero = 0)(_.k, _.v.toLong)(
      (acc, in) => acc + in.v)

    def start() = plan.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[(String, Int)], _: Long) =>
        val rows = batch.collect()
        CheckpointRecoverySpec.results.synchronized {
          CheckpointRecoverySpec.results ++= rows
        }
        ()
      }.start()

    val q1 = start()
    try {
      stream.addData(KV("a", 1), KV("a", 2))
      q1.processAllAvailable()
      val got1 = CheckpointRecoverySpec.results.synchronized {
        CheckpointRecoverySpec.results.toList
      }
      assert(got1.map(_._2).sorted == Seq(1, 3), s"pre-restart trace: $got1")
    } finally q1.stop()

    // restart: same checkpoint — accumulated per-key state must be restored
    val q2 = start()
    try {
      stream.addData(KV("a", 5))
      q2.processAllAvailable()
      val got2 = CheckpointRecoverySpec.results.synchronized {
        CheckpointRecoverySpec.results.toList
      }
      assert(got2.contains(("a", 8)),
        s"state lost across restart: expected (a,8) continuing 1+2+5, got $got2")
    } finally q2.stop()
  }

  test("StreamingTopK sketch state survives stop/restart via checkpointLocation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft_ckpt_topk").toString
    val stream = MemoryStream[String]
    def plan = StreamingTopK.topK(stream.toDS(), groups = 1, capacity = 8, k = 8)

    def start() = plan.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[StreamingTopK.Snapshot], _: Long) =>
        val rows = batch.collect()
        CheckpointRecoverySpec.snapshots.synchronized {
          CheckpointRecoverySpec.snapshots ++= rows
        }
        ()
      }.start()

    val q1 = start()
    try {
      stream.addData("x", "x", "y")
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      stream.addData("x", "z")
      q2.processAllAvailable()
      val latest = CheckpointRecoverySpec.snapshots.synchronized {
        StreamingTopK.mergedLatest(CheckpointRecoverySpec.snapshots.toList, 8)
      }.map(t => t._1 -> t._3).toMap
      // x must be 3 (2 before restart + 1 after): the sketch bytes were
      // restored from the StateStore, not restarted from empty. The
      // version counter also resumes (monotonic across restart).
      assert(latest.get("x").contains(3L), s"sketch state lost across restart: $latest")
      assert(latest.get("y").contains(1L) && latest.get("z").contains(1L), latest.toString)
    } finally q2.stop()
  }
}

object CheckpointRecoverySpec {
  val results: mutable.ListBuffer[(String, Int)] = mutable.ListBuffer.empty
  val snapshots: mutable.ListBuffer[StreamingTopK.Snapshot] = mutable.ListBuffer.empty
}
