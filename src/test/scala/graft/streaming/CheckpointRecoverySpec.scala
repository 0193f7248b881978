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

  test("StreamingNdv register state survives stop/restart via checkpointLocation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft_ckpt_ndv").toString
    val stream = MemoryStream[String]
    def plan = StreamingNdv.ndv(stream.toDS(), groups = 1)

    def start() = plan.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[StreamingNdv.NdvSnapshot], _: Long) =>
        val rows = batch.collect()
        CheckpointRecoverySpec.ndvSnaps.synchronized {
          CheckpointRecoverySpec.ndvSnaps ++= rows
        }
        ()
      }.start()

    val tokensA = (0 until 2000).map(i => s"a_$i")
    val tokensB = (0 until 2000).map(i => s"b_$i")
    val q1 = start()
    try {
      stream.addData(tokensA)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      stream.addData(tokensB)
      q2.processAllAvailable()
      val latest = CheckpointRecoverySpec.ndvSnaps.synchronized {
        CheckpointRecoverySpec.ndvSnaps.maxBy(_.batch)
      }
      // register parity with the batch aggregate over BOTH halves: the
      // serialized registers were restored from the StateStore — a
      // restart-from-empty sketch would only cover tokensB
      val batch = graft.functions.Profiling.hllSummary(
          (tokensA ++ tokensB).map(t => (0, t)).toDF("g", "tok"), "g", "tok")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
      assert(latest.batch == 2L, s"version did not resume across restart: $latest")
      assert((latest.n_buckets_hit, latest.sum_rank, latest.z_scaled) == batch,
        s"registers diverge from the cumulative batch aggregate: $latest vs $batch")
    } finally q2.stop()
  }

  test("StreamingNearDup bucket index survives stop/restart via checkpointLocation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft_ckpt_neardup").toString
    val stream = MemoryStream[(Long, String)]
    def plan = StreamingNearDup.candidates(stream.toDS())

    def start() = plan.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[StreamingNearDup.CandidatePair], _: Long) =>
        val rows = batch.collect()
        CheckpointRecoverySpec.pairSnaps.synchronized {
          CheckpointRecoverySpec.pairSnaps ++= rows
        }
        ()
      }.start()

    val text = "alpha beta gamma delta epsilon zeta"
    val q1 = start()
    try {
      stream.addData(Seq(1L -> text, 2L -> text))
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      stream.addData(Seq(3L -> text))
      q2.processAllAvailable()
      val pairs = CheckpointRecoverySpec.pairSnaps.synchronized {
        CheckpointRecoverySpec.pairSnaps.map(p => (p.doc_a, p.doc_b)).distinct.toSet
      }
      // (1,3) and (2,3) require the pre-restart signatures: the bucket
      // index was restored from the StateStore, not rebuilt from empty
      assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(pairs),
        s"bucket index lost across restart: $pairs")
    } finally q2.stop()
  }
  test("RocksDB CHANGELOG checkpointing: state survives a mid-stream restart") {
    // the 100-TB recovery posture: per-batch commits upload the delta
    // changelog (commit latency stops scaling with state size); restore
    // must replay changelogs on top of the last async snapshot — this
    // pins the restore path specifically under
    // changelogCheckpointing.enabled, which the full-snapshot tests
    // above never exercise
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ckpt = Files.createTempDirectory("graft_ckpt_changelog").toString
      val stream = MemoryStream[KV]
      def plan = RunningReduce.keyed(stream.toDS(), zero = 0)(_.k, _.v.toLong)(
        (acc, in) => acc + in.v)
      def start() = plan.writeStream
        .outputMode("append").option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[(String, Int)], _: Long) =>
          val rows = batch.collect()
          CheckpointRecoverySpec.clResults.synchronized {
            CheckpointRecoverySpec.clResults ++= rows
          }
          ()
        }.start()

      val q1 = start()
      try {
        // TWO batches before the restart so at least one commit is a
        // pure changelog on top of a prior version
        stream.addData(KV("a", 1), KV("b", 10))
        q1.processAllAvailable()
        stream.addData(KV("a", 2))
        q1.processAllAvailable()
      } finally q1.stop()

      val q2 = start()
      try {
        stream.addData(KV("a", 5), KV("b", 20))
        q2.processAllAvailable()
        val got = CheckpointRecoverySpec.clResults.synchronized {
          CheckpointRecoverySpec.clResults.toList
        }
        assert(got.contains(("a", 8)) && got.contains(("b", 30)),
          s"state lost across changelog restart: expected (a,8)/(b,30), got $got")
      } finally q2.stop()
    } finally prev.foreach {
      case (k, Some(p)) => spark.conf.set(k, p)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("StreamingUpsert CDC view state survives stop/restart via checkpointLocation") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft_ckpt_upsert").toString
    val stream = MemoryStream[StreamingUpsert.Change]
    def plan = StreamingUpsert(stream.toDS())

    def start() = plan.writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[StreamingUpsert.Upserted], _: Long) =>
        val rows = batch.collect()
        CheckpointRecoverySpec.upserts.synchronized {
          CheckpointRecoverySpec.upserts ++= rows
        }
        ()
      }.start()

    val q1 = start()
    try {
      stream.addData(
        StreamingUpsert.Change(7L, 70L, "O", 10.0, "load"),
        StreamingUpsert.Change(8L, 80L, "O", 20.0, "load"))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart: versions must CONTINUE from restored state (an upsert on a
    // restored key is v2, and a delete retires the restored row as a v2
    // tombstone carrying its payload; a fresh view would restart at v1
    // and a tombstone would carry the change's payload instead)
    val q2 = start()
    try {
      stream.addData(
        StreamingUpsert.Change(7L, 70L, "F", 11.0, "upsert"),
        StreamingUpsert.Change(8L, 80L, "F", 20.0, "delete"))
      q2.processAllAvailable()
      val byKey = CheckpointRecoverySpec.upserts.synchronized {
        CheckpointRecoverySpec.upserts.toList
      }.groupBy(_.key).view.mapValues(_.maxBy(_.version)).toMap
      assert(byKey(7L).version == 2L && byKey(7L).status == "F" && byKey(7L).live,
        s"key 7 state lost across restart: ${byKey.get(7L)}")
      assert(byKey(8L).version == 2L && !byKey(8L).live,
        s"key 8 tombstone lost restored payload: ${byKey.get(8L)}")
      // the delete tombstone retains the RESTORED payload for audit —
      // status "O"/price 20.0 exist only in pre-restart state
      assert(byKey(8L).status == "O" && byKey(8L).price == 20.0)
    } finally q2.stop()
  }
}

object CheckpointRecoverySpec {
  val results: mutable.ListBuffer[(String, Int)] = mutable.ListBuffer.empty
  val clResults: mutable.ListBuffer[(String, Int)] = mutable.ListBuffer.empty
  val upserts: mutable.ListBuffer[StreamingUpsert.Upserted] = mutable.ListBuffer.empty
  val snapshots: mutable.ListBuffer[StreamingTopK.Snapshot] = mutable.ListBuffer.empty
  val ndvSnaps: mutable.ListBuffer[StreamingNdv.NdvSnapshot] = mutable.ListBuffer.empty
  val pairSnaps: mutable.ListBuffer[StreamingNearDup.CandidatePair] = mutable.ListBuffer.empty
}
