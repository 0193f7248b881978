package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{Portable, Profiling}
import graft.functions.sketch.Hll

/** Streaming NDV == batch `hllSummary` register parity, and the JVM-side
  * h52 hash == the relational md5 formulation it claims to equal.
  */
class StreamingNdvSpec extends SparkTestBase {

  test("h52 equals the relational md5 h32/h32b construction") {
    val s = spark
    import s.implicits._
    val toks = (0 until 200).map(i => s"tok_$i x")
    val relational = toks.toDF("tok")
      .select(col("tok"),
        (Portable.h32(col("tok")) * lit(1L << 20)
          + pmod(Portable.h32b(col("tok")), lit(1L << 20))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach { t =>
      assert(Hll.h52(t) == relational(t), s"h52 mismatch for '$t'")
    }
  }

  test("final streaming snapshot equals batch hllSummary registers per group") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val groups = 4
    val tokens = (0 until 6000).map(i => s"word_${i % 1700}")
    val stream = MemoryStream[String]
    val out = StreamingNdv.ndv(stream.toDS(), groups)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "ndv_snap")
    try {
      val (b1, b2) = tokens.splitAt(tokens.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val snaps = spark.table("ndv_snap")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // latest snapshot per group
      val latest = snaps.groupBy(_._1).map { case (g, ss) => g -> ss.maxBy(_._2) }
      val batch = Profiling.hllSummary(
          tokens.map(t => (math.floorMod(t.hashCode, groups), t)).toDF("g", "tok"),
          "g", "tok")
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(latest.keySet == batch.keySet)
      latest.foreach { case (g, (_, _, hit, sumR, z)) =>
        assert((hit, sumR, z) == batch(g), s"group $g registers diverge")
      }
    } finally query.stop()
  }

  test("estimate tracks cumulative distinct count across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingNdv.ndv(stream.toDS(), groups = 1)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "ndv_grow")
    try {
      stream.addData((0 until 3000).map(i => s"a_$i")); query.processAllAvailable()
      stream.addData((0 until 3000).map(i => s"b_$i")); query.processAllAvailable()
      val byBatch = spark.table("ndv_grow").collect()
        .map(r => r.getLong(1) -> r.getDouble(5)).toMap
      assert(math.abs(byBatch(1L) - 3000) / 3000.0 < 0.1, s"batch1 ${byBatch(1L)}")
      assert(math.abs(byBatch(2L) - 6000) / 6000.0 < 0.1, s"batch2 ${byBatch(2L)}")
    } finally query.stop()
  }

  test("idle eviction: payload tombstoned after one idle period, key removed after two") {
    // deterministic timeout drive via TestGroupState — a wall-clock
    // 500 ms ProcessingTimeTimeout through MemoryStream schedules
    // continuous no-data micro-batches and starves processAllAvailable
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    def mkState(s: Option[(Long, Array[Byte])], timedOut: Boolean) =
      TestGroupState.create[(Long, Array[Byte])](
        s.map(Optional.of[(Long, Array[Byte])]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)

    // stage 1: a live sketch times out -> payload dropped to a version
    // tombstone, key retained, timer RE-ARMED (the round-5 bug left the
    // tombstone timerless, accumulating for the life of the query)
    val sketch = new Hll()
    (0 until 50).foreach(i => sketch.add(s"t_$i"))
    val live = mkState(Some((3L, sketch.serialized)), timedOut = true)
    assert(StreamingNdv.ndvUpdate(timeout)(0, Iterator.empty, live).isEmpty)
    assert(live.isUpdated && !live.isRemoved)
    assert(live.get._1 == 3L && live.get._2.isEmpty,
      s"expected version-preserving empty tombstone, got ${live.get}")
    assert(live.getTimeoutTimestampMs.get() == 1500L,
      "tombstone timer not re-armed — tombstones would accumulate forever")

    // stage 2: the tombstone itself times out -> key removed outright
    val tomb = mkState(Some((3L, Array.emptyByteArray)), timedOut = true)
    assert(StreamingNdv.ndvUpdate(timeout)(0, Iterator.empty, tomb).isEmpty)
    assert(tomb.isRemoved, "tombstoned key not collected on its second idle period")

    // a group returning mid-tombstone continues its version chain
    val back = mkState(Some((3L, Array.emptyByteArray)), timedOut = false)
    val snapBack = StreamingNdv.ndvUpdate(timeout)(0, Iterator("x", "y"), back).toSeq
    assert(snapBack.map(_.batch) == Seq(4L), s"version chain broken: $snapBack")
    assert(math.abs(snapBack.head.estimate - 2.0) < 0.5,
      "tombstone payload should restart the sketch empty")

    // a group returning after full removal restarts at version 1
    val fresh = mkState(None, timedOut = false)
    val snapFresh = StreamingNdv.ndvUpdate(timeout)(0, Iterator("x"), fresh).toSeq
    assert(snapFresh.map(_.batch) == Seq(1L))
    assert(fresh.getTimeoutTimestampMs.get() == 1500L, "live group timer not armed")
  }
}
