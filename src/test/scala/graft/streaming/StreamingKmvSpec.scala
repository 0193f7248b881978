package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.functions.Profiling
import graft.functions.sketch.Hll

/** Streaming KMV == batch k-min parity (the sketch is a pure function
  * of the item SET, so batching/order cannot move it), estimate growth
  * across batches, and the two-stage idle eviction.
  */
class StreamingKmvSpec extends SparkTestBase {

  test("final streaming snapshot equals the k smallest distinct h52 per group") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val groups = 4
    val tokens = (0 until 6000).map(i => s"word_${i % 1700}")
    val stream = MemoryStream[String]
    val out = StreamingKmv.kmv(stream.toDS(), groups)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "kmv_snap")
    try {
      val (b1, b2) = tokens.splitAt(tokens.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val snaps = spark.table("kmv_snap").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val latest = snaps.groupBy(_._1).map { case (g, ss) => g -> ss.maxBy(_._2) }
      // driver-side batch model: k smallest distinct h52 per group
      val batch = tokens.distinct
        .groupBy(t => math.floorMod(t.hashCode, groups))
        .map { case (g, ts) =>
          val mins = ts.map(Hll.h52).distinct.sorted.take(Profiling.KmvK)
          g -> (mins.length.toLong, mins.last)
        }
      assert(latest.keySet == batch.keySet)
      latest.foreach { case (g, (_, _, nVals, kth)) =>
        assert((nVals, kth) == batch(g), s"group $g k-mins diverge")
      }
    } finally query.stop()
  }

  test("estimate tracks cumulative distinct count across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val out = StreamingKmv.kmv(stream.toDS(), groups = 1)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "kmv_grow")
    try {
      stream.addData((0 until 3000).map(i => s"a_$i")); query.processAllAvailable()
      stream.addData((0 until 3000).map(i => s"b_$i")); query.processAllAvailable()
      val byBatch = spark.table("kmv_grow").collect()
        .map(r => r.getLong(1) -> r.getDouble(4)).toMap
      assert(math.abs(byBatch(1L) - 3000) / 3000.0 < 0.2, s"batch1 ${byBatch(1L)}")
      assert(math.abs(byBatch(2L) - 6000) / 6000.0 < 0.2, s"batch2 ${byBatch(2L)}")
    } finally query.stop()
  }

  test("idle eviction: payload tombstoned after one idle period, key removed after two") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    def mkState(s: Option[(Long, Array[Long])], timedOut: Boolean) =
      TestGroupState.create[(Long, Array[Long])](
        s.map(Optional.of[(Long, Array[Long])]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)

    // stage 1: idle with payload -> tombstone (version kept)
    val full = mkState(Some((3L, Array(5L, 9L))), timedOut = true)
    assert(StreamingKmv.kmvUpdate(4, timeout)(0, Iterator.empty, full).isEmpty)
    assert(!full.isRemoved && full.get._1 == 3L && full.get._2.isEmpty)

    // stage 2: idle tombstone -> removed
    val tomb = mkState(Some((3L, Array.emptyLongArray)), timedOut = true)
    assert(StreamingKmv.kmvUpdate(4, timeout)(0, Iterator.empty, tomb).isEmpty)
    assert(tomb.isRemoved)

    // a returning group continues its version chain from the tombstone
    val back = mkState(Some((3L, Array.emptyLongArray)), timedOut = false)
    val out = StreamingKmv.kmvUpdate(4, timeout)(0, Iterator("x"), back).toSeq
    assert(out.head.batch == 4L && back.get._1 == 4L)
  }

  test("cap: sketch never exceeds k and keeps the smallest values") {
    val hashes = Seq(50L, 10L, 30L, 20L, 40L, 5L, 10L).iterator
    val merged = StreamingKmv.merge(Array(15L, 25L), hashes, 4)
    assert(merged.toSeq == Seq(5L, 10L, 15L, 20L))
  }
}
