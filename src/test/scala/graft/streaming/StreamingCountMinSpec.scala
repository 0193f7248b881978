package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Profiling
import graft.functions.sketch.CountMin

/** Streaming CMS == batch `cmsCounters`/`cmsEstimates` parity at the
  * same geometry, plus the family's two-stage idle eviction contract.
  */
class StreamingCountMinSpec extends SparkTestBase {

  test("JVM sketch equals the relational counter table cell semantics") {
    val s = spark
    import s.implicits._
    val wBits = 5
    val toks = (0 until 4000).map(i => s"word_${i % 230}")
    val sketch = CountMin(wBits, 4)
    toks.foreach(sketch.add)
    val probes = toks.distinct.take(40)
    val relational = Profiling.cmsEstimates(
        Profiling.cmsCounters(toks.toDF("tok"), "tok", wBits = wBits, d = 4),
        probes.toDF("tok"), "tok", wBits = wBits, d = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_est")).toMap
    probes.foreach { p =>
      assert(sketch.estimate(p) === relational(p), s"estimate diverges for '$p'")
    }
  }

  test("final streaming snapshots equal batch estimates per group") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val groups = 4
    val tokens = (0 until 6000).map(i => s"term_${i % 300}")
    val probes = (0 until 10).map(i => s"term_${i * 29}") :+ "never_seen"
    val stream = MemoryStream[String]
    val out = StreamingCountMin.pointFrequencies(stream.toDS(), groups, probes)
    val query = SourceKit.Sinks.toMemory(out.toDF(), "cms_snap")
    try {
      val (b1, b2) = tokens.splitAt(tokens.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
      val snaps = spark.table("cms_snap").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
      // every batch emits the full probe list per active group
      assert(snaps.length === 2 * groups * probes.size)
      val latest = snaps.groupBy(t => (t._1, t._3))
        .map { case (k, ss) => k -> ss.maxBy(_._2)._4 }
      // batch replay at the same geometry, per group
      (0 until groups).foreach { g =>
        val mine = tokens.filter(t => math.floorMod(t.hashCode, groups) == g)
        val sketch = CountMin(CountMin.StreamWBits, CountMin.GateD)
        mine.foreach(sketch.add)
        probes.foreach { p =>
          assert(latest((g, p)) === sketch.estimate(p),
            s"group $g probe '$p' diverges from batch replay")
          val exact = mine.count(_ == p).toLong
          assert(latest((g, p)) >= exact, "CMS must never undercount")
        }
      }
    } finally query.stop()
  }

  test("idle eviction: payload tombstoned after one idle period, key removed after two") {
    import scala.concurrent.duration._
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeout = Some(500.millis)
    val probes = Seq("x")
    def mkState(st: Option[(Long, Array[Long])], timedOut: Boolean) =
      TestGroupState.create[(Long, Array[Long])](
        st.map(Optional.of[(Long, Array[Long])]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long], timedOut)
    def update = StreamingCountMin.cmUpdate(5, 4, probes, timeout) _

    val sketch = CountMin(5, 4)
    (0 until 50).foreach(i => sketch.add(s"t_$i"))
    val live = mkState(Some((3L, sketch.serialized)), timedOut = true)
    assert(update(0, Iterator.empty, live).isEmpty)
    assert(live.isUpdated && !live.isRemoved)
    assert(live.get._1 === 3L && live.get._2.isEmpty,
      "expected version-preserving empty tombstone")
    assert(live.getTimeoutTimestampMs.get() === 1500L,
      "tombstone timer not re-armed")

    val tomb = mkState(Some((3L, Array.emptyLongArray)), timedOut = true)
    assert(update(0, Iterator.empty, tomb).isEmpty)
    assert(tomb.isRemoved, "tombstoned key not collected on its second idle period")

    // a group returning mid-tombstone continues its version chain with
    // a fresh sketch
    val back = mkState(Some((3L, Array.emptyLongArray)), timedOut = false)
    val snapBack = update(0, Iterator("x", "x", "y"), back).toSeq
    assert(snapBack.map(_.batch) === Seq(4L))
    assert(snapBack.head.n_est === 2L, "tombstone payload should restart empty")

    val fresh = mkState(None, timedOut = false)
    assert(update(0, Iterator("x"), fresh).toSeq.map(_.batch) === Seq(1L))
    assert(fresh.getTimeoutTimestampMs.get() === 1500L, "live group timer not armed")
  }
}
