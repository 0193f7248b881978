package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational
import graft.streaming.StreamingTransitions.Ev

/** The live A/B monitor over the delta stream equals batch q81 bit for
  * bit once the feed is consumed — margins, per-arm ppm AND the integer
  * chi-square; the kernel emits exactly one delta per user event of
  * news and freezes converted users.
  */
class StreamingAbSpec extends SparkTestBase {

  test("cumulative delta stream == batch q81 (margins, ppm, chi-square) after the feed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Ev].collect()
      .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val stream = MemoryStream[Ev]
    val out = StreamingAb.deltas(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "ab_out")
    try {
      val (b1, b2) = rows.toIndexedSeq.splitAt(rows.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val d = spark.table("ab_out")
        .groupBy("arm")
        .agg(sum("d_users").as("u"), sum("d_conv").as("c"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        .withDefaultValue((0L, 0L))
      val (nA, convA) = d(0L)
      val (nB, convB) = d(1L)
      val batch = Relational.q81AbChisq(spark, sf0001).collect()(0)
      assert((nA, nB, convA, convB) ==
        (batch.getLong(0), batch.getLong(1), batch.getLong(2), batch.getLong(3)),
        s"margins: streamed ($nA,$nB,$convA,$convB) vs batch $batch")
      val (pa, pb, chisq) = StreamingAb.abChisqPpm(nA, nB, convA, convB)
      assert((pa, pb, chisq) ==
        (batch.getLong(4), batch.getLong(5), batch.getLong(6)),
        s"statistic: streamed ($pa,$pb,$chisq) vs batch $batch")
    } finally q.stop()
  }

  test("kernel: first sight, bar crossing, converted latch") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ev(id: Long, t: String) =
      Ev(5L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), id, t)
    def fresh() = TestGroupState.create[StreamingAb.AbState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val arm = StreamingAb.armOf(5L)
    // new user, below the bar: one (1, 0) delta
    val st = fresh()
    val out1 = StreamingAb.abUpdate(3L)(5L, Iterator(ev(1, "view"), ev(2, "purchase")), st).toSeq
    assert(out1 == Seq(StreamingAb.AbDelta(arm, 1L, 0L)))
    assert(st.get == StreamingAb.AbState(1L, converted = false))
    // known user, still below: no emission, purchases accumulate
    val out2 = StreamingAb.abUpdate(3L)(5L, Iterator(ev(3, "purchase")), st).toSeq
    assert(out2.isEmpty && st.get == StreamingAb.AbState(2L, converted = false))
    // crossing the bar: one (0, 1) delta, latch set
    val out3 = StreamingAb.abUpdate(3L)(5L, Iterator(ev(4, "purchase")), st).toSeq
    assert(out3 == Seq(StreamingAb.AbDelta(arm, 0L, 1L)))
    assert(st.get.converted)
    // converted latch: further purchases emit nothing and write nothing
    val st2 = TestGroupState.create[StreamingAb.AbState](
      Optional.of(StreamingAb.AbState(3L, converted = true)),
      GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], hasTimedOut = false)
    val out4 = StreamingAb.abUpdate(3L)(5L, Iterator(ev(5, "purchase")), st2).toSeq
    assert(out4.isEmpty && !st2.isUpdated, "latched user touched state")
    // a user whose FIRST batch crosses the bar emits one combined (1, 1)
    val st3 = fresh()
    val out5 = StreamingAb.abUpdate(1L)(5L, Iterator(ev(6, "purchase")), st3).toSeq
    assert(out5 == Seq(StreamingAb.AbDelta(arm, 1L, 1L)))
  }

  test("armOf is the batch salt: matches pmod(h32('exp1|' || user), 2) in-engine") {
    val s = spark
    import s.implicits._
    val users = (1L to 200L).toDF("user_id")
    val sparkArms = users
      .select(col("user_id"),
        pmod(graft.functions.Portable.h32(
          concat(lit("exp1|"), col("user_id"))), lit(2L)).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 200L).foreach { u =>
      assert(StreamingAb.armOf(u) == sparkArms(u), s"arm divergence at user $u")
    }
    // both arms populated (uniformity smoke)
    assert(sparkArms.values.toSet == Set(0L, 1L))
  }

  test("chi-square cells are wrap-free at 100M-user margins (BigInt model)") {
    def model(o: Long, e: Long): Long =
      ((BigInt(o - e) * BigInt(o - e) * 1000000) /
        BigInt(math.max(e, 1L))).toLong
    val margins = Seq(
      // divergent arm at 100M users: |o−e| = 4e6 — the naive
      // (o−e)²·1e6 product wraps signed 64-bit here (asserted below)
      (60000000L, 40000000L, 10000000L, 0L),
      (60000000L, 40000000L, 9000000L, 1000000L),
      (2000000000L, 2000000000L, 1500000000L, 100000000L), // 4e9 users
      (100L, 50L, 30L, 10L)) // gate-scale sanity: values unchanged
    margins.foreach { case (nA, nB, convA, convB) =>
      val n = nA + nB
      val convT = convA + convB
      val nonT = (nA - convA) + (nB - convB)
      val cells = Seq(
        (convA, nA * convT / n), (nA - convA, nA * nonT / n),
        (convB, nB * convT / n), (nB - convB, nB * nonT / n))
      cells.foreach { case (o, e) =>
        assert(Relational.chisqCellPpm(o, e) == model(o, e),
          s"cell ($o, $e) diverged from the BigInt model")
      }
      val expect = cells.map { case (o, e) => model(o, e) }.sum
      val (_, _, chisq) = StreamingAb.abChisqPpm(nA, nB, convA, convB)
      assert(chisq == expect, s"margins ($nA,$nB,$convA,$convB)")
    }
    // keep the first case honest: the naive product form really wraps
    val d = 10000000L - 60000000L * 10000000L / 100000000L
    assert(d * d * 1000000L < 0L,
      "naive-product wrap case no longer exercises overflow — pick bigger margins")
  }
}
