package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.StreamingDq.{Fact, Violation}

/** Streaming DQ monitor: planted violations are all caught with their
  * exact rule attribution (== a batch replay of the same rules on the
  * same feed), clean facts emit nothing, totals run in complete mode
  * across batches.
  */
class StreamingDqSpec extends SparkTestBase {

  /** Events feed with deterministic planted violations: every 89th fact
    * gets an orphan user, every 97th a non-positive amount, every 101st
    * an above-cap amount (ids coprime → overlaps exist and are fine:
    * one fact can violate several rules, each rule fires once). */
  private def plantedFeed(): (Seq[Fact], org.apache.spark.sql.DataFrame) = {
    val s = spark
    import s.implicits._
    val users = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_id"))
    val base = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val facts = base.zipWithIndex.map { case ((eid, uid), i) =>
      Fact(
        eid,
        if (i % 89 == 0) uid + 1000000000000L else uid,
        if (i % 97 == 0) -5L
        else if (i % 101 == 0) StreamingDq.CentsCap + 7L
        else 100L)
    }
    (facts.toSeq, users)
  }

  test("planted violations caught exactly, complete-mode totals across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (facts, users) = plantedFeed()
    val stream = MemoryStream[Fact]
    val out = StreamingDq.totals(StreamingDq.violations(stream.toDS(), users))
    val sink = s"dq_totals_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      val (b1, b2) = facts.toIndexedSeq.splitAt(facts.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table(sink).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch replay of the same rules over the same planted feed — the
      // streaming monitor must agree rule for rule
      val batch = StreamingDq.totals(
        StreamingDq.violations(s.createDataset(facts), users)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      // and both match the driver-side count model
      val userSet = users.as[Long].collect().toSet
      val expect = Map(
        "orphan_user" -> facts.count(f => !userSet(f.user_id)).toLong,
        "nonpositive_cents" -> facts.count(_.cents <= 0L).toLong,
        "cents_above_cap" ->
          facts.count(_.cents > StreamingDq.CentsCap).toLong)
      assert(streamed == expect, s"streamed $streamed vs model $expect")
      assert(expect.values.forall(_ > 0L), "plant produced no violations")
    } finally q.stop()
  }

  test("a clean feed emits zero violations") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("user_id"))
    val clean = graft.Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"))
      .as[(Long, Long)].collect().toSeq
      .map { case (eid, uid) => Fact(eid, uid, 100L) }
    val stream = MemoryStream[Fact]
    val out = StreamingDq.violations(stream.toDS(), users)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "dq_clean_out")
    try {
      stream.addData(clean.toIndexedSeq); q.processAllAvailable()
      assert(spark.table("dq_clean_out").count() == 0L)
    } finally q.stop()
  }
}
