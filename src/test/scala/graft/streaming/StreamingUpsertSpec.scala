package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Relational

/** Streaming CDC apply == batch MERGE: play the q42 snapshot + change
  * set through the keyed-state view and require the final state to be
  * EXACTLY the batch full-outer merge's output.
  */
class StreamingUpsertSpec extends SparkTestBase {

  test("snapshot + changes through keyed state == batch q42 merge, row for row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the q42 corpus, constructed with the SAME DataFrame arithmetic
    // (decimal adds, derived insert offset) so parity is exact
    val base = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("price"))
    val loads = base.collect().map(r => StreamingUpsert.Change(
      r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), "load"))
    val off = base.agg(max(col("o_orderkey"))).collect()(0).getLong(0) /
      1000000000L * 1000000000L + 1000000000L
    val updates = graft.Tables.orders(spark, sf0001)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") + 100)
          .cast("decimal(18,2)").cast("double").as("price"))
      .collect().map(r => StreamingUpsert.Change(
        r.getLong(0), r.getLong(1), "U", r.getDouble(2), "upsert"))
    val inserts = base.filter(col("o_orderkey") % 17 === 0)
      .collect().map(r => StreamingUpsert.Change(
        r.getLong(0) + off, r.getLong(1), "N", r.getDouble(3), "upsert"))
    val deletes = base
      .filter(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 10 =!= 0)
      .collect().map(r => StreamingUpsert.Change(
        r.getLong(0), 0L, "", 0.0, "delete"))

    val stream = MemoryStream[StreamingUpsert.Change]
    val out = StreamingUpsert(stream.toDS())
    val query = SourceKit.Sinks.toMemory(out.toDF(), "cdc_view")
    try {
      stream.addData(loads.toSeq); query.processAllAvailable()
      stream.addData((updates ++ inserts ++ deletes).toSeq)
      query.processAllAvailable()
      val emissions = spark.table("cdc_view").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getLong(4), r.getBoolean(5)))
      // every applied change emitted once
      assert(emissions.length ==
        loads.length + updates.length + inserts.length + deletes.length)
      // final state = max-version emission per key, live rows only
      val finalState = emissions.groupBy(_._1)
        .map { case (_, vs) => vs.maxBy(_._5) }
        .filter(_._6)
        .map(v => v._1 -> (v._2, v._3, v._4)).toMap
      val batch = Relational.q42Upsert(spark, sf0001).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3)))
        .toMap
      assert(finalState.keySet == batch.keySet,
        s"key sets diverge: +${(finalState.keySet -- batch.keySet).take(3)} " +
          s"-${(batch.keySet -- finalState.keySet).take(3)}")
      finalState.foreach { case (k, v) =>
        assert(v == batch(k), s"key $k: streaming $v vs batch ${batch(k)}")
      }
    } finally query.stop()
  }
}
