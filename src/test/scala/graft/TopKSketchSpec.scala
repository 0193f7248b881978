package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.expressions.TopKSketchAgg
import graft.functions.sketch.SpaceSaving
import graft.streaming.StreamingTopK

/** SpaceSaving guarantees pinned against exact counts, for the raw
  * sketch, the batch aggregate (with map-side partial merge), and the
  * streaming keyed-state form. The sketch's contract — any item with
  * true count > n/capacity is tracked; lower ≤ true ≤ upper — is what
  * makes it usable where the exact computation can't run.
  */
class TopKSketchSpec extends SparkTestBase {

  private val Capacity = 256
  private val K = 10

  private def exactCounts: Map[String, Long] =
    Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def assertGuarantees(
      got: Seq[(String, Long, Long)], exact: Map[String, Long]): Unit = {
    val n = exact.values.sum
    val mustHave = exact.filter(_._2 > n / Capacity).keySet
    val tracked = got.map(_._1).toSet
    // every guaranteed-frequent item that belongs in the top-K view
    val trueTopK = exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(K)
    trueTopK.filter(t => mustHave.contains(t._1)).foreach { case (item, true_c) =>
      assert(tracked.contains(item), s"guaranteed item $item missing from $tracked")
    }
    got.foreach { case (item, lo, hi) =>
      val t = exact.getOrElse(item, 0L)
      assert(lo <= t && t <= hi, s"$item bounds [$lo, $hi] exclude true $t")
    }
  }

  test("raw sketch: frequency guarantee and count bounds vs exact") {
    val exact = exactCounts
    val s = new SpaceSaving(Capacity)
    Tables.documents(spark, sf0001).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+")).foreach(s.add(_))
    assertGuarantees(s.topK(K), exact)
  }

  test("batch aggregate: partial+final merged sketch keeps the guarantees") {
    val exact = exactCounts
    val got = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .repartition(8) // force real partial sketches + merge
      .agg(TopKSketchAgg(col("tok"), Capacity, K).as("top"))
      .selectExpr("inline(top)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assertGuarantees(got, exact)
    val plan = Tables.documents(spark, sf0001)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .agg(TopKSketchAgg(col("tok"), Capacity, K).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topksketchagg"), s"no map-side partials:\n$plan")
  }

  test("streaming keyed-state sketch across micro-batches keeps the guarantees") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val exact = exactCounts
    val toks = Tables.documents(spark, sf0001).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\s+"))

    val stream = MemoryStream[String]
    val out = StreamingTopK.topK(stream.toDS(), groups = 4, capacity = Capacity, k = Capacity)
    val query = out.writeStream.format("memory").queryName("topk_stream")
      .outputMode("append").start()
    try {
      val (a, b) = toks.splitAt(toks.length / 2)
      stream.addData(a.toIndexedSeq); query.processAllAvailable()
      stream.addData(b.toIndexedSeq); query.processAllAvailable()
      val snaps = spark.table("topk_stream")
        .as[StreamingTopK.Snapshot].collect().toSeq
      val merged = StreamingTopK.mergedLatest(snaps, K)
      // each group sketches a DISJOINT hash-slice of items, so the merged
      // guarantee is per-slice — strictly stronger than one global sketch
      assertGuarantees(merged, exact)
    } finally query.stop()
  }
}
