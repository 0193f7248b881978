package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.functions.Dedup
import graft.streaming.SourceKit.Sinks

/** Pins the streaming decontamination stage to the batch gate: the same
  * document stream split across micro-batches must produce, per doc,
  * exactly the (n_bloom, action) the oracle-gated
  * `decontaminate_bloom_bitmap` pipeline computes — bit-identical
  * including false positives, because bitmap and probes are the same
  * deterministic values. Also pins statelessness: the plan has no
  * stateful operator, so the stage adds nothing to the ingest path's
  * state store.
  */
class StreamingDecontaminationSpec extends SparkTestBase {

  test("streaming quarantine decisions equal the batch bitmap gate, cross-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val expected = Dedup.decontaminateBloomBitmap(spark, sf0001)
      .select("doc_id", "n_bloom", "action")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(expected.exists(_._3 == "quarantine"), "regime check: contamination exists")

    val bm = Dedup.benchmarkBitmap(spark, sf0001)
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[(Long, String)]
    val out = StreamingDecontamination
      .quarantine(stream.toDS().toDF("doc_id", "text"), bm)
      .select("doc_id", "n_bloom", "action")
    val query = Sinks.toMemory(out, "decon_trace")
    try {
      stream.addData(b1.toIndexedSeq); query.processAllAvailable()
      stream.addData(b2.toIndexedSeq); query.processAllAvailable()
      val got = Sinks.collected[(Long, Long, String)](spark, "decon_trace").toSet
      assert(got === expected)
    } finally query.stop()
  }

  test("the lambda overlap form equals the explode+groupBy gate values in batch too") {
    // same expression, batch DataFrame: the no-shuffle per-row form is a
    // drop-in for the gate's explode+groupBy n_bloom
    val bm = Dedup.benchmarkBitmap(spark, sf0001)
    val viaLambda = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        Dedup.bloomOverlapCount(col("text"), bm).as("n_bloom"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaGate = Dedup.decontaminateBloomBitmap(spark, sf0001)
      .select("doc_id", "n_bloom")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLambda === viaGate)
  }
}
