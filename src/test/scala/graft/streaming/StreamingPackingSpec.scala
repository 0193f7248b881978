package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextAnalysis
import graft.streaming.StreamingTokenBudget.DocIn

/** Live packing assignments grouped per (source, seq_id) equal the
  * batch pack_sequences gate exactly on an in-order two-batch feed —
  * including sequences that SPAN the micro-batch boundary — and the
  * kernel keeps one state triple per source.
  */
class StreamingPackingSpec extends SparkTestBase {

  test("streamed assignments == batch pack_sequences across a batch boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map(t => DocIn(t._1, t._2, t._3))
    val stream = MemoryStream[DocIn]
    val out = StreamingPacking.assignments(stream.toDS())
    val q = SourceKit.Sinks.toMemory(out, "pack_out")
    try {
      val (b1, b2) = docs.toIndexedSeq.splitAt(docs.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val streamed = spark.table("pack_out").collect()
        .map(r => (r.getString(1), r.getLong(4), r.getLong(0), r.getLong(2)))
      assert(streamed.length == docs.length, "one assignment per doc")
      // group the live assignments into the gate's output shape
      val grouped = streamed.groupBy(t => (t._1, t._2)).map { case ((src, seq), xs) =>
        (src, seq, xs.length.toLong, xs.map(_._3).min, xs.map(_._4).sum)
      }.toSet
      val batch = TextAnalysis.packSequences(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(grouped == batch,
        s"packing divergence, e.g. ${(grouped -- batch).take(3)} vs ${(batch -- grouped).take(3)}")
    } finally q.stop()
  }

  test("offsets continue across batches: a later doc lands after the earlier mass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DocIn]
    val out = StreamingPacking.assignments(stream.toDS(), seqLen = 5L)
    val q = SourceKit.Sinks.toMemory(out, "pack_small")
    try {
      stream.addData(DocIn(1, "a", "w1 w2 w3"), DocIn(2, "a", "w1 w2 w3 w4"))
      q.processAllAvailable()
      stream.addData(DocIn(3, "a", "w1"), DocIn(4, "b", "w1 w2"))
      q.processAllAvailable()
      val rows = spark.table("pack_small").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).sortBy(_._1)
      assert(rows.toSeq == Seq(
        (1L, "a", 3L, 0L, 0L),  // tokens 0-2 -> seq 0
        (2L, "a", 4L, 3L, 0L),  // starts at 3 -> still seq 0
        (3L, "a", 1L, 7L, 1L),  // CROSS-BATCH: starts at 7 -> seq 1
        (4L, "b", 2L, 0L, 0L))) // sources pack independently
    } finally q.stop()
  }
}
