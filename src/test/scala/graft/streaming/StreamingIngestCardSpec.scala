package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The live ingest card's cumulative counters equal the batch data
  * card's matching columns once the feed is consumed, and emission is
  * one snapshot per (touched source, batch).
  */
class StreamingIngestCardSpec extends SparkTestBase {

  test("cumulative ingest card == batch sourceCard scan-speed columns after the feed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
      .map(t => StreamingTokenBudget.DocIn(t._1, t._2, t._3))
    val (b1, b2) = docs.toIndexedSeq.splitAt(docs.length / 2)
    val stream = MemoryStream[StreamingTokenBudget.DocIn]
    val out = StreamingIngestCard.cards(stream.toDS().toDF())
    val q = SourceKit.Sinks.toMemory(out.toDF(), "ingest_card")
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val rows = spark.table("ingest_card").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // one snapshot per (touched source, batch)
      val perBatchSources = Seq(b1, b2).map(_.map(_.source).toSet.size).sum
      assert(rows.length == perBatchSources, s"${rows.length} vs $perBatchSources")
      // the LAST (cumulative) snapshot per source == the batch card
      val last = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val batch = graft.examples.PipelineDemo.sourceCard(spark, sf0001)
        .select("source", "n_docs", "n_tokens", "n_quality_fail", "n_non_en")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(batch.nonEmpty && last.keySet == batch.keySet)
      batch.foreach { case (src, (nd, nt, nq, nn)) =>
        val (_, d, t, qf, ne) = last(src)
        assert((d, t, qf, ne) == (nd, nt, nq, nn),
          s"$src: streamed ($d,$t,$qf,$ne) != batch ($nd,$nt,$nq,$nn)")
      }
    } finally q.stop()
  }
}
