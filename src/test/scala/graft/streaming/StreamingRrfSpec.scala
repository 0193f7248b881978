package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.functions.Similarity

/** The live hybrid-retrieval monitor must converge to the batch gate:
  * once the document corpus is consumed, the last batch's fused table
  * equals batch retrieval_rrf bit for bit — with the ANN side loaded
  * from the deploy-time ARTIFACT, not retrained. */
class StreamingRrfSpec extends SparkTestBase {

  test("final fused table == batch retrieval_rrf (ANN side from the stored artifact)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("rrf-ann-").toString
    StreamingRrf.saveAnnArtifact(spark, sf0001, p)
    val ann = graft.artifacts.Artifacts.loadAnnTopk(spark, p)
    val feed = StreamingRrf.docFeed(spark, sf0001)
    val stream = MemoryStream[StreamingRrf.RDoc]
    val out = StreamingRrf.rrf(stream.toDS(), ann)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "rrf_out")
    try {
      val (b1, b2) = feed.toIndexedSeq.splitAt(feed.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val rows = spark.table("rrf_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val lastBatch = rows.map(_._1).max
      assert(lastBatch == 2L, "expected two emitting batches")
      val last = rows.filter(_._1 == lastBatch)
        .map(t => (t._2, t._3, t._4, t._5)).toSet
      val batch = Similarity.retrievalRrf(spark, sf0001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(batch.nonEmpty && last == batch,
        s"streamed fused table != batch gate: only-streamed=${(last -- batch).take(5)} " +
          s"only-batch=${(batch -- last).take(5)}")
      // batch 1 also emitted a full fused table per query (cumulative contract)
      val b1rows = rows.filter(_._1 == 1L)
      assert(b1rows.map(_._2).distinct.length == ann.size)
    } finally q.stop()
  }

  test("kernel: zero-hit docs fill the head in (score DESC, cid) order") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val nq = graft.functions.TextAnalysis.Bm25Query.length
    val zeroDoc = (id: Long) => StreamingRrf.RDoc(id, 10L, Seq.fill(nq)(0L))
    val hitDoc = StreamingRrf.RDoc(99L, 10L, 1L +: Seq.fill(nq - 1)(0L))
    val st = TestGroupState.create[StreamingRrf.RrfState](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long], hasTimedOut = false)
    val ann = Map(7L -> Seq((99L, 1L), (3L, 2L)))
    val out = StreamingRrf.rrfUpdate(ann)(
      0, Iterator(zeroDoc(5), zeroDoc(2), zeroDoc(8), hitDoc), st).toSeq
    // head = hit doc first (positive score), then zero docs by id: 2, 5, 8
    val s2 = st.get
    assert(StreamingRrf.headOf(s2) ==
      Seq((99L, 1L), (2L, 2L), (5L, 3L), (8L, 4L)))
    // fusion covers the union {99, 3, 2, 5, 8} for qid 7
    assert(out.map(_.cid).toSet == Set(99L, 3L, 2L, 5L, 8L))
    // 99 leads: rv rank 1 + rb rank 1
    assert(out.minBy(_.fused_rank).cid == 99L)
  }
}
