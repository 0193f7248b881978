package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

import graft.SparkTestBase
import graft.functions.Similarity

/** Streaming SemDeDup == batch SemDeDup: the JVM cell-assignment and
  * cosine twins are pinned against the batch expressions, and the
  * cross-batch drop decisions must equal `dedupSemanticDrops` on the
  * same corpus. Cap semantics drive through TestGroupState.
  */
class StreamingSemanticDedupSpec extends SparkTestBase {

  private lazy val corpus: Array[(Long, Array[Float])] =
    Similarity.corpusWithNearDupVectors(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

  private lazy val book: Array[Array[Float]] = {
    val emb = Similarity.corpusWithNearDupVectors(spark, sf0001)
    Similarity.ivfCodebookTrained(spark, emb)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
  }

  test("topCells twin == batch assignCellsTop2 for every corpus vector") {
    val emb = Similarity.corpusWithNearDupVectors(spark, sf0001)
    val batch = Similarity
      .assignCellsTop2(emb, Similarity.ivfCodebookTrained(spark, emb))
      .select(col("vec_id"), col("cell"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2.toInt).toSet).toMap
    corpus.foreach { case (id, v) =>
      val jvm = StreamingSemanticDedup.topCells(v, book).toSet
      assert(jvm == batch(id), s"vec $id: jvm $jvm vs batch ${batch(id)}")
    }
  }

  test("cross-batch streaming drops == batch dedupSemanticDrops") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchDrops = Similarity.dedupSemanticDrops(spark, sf0001)
      .collect().map(_.getLong(0)).toSet

    val (b1, b2) = corpus.splitAt(corpus.length / 2)
    val stream = MemoryStream[(Long, Array[Float])]
    val out = StreamingSemanticDedup.pairs(stream.toDS(), book)
    val q = out.writeStream.format("memory").queryName("sem_dedup")
      .outputMode("append").start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
      val streamDrops = spark.table("sem_dedup")
        .select(col("vec_b")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(streamDrops == batchDrops,
        s"stream ${streamDrops.size} vs batch ${batchDrops.size}: " +
          s"extra=${streamDrops -- batchDrops} missing=${batchDrops -- streamDrops}")
    } finally q.stop()
  }

  test("cap: an overflowing cell stops accumulating but keeps matching") {
    val v = Array(1.0f, 0.0f)
    val near = Array(0.999f, 0.01f)
    import org.apache.spark.api.java.Optional
    val state = TestGroupState.create[Seq[(Long, Array[Float])]](
      Optional.of(Seq(1L -> v, 2L -> v)), // at cap 2 already
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, Optional.empty[Long], hasTimedOut = false)
    val out = StreamingSemanticDedup.cellUpdate(0.99, 2, None)(
      7, Iterator((7, 5L, near)), state).toSeq
    // matches BOTH held vectors (pairs emitted) ...
    assert(out.map(p => (p.vec_a, p.vec_b)).toSet == Set((1L, 5L), (2L, 5L)))
    // ... but is NOT added to the full cell
    assert(state.get.map(_._1) == Seq(1L, 2L))
  }
}
