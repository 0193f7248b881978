package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.functions.Similarity

/** The live projection-band monitor must land on the BATCH gate's
  * numbers once the feed is consumed — same fixed-point quantization,
  * same sign-safe mean — across a batch boundary (state carries). */
class StreamingPcaSpec extends SparkTestBase {

  test("final streamed bands == batch embed_pca_project per label") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val axis = StreamingPca.axisFrom(spark, sf0001)
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
      .as[StreamingPca.VecIn].collect()
    val (b1, b2) = vecs.splitAt(vecs.length / 2)

    val stream = MemoryStream[StreamingPca.VecIn]
    val q = StreamingPca.bands(stream.toDS(), axis)
      .writeStream.format("memory").queryName("pca_bands")
      .outputMode("append").start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val last = spark.table("pca_bands").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .groupBy(_._1).map { case (l, rows) => l -> rows.maxBy(_._2) }

    val batch = Similarity.embedPcaProject(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(batch.nonEmpty && batch.map(_._1).toSet == last.keySet)
    batch.foreach { case (label, n, mean, lo, hi) =>
      val (_, _, sn, smean, slo, shi) = last(label)
      assert((sn, smean, slo, shi) == ((n, mean, lo, hi)), s"label $label")
    }
    spark.catalog.dropTempView("pca_bands")
  }

  test("final streamed top-m bands == batch embed_pca_project_topm per (component, label)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val axes = StreamingPca.axesFrom(spark, sf0001)
    assert(axes.length == Similarity.PcaTopM)
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding")
      .as[StreamingPca.VecIn].collect()
    val (b1, b2) = vecs.splitAt(vecs.length / 2)

    val stream = MemoryStream[StreamingPca.VecIn]
    val q = StreamingPca.bandsTopm(stream.toDS(), axes)
      .writeStream.format("memory").queryName("pca_bands_topm")
      .outputMode("append").start()
    try {
      stream.addData(b1.toIndexedSeq); q.processAllAvailable()
      stream.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("pca_bands_topm").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val last = rows.groupBy(t => (t._3, t._1)) // (component, label)
      .map { case (k, rs) => k -> rs.maxBy(_._2) }

    val batch = Similarity.embedPcaProjectTopm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(batch.nonEmpty && batch.map(t => (t._1, t._2)).toSet == last.keySet)
    batch.foreach { case (component, label, n, mean, lo, hi) =>
      val (_, _, _, sn, smean, slo, shi) = last((component, label))
      assert((sn, smean, slo, shi) == ((n, mean, lo, hi)),
        s"component $component label $label")
    }
    // every touched label emits ALL m components each batch
    rows.groupBy(t => (t._1, t._2)).foreach { case (k, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to axes.length).toSeq,
        s"label/batch $k missing components")
    }
    spark.catalog.dropTempView("pca_bands_topm")
  }
}
