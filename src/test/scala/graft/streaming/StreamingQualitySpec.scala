package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.functions.QualityModel

/** The live distilled-quality monitor must reproduce the batch gate:
  * per-source confusions under the LOADED model artifact, summed over
  * sources, equal quality_perceptron's global confusion exactly. */
class StreamingQualitySpec extends SparkTestBase {

  test("final per-source confusions (model from the stored artifact) sum to the batch gate's") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("quality-model-").toString
    StreamingQuality.saveModel(spark, sf0001, p)
    val loaded = graft.artifacts.Artifacts.loadQualityModel(spark, p)
    val trained = QualityModel.train(spark, sf0001)._2
    assert(loaded.weights.toSeq == trained.weights.toSeq &&
      loaded.means.toSeq == trained.means.toSeq)
    val feed = StreamingQuality.docFeed(spark, sf0001)
    val stream = MemoryStream[StreamingQuality.QDoc]
    val out = StreamingQuality.monitor(stream.toDS(), loaded)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "quality_mon")
    try {
      val (b1, b2) = feed.toIndexedSeq.splitAt(feed.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val rows = spark.table("quality_mon").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      val last = rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
      val summed = last.foldLeft((0L, 0L, 0L, 0L)) { case ((a, b, c, d), r) =>
        (a + r._3, b + r._4, c + r._5, d + r._6)
      }
      val gate = QualityModel.qualityPerceptron(spark, sf0001).collect().head
      val want = (gate.getLong(2), gate.getLong(3), gate.getLong(4), gate.getLong(5))
      assert(summed == want, s"streamed $summed != batch gate $want")
      assert(last.size > 1, "expected more than one source")
    } finally q.stop()
  }

  test("kernel: timed-out source is evicted and the invocation is silent") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val m = QualityModel.Model(
      Array(1L, 0L, 1L, 1L, 0L, 0L), Array(0L, 0L, 0L, 0L, 0L))
    val st = TestGroupState.create[StreamingQuality.QualityState](
      Optional.of(StreamingQuality.QualityState(3L, 1L, 2L, 3L, 4L)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(1L)), hasTimedOut = true)
    val out = StreamingQuality.qualityUpdate(m, Some(1.minute))(
      "web", Iterator.empty, st).toSeq
    assert(out.isEmpty && st.isRemoved)
  }
}
