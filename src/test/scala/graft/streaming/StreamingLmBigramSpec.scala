package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.functions.TextAnalysis

/** Pins the live bigram-LM monitor to the batch gate: per-source
  * (n_bigrams, sum_lp) after the last batch must equal
  * TextAnalysis.lmBigramBySource's exact integers, with the model
  * loaded from the artifact store (not retrained). */
class StreamingLmBigramSpec extends SparkTestBase {

  test("final per-source sums (model from the stored artifact) == batch frame") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("lm-bigram-").toString
    StreamingLmBigram.saveModel(spark, sf0001, p)
    val loaded = StreamingLmBigram.loadModel(spark, p)
    val trained = StreamingLmBigram.modelFrom(spark, sf0001)
    assert(loaded.fc2 == trained.fc2 && loaded.fc1 == trained.fc1,
      "artifact round-trip perturbed the model")
    val feed = StreamingLmBigram.docFeed(spark, sf0001)
    assert(feed.nonEmpty)
    val stream = MemoryStream[StreamingLmBigram.LDoc]
    val out = StreamingLmBigram.monitor(stream.toDS(), loaded)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "lm_mon")
    try {
      val (b1, b2) = feed.toIndexedSeq.splitAt(feed.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val rows = spark.table("lm_mon").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
      val last = rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
      val want = TextAnalysis.lmBigramBySource(spark, sf0001).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(last.map(_._1).toSet == want.keySet, "source sets differ")
      last.foreach { case (src, _, n, sum, mean) =>
        val (wn, wsum) = want(src)
        assert(n == wn, s"$src n_bigrams $n != batch $wn")
        assert(sum == wsum, s"$src sum_lp $sum != batch $wsum")
        val wmean = BigDecimal(wsum.toDouble / wn)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(mean == wmean, s"$src lp_mean $mean != $wmean")
      }
      assert(last.size > 1, "expected more than one source")
    } finally q.stop()
  }

  test("head serving (model from the stored HEAD artifact) == batch head frame") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val p = java.nio.file.Files.createTempDirectory("lm-head-").toString
    // tiny heads so the truncation path (out-of-head class-0 fallback)
    // is genuinely exercised, not just the full-vocab degenerate case
    val (h2, h1) = (8, 4)
    val (e2, e1) = TextAnalysis.lmHeadEntries(spark, sf0001, h2, h1)
    assert(e2.length == h2 && e1.length == h1, "head not truncated")
    graft.artifacts.Artifacts.saveLmBigramHead(spark, e2, e1, p)
    val served = StreamingLmBigram.loadHeadModel(spark, p)
    assert(served.fc2 == StreamingLmBigram.headModel(e2, e1).fc2 &&
      served.fc1 == StreamingLmBigram.headModel(e2, e1).fc1,
      "head artifact round-trip perturbed the model")
    val feed = StreamingLmBigram.docFeed(spark, sf0001)
    val stream = MemoryStream[StreamingLmBigram.LDoc]
    val out = StreamingLmBigram.monitor(stream.toDS(), served)
    val q = SourceKit.Sinks.toMemory(out.toDF(), "lm_head_mon")
    try {
      val (b1, b2) = feed.toIndexedSeq.splitAt(feed.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val last = spark.table("lm_head_mon").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
      val want = TextAnalysis.lmBigramHeadBySource(spark, sf0001, h2, h1)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(last.map(_._1).toSet == want.keySet, "source sets differ")
      last.foreach { case (src, _, n, sum) =>
        val (wn, wsum) = want(src)
        assert(n == wn, s"$src n_bigrams $n != batch head $wn")
        assert(sum == wsum, s"$src sum_lp $sum != batch head $wsum")
      }
      // the truncated model must actually diverge from the full one
      // somewhere, or this pin is vacuously the full-model test
      val full = TextAnalysis.lmBigramBySource(spark, sf0001).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(last.exists { case (src, _, _, sum) => full(src) != sum },
        "8/4 head scored identically to the full model — truncation untested")
    } finally q.stop()
  }

  test("full-head equality: headK >= vocab serves exactly the full model") {
    val (e2, e1) = TextAnalysis.lmHeadEntries(spark, sf0001, 1 << 20, 1 << 20)
    val served = StreamingLmBigram.headModel(e2, e1)
    val full = StreamingLmBigram.modelFrom(spark, sf0001)
    assert(served.fc2 == full.fc2 && served.fc1 == full.fc1,
      "uncapped head model != trained full model")
  }

  test("unseen bigrams score fc2=0 (count-1 smoothing); unseen heads fc1=0") {
    val m = StreamingLmBigram.LmModel(
      Map(("the", "cat") -> 3L), Map("the" -> 4L))
    assert(StreamingLmBigram.lpOf(m, "the", "cat") == -1L)
    assert(StreamingLmBigram.lpOf(m, "the", "dog") == -4L)
    assert(StreamingLmBigram.lpOf(m, "a", "dog") == 0L)
  }

  test("kernel: timed-out source is evicted and the invocation is silent") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import scala.concurrent.duration._
    val m = StreamingLmBigram.LmModel(Map.empty, Map.empty)
    val st = TestGroupState.create[StreamingLmBigram.LmState](
      Optional.of(StreamingLmBigram.LmState(2L, 7L, -9L)),
      GroupStateTimeout.ProcessingTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(1L)), hasTimedOut = true)
    val out = StreamingLmBigram.lmUpdate(m, Some(1.minute))(
      "web", Iterator.empty, st).toSeq
    assert(out.isEmpty && st.isRemoved)
  }
}
