package graft

import org.apache.spark.sql.functions._

import graft.functions.LabelSumAggregator
import graft.multimodal.Multimodal

class AggregatorAndFramesSpec extends SparkTestBase {

  test("LabelSumAggregator folds windows into (sorted label, sum) — the WindowAgg surface") {
    val s = spark
    import s.implicits._
    val ds = Seq(("b", 2), ("a", 1), ("c", 9), ("a", 4)).toDS()
    val got = ds.groupByKey(_ => 0).agg(LabelSumAggregator.toColumn).collect().head._2
    assert(got == ("a-a-b-c", 16), s"got $got")
  }

  test("LabelSumAggregator is SQL-usable via udaf registration") {
    val s = spark
    import s.implicits._
    spark.udf.register("label_sum", udaf(LabelSumAggregator))
    Seq(("x", "a", 1), ("x", "b", 2), ("y", "c", 3)).toDF("g", "k", "v")
      .createOrReplaceTempView("label_sum_in")
    val got = spark.sql(
      "SELECT g, label_sum(k, v) AS ls FROM label_sum_in GROUP BY g ORDER BY g")
      .selectExpr("g", "ls._1", "ls._2")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("x", "a-b", 3), ("y", "c", 3)), s"got $got")
  }

  test("frame sampling: every Nth fixed-size frame, deterministic checksums, partial tail frame") {
    val s = spark
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf0001).as[Multimodal.MediaRow]
    val frames = Multimodal.sampleFrames(media, everyN = 2).cache()
    val byDoc = frames.groupByKey(_.doc_id).count().collect().toMap
    val expected = media.collect().map { r =>
      val nFrames = (r.media.length + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes
      r.doc_id -> ((nFrames + 1) / 2).toLong
    }.toMap
    assert(byDoc == expected, "sampled frame counts diverge from ceil(frames/2)")
    // tail frames may be short but never empty or oversized
    val bad = frames.filter(f => f.n_bytes <= 0 || f.n_bytes > Multimodal.FrameBytes).count()
    assert(bad == 0)
    // determinism: second run produces identical checksums
    val again = Multimodal.sampleFrames(media, everyN = 2)
      .collect().map(f => (f.doc_id, f.frame_idx) -> f.checksum).toMap
    val first = frames.collect().map(f => (f.doc_id, f.frame_idx) -> f.checksum).toMap
    assert(first == again)
    frames.unpersist()
  }

  test("resize stub bounds dimensions while keeping the batch pipeline shape") {
    val s = spark
    import s.implicits._
    val feats = Multimodal.decodeFeatures(
      Multimodal.mediaFromDocuments(spark, sf0001).as[Multimodal.MediaRow])
    val resized = Multimodal.resizeFeatures(feats, maxSide = 64).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(f => f.width <= 64 && f.height <= 64 && f.width >= 1 && f.height >= 1))
  }
}
