package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.artifacts.Artifacts
import graft.functions.{Similarity, TextAnalysis}
import graft.streaming.{SourceKit, StreamingDrift, StreamingDriftPanel, StreamingProfile}

/** Persist/load for trained artifacts (VERDICT r16 item 2): every
  * save→load round-trips bit-equal, the provenance check fails loudly
  * on the wrong kind, and the two prescribed deployments — ann_ivf
  * from a LOADED codebook, the drift-panel monitor from LOADED
  * references — produce output bit-equal to the trained-in-session
  * path. */
class ArtifactsSpec extends SparkTestBase {

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-artifact-$tag-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(d.toFile)
    }))
    d.toString
  }

  test("PCA axis round-trips bit-equal") {
    val (x, gain) = Similarity.pcaPowerTrain(spark, sf0001)
    val p = tmp("pca")
    Artifacts.savePcaAxis(spark, x, gain, p)
    val (x2, gain2) = Artifacts.loadPcaAxis(spark, p)
    assert(x2.toSeq == x.toSeq && gain2 == gain)
  }

  test("k-means model round-trips bit-equal") {
    val (cents, sizes) = Similarity.kmeansTrain(spark, sf0001)
    val p = tmp("kmeans")
    Artifacts.saveKmeans(spark, cents, sizes, p)
    val (c2, s2) = Artifacts.loadKmeans(spark, p)
    assert(c2.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(s2.toSeq == sizes.toSeq)
  }

  test("BPE merge table round-trips in rank order") {
    val merges = TextAnalysis.trainedMerges(spark, sf0001)
    val p = tmp("bpe")
    Artifacts.saveBpeMerges(spark, merges, p)
    assert(Artifacts.loadBpeMerges(spark, p) == merges)
  }

  test("PQ codebook round-trips in sub-space order") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val cb = Similarity.pqCodebook(emb)
    val p = tmp("pq")
    Artifacts.savePqCodebook(spark, cb, p)
    assert(Artifacts.loadPqCodebook(spark, p) == cb)
  }

  test("drift references round-trip bit-equal (dists + profiles)") {
    val (dists, profs) = StreamingDriftPanel.referencesFrom(spark, sf0001)
    val p = tmp("drift")
    Artifacts.saveDriftReferences(spark, dists, profs, p)
    val (d2, p2) = Artifacts.loadDriftReferences(spark, p)
    assert(d2 == dists && p2 == profs)
  }

  test("SQ8 bounds round-trip bit-equal; deploy search == trained-in-session") {
    val e = Tables.embeddings(spark, sf0001).select(col("vec_id"),
      expr(s"transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * ${Similarity.PcaEScale}) AS BIGINT))").as("e"))
    val (mn, w) = Similarity.sq8Bounds(e, Similarity.PcaDim)
    val p = tmp("sq8")
    Artifacts.saveSq8Bounds(spark, mn, w, p)
    val (mn2, w2) = Artifacts.loadSq8Bounds(spark, p)
    assert(mn2.toSeq == mn.toSeq && w2.toSeq == w.toSeq)
    val trained = Similarity.annSq8(spark, sf0001).collect().map(_.toSeq).toSet
    val loaded = Similarity.annSq8FromArtifact(spark, sf0001, p)
      .collect().map(_.toSeq).toSet
    assert(trained.nonEmpty && loaded == trained)
  }

  test("load rejects the wrong kind, a non-store path, and a future version") {
    val (x, gain) = Similarity.pcaPowerTrain(spark, sf0001)
    val p = tmp("wrongkind")
    Artifacts.savePcaAxis(spark, x, gain, p)
    val exKind = intercept[IllegalArgumentException](
      Artifacts.load(spark, "bpe_merges", p))
    assert(exKind.getMessage.contains("expected 'bpe_merges'"))
    val notStore = tmp("notstore")
    spark.range(3).write.mode("overwrite").parquet(notStore)
    val exStore = intercept[IllegalArgumentException](
      Artifacts.load(spark, "pca_axis", notStore))
    assert(exStore.getMessage.contains("not an artifact store"))
  }

  test("ann_ivf from a LOADED codebook artifact == trained-in-session ann_ivf") {
    val p = tmp("ivf")
    Similarity.saveIvfArtifact(spark, sf0001, p)
    val trained = Similarity.annIvf(spark, sf0001).collect().map(_.toSeq).toSet
    val loaded = Similarity.annIvfFromArtifact(spark, sf0001, p)
      .collect().map(_.toSeq).toSet
    assert(trained.nonEmpty && loaded == trained)
  }

  test("drift-panel monitor from LOADED references == trained-in-session run") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val p = tmp("panelrefs")
    StreamingDriftPanel.saveReferences(spark, sf0001, p)
    val (dists, profs) = StreamingDriftPanel.referencesFrom(spark, sf0001)
    val (ld, lp) = StreamingDriftPanel.referencesFromArtifact(spark, p)
    assert(ld == dists && lp == profs)
    val live = StreamingDrift.liveHalf(spark, sf0001)
    def run(d: Map[String, graft.streaming.StreamingAuc.RefDist],
        pr: Map[String, StreamingDrift.RefProfile],
        sink: String): Set[Seq[Any]] = {
      val stream = MemoryStream[StreamingProfile.PEv]
      val out = StreamingDriftPanel.panel(stream.toDS(), d, pr)
      val q = SourceKit.Sinks.toMemory(out.toDF(), sink)
      try {
        val (b1, b2) = live.toIndexedSeq.splitAt(live.length / 2)
        stream.addData(b1); q.processAllAvailable()
        stream.addData(b2); q.processAllAvailable()
        spark.table(sink).collect().map(_.toSeq).toSet
      } finally q.stop()
    }
    val fromTrained = run(dists, profs, "panel_trained_refs")
    val fromLoaded = run(ld, lp, "panel_loaded_refs")
    assert(fromTrained.nonEmpty && fromLoaded == fromTrained)
  }

  test("quality model round-trips bit-equal; deploy gate == trained gate") {
    val p = tmp("quality")
    val model = graft.functions.QualityModel.train(spark, sf0001)._2
    Artifacts.saveQualityModel(spark, model, p)
    val loaded = Artifacts.loadQualityModel(spark, p)
    assert(loaded.weights.toSeq == model.weights.toSeq &&
      loaded.means.toSeq == model.means.toSeq,
      "quality-model store round-trip perturbed weights or means")
    val dep = graft.functions.QualityModel
      .qualityPerceptronDeploy(spark, sf0001).collect().map(_.toSeq).toSeq
    val base = graft.functions.QualityModel
      .qualityPerceptron(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(dep.nonEmpty && dep == base,
      "deploy-path confusion differs from the trained-in-session gate")
  }

  test("PQ codebook round-trips float-bit-equal; deploy search == plain ann_pq") {
    val p = tmp("pq")
    val cb = Similarity.pqCodebook(
      Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding")))
    Artifacts.savePqCodebook(spark, cb, p)
    val loaded = Artifacts.loadPqCodebook(spark, p)
    assert(loaded == cb, "PQ codebook store round-trip perturbed a float")
    val dep = Similarity.annPqDeploy(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val base = Similarity.annPq(spark, sf0001).collect().map(_.toSeq).toSet
    assert(dep.nonEmpty && dep == base,
      "deploy-path PQ ranking differs from the trained-in-session gate")
  }

  test("bigram-LM serving head round-trips bit-equal through the store") {
    val p = tmp("lmhead")
    val (h2, h1) = TextAnalysis.lmHeadEntries(spark, sf0001)
    Artifacts.saveLmBigramHead(spark, h2, h1, p)
    val (l2, l1) = Artifacts.loadLmBigramHead(spark, p)
    assert(l2.sortBy(_._1).toSeq == h2.sortBy(_._1).toSeq &&
      l1.sortBy(_._1).toSeq == h1.sortBy(_._1).toSeq)
  }
}
