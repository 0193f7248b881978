package graft.artifacts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAuc.RefDist
import graft.streaming.StreamingDrift.RefProfile

/** Parquet-backed persist/load for every TRAINED ARTIFACT the library
  * produces (VERDICT r16 item 2): IVF/PQ codebooks, the PCA axis,
  * k-means centroids, BPE merge tables, and the frozen drift-monitor
  * references. A production pipeline trains ONCE and deploys to many
  * jobs and monitors — the in-memory (session, dir) memos only cover
  * re-use within one driver, and the streaming monitors' "frozen at
  * deploy time" contract needs a real stored artifact to freeze.
  *
  * Format: one parquet directory per artifact, payload columns plus
  * two provenance columns (`artifact_kind`, `artifact_version`) checked
  * on load — loading the wrong artifact kind or a future format fails
  * loudly instead of feeding a monitor a mis-shaped reference. Every
  * artifact here is BOUNDED (codebooks, axes, merge tables, per-type
  * references — never corpus-sized) by the same contract that lets the
  * trainers collect them to the driver, so `repartition(1)` writes one
  * file and the provenance check's distinct-collect is a few rows.
  *
  * Loaded artifacts are plain values (the same types the trainers
  * return), so every downstream path — batch gates, streaming
  * monitors — is identical between the trained-in-session and the
  * loaded-from-artifact deployments; ArtifactsSpec pins bit-equality
  * of both paths' outputs. */
object Artifacts {

  /** Bump when a payload schema changes incompatibly; `load` rejects
    * files written by a different version. */
  val FormatVersion = 1

  private val KindCol = "artifact_kind"
  private val VersionCol = "artifact_version"

  /** Persist `df` (payload columns only) as artifact `kind` at `path`. */
  def save(df: DataFrame, kind: String, path: String): Unit = {
    require(!df.columns.contains(KindCol) && !df.columns.contains(VersionCol),
      s"payload must not already carry $KindCol/$VersionCol")
    df.withColumn(KindCol, lit(kind))
      .withColumn(VersionCol, lit(FormatVersion))
      .repartition(1) // artifacts are bounded by contract — one file
      .write.mode("overwrite").parquet(path)
  }

  /** Load artifact `kind` from `path`, verifying kind + format version;
    * returns the payload columns only. */
  def load(s: SparkSession, kind: String, path: String): DataFrame = {
    val df = s.read.parquet(path)
    require(df.columns.contains(KindCol) && df.columns.contains(VersionCol),
      s"$path is not an artifact store (missing $KindCol/$VersionCol)")
    val stamps = df.select(KindCol, VersionCol).distinct().collect()
    require(stamps.length == 1,
      s"$path holds ${stamps.length} distinct (kind, version) stamps — corrupt store")
    val (k, v) = (stamps(0).getString(0), stamps(0).getInt(1))
    require(k == kind, s"$path holds artifact kind '$k', expected '$kind'")
    require(v == FormatVersion,
      s"$path is format version $v, this build reads $FormatVersion")
    df.drop(KindCol, VersionCol)
  }

  // ---- IVF coarse codebook: (cent_id: bigint, cv: array<float>) ----

  def saveIvfCodebook(cents: DataFrame, path: String): Unit =
    save(cents.select(col("cent_id").cast("long"), col("cv")),
      "ivf_codebook", path)

  def loadIvfCodebook(s: SparkSession, path: String): DataFrame =
    load(s, "ivf_codebook", path).select("cent_id", "cv")

  // ---- PQ codebook: (cent_id: int, cv: array<float>) — row order is
  // the sub-space index order the encoder depends on, so load sorts ----

  def savePqCodebook(s: SparkSession, codebook: Seq[Seq[Float]], path: String): Unit = {
    import s.implicits._
    save(codebook.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cent_id", "cv"), "pq_codebook", path)
  }

  def loadPqCodebook(s: SparkSession, path: String): Seq[Seq[Float]] =
    load(s, "pq_codebook", path).select("cent_id", "cv").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toSeq))
      .sortBy(_._1).toSeq.map(_._2)

  // ---- frozen ANN ranking: (qid, cid, rank) per query — the vector
  // side a deployed hybrid-retrieval monitor fuses against ----

  def saveAnnTopk(ranked: DataFrame, path: String): Unit =
    save(ranked.select(col("qid").cast("long"), col("cid").cast("long"),
      col("rank").cast("long")), "ann_topk", path)

  /** qid → (cid, rank) list in rank order. */
  def loadAnnTopk(s: SparkSession, path: String): Map[Long, Seq[(Long, Long)]] =
    load(s, "ann_topk", path).select("qid", "cid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (q, rows) =>
        q -> rows.sortBy(_._3).toSeq.map(t => (t._2, t._3))
      }

  // ---- PCA axis: (idx: int, loading: bigint) + gain on every row ----

  def savePcaAxis(s: SparkSession, x: Array[BigInt], gain: BigInt, path: String): Unit = {
    import s.implicits._
    save(x.zipWithIndex.map { case (l, i) => (i, l.toLong, gain.toLong) }
      .toSeq.toDF("idx", "loading", "gain"), "pca_axis", path)
  }

  def loadPcaAxis(s: SparkSession, path: String): (Array[BigInt], BigInt) = {
    val rows = load(s, "pca_axis", path).select("idx", "loading", "gain")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    require(rows.nonEmpty, s"$path holds an empty PCA axis")
    (rows.map(r => BigInt(r._2)), BigInt(rows.head._3))
  }

  // ---- bigram LM: (w1, w2, fc2) per bigram + (w1, fc1) per head ----

  def saveLmBigram(fc2: DataFrame, fc1: DataFrame, path: String): Unit = {
    save(fc2.select("w1", "w2", "fc2"), "lm_bigram_fc2", s"$path/fc2")
    save(fc1.select("w1", "fc1"), "lm_bigram_fc1", s"$path/fc1")
  }

  /** Hard driver-collect bound for [[loadLmBigram]]: the FULL model is
    * vocab-sized — fine as a distributed scoring join (the batch gate's
    * shape) but NOT driver-sized at a 100-TB corpus's bigram
    * vocabulary. A monitor that needs an in-closure model deploys the
    * frequency-cutoff head ([[saveLmBigramHead]]) instead; this cap
    * turns a silently corpus-sized collect into a loud error. */
  val LmFullLoadCap = 1 << 20

  def loadLmBigram(
      s: SparkSession, path: String)
      : (Map[(String, String), Long], Map[String, Long]) = {
    // cap check on the collected ROW count, before toMap: an
    // (out-of-contract) artifact with duplicate keys would dedup in
    // toMap and let map-size slip under the cap while rows beyond the
    // limit were silently dropped — the exact silent truncation this
    // cap exists to turn into a loud error (ADVICE r18)
    val rows2 = load(s, "lm_bigram_fc2", s"$path/fc2")
      .limit(LmFullLoadCap + 1).collect()
    val rows1 = load(s, "lm_bigram_fc1", s"$path/fc1")
      .limit(LmFullLoadCap + 1).collect()
    require(rows2.nonEmpty && rows1.nonEmpty, s"$path holds an empty bigram LM")
    require(rows2.length <= LmFullLoadCap && rows1.length <= LmFullLoadCap,
      s"$path bigram LM exceeds the $LmFullLoadCap-entry driver-load " +
        "contract; serve from the lm_bigram_head artifact instead")
    val f2 = rows2.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val f1 = rows1.map(r => r.getString(0) -> r.getLong(1)).toMap
    (f2, f1)
  }

  // ---- bigram-LM serving head (part ∈ {bg, w1}, key, fc): the
  // frequency-cutoff truncation the LIVE monitor deploys from — rows
  // bounded at headK2 + headK1 BY CONSTRUCTION at save time, so the
  // load-side collect stays driver-sized whatever the corpus bigram
  // vocabulary. Out-of-head lookups take class 0 on both sides
  // (count-1 smoothing) — the rule text_lm_bigram_head states in batch.

  def saveLmBigramHead(s: SparkSession, h2: Array[(String, Long)],
      h1: Array[(String, Long)], path: String): Unit = {
    import s.implicits._
    require(h2.nonEmpty && h1.nonEmpty, "empty bigram-LM head")
    save((h2.map { case (bg, fc) => ("bg", bg, fc) } ++
      h1.map { case (w1, fc) => ("w1", w1, fc) }).toSeq
      .toDF("part", "key", "fc"), "lm_bigram_head", path)
  }

  def loadLmBigramHead(s: SparkSession, path: String)
      : (Array[(String, Long)], Array[(String, Long)]) = {
    val rows = load(s, "lm_bigram_head", path).select("part", "key", "fc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val h2 = rows.filter(_._1 == "bg").map(t => t._2 -> t._3).sortBy(_._1)
    val h1 = rows.filter(_._1 == "w1").map(t => t._2 -> t._3).sortBy(_._1)
    require(h2.nonEmpty && h1.nonEmpty, s"$path holds an empty bigram-LM head")
    (h2, h1)
  }

  // ---- SQ8 bounds: (idx: int, mn: bigint, w: bigint) per dimension ----

  def saveSq8Bounds(
      s: SparkSession, mn: Array[Long], w: Array[Long], path: String): Unit = {
    import s.implicits._
    require(mn.length == w.length, "SQ8 mn/w length mismatch")
    save(mn.zip(w).zipWithIndex.map { case ((m, wd), i) => (i, m, wd) }
      .toSeq.toDF("idx", "mn", "w"), "sq8_bounds", path)
  }

  def loadSq8Bounds(s: SparkSession, path: String): (Array[Long], Array[Long]) = {
    val rows = load(s, "sq8_bounds", path).select("idx", "mn", "w")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    require(rows.nonEmpty, s"$path holds empty SQ8 bounds")
    require(rows.forall(_._3 >= 1L), s"$path holds a non-positive SQ8 width")
    (rows.map(_._2), rows.map(_._3))
  }

  // ---- k-means: (cluster: int, dim: int, c: bigint) + (cluster, n) ----

  def saveKmeans(
      s: SparkSession, cents: Array[Array[Long]], sizes: Array[Long],
      path: String): Unit = {
    import s.implicits._
    val centRows = for {
      (cvec, c) <- cents.zipWithIndex.toSeq
      (v, d) <- cvec.zipWithIndex
    } yield (c, d, v)
    save(centRows.toDF("cluster", "dim", "c"), "kmeans_centroids", s"$path/centroids")
    save(sizes.zipWithIndex.map { case (n, c) => (c, n) }.toSeq.toDF("cluster", "n"),
      "kmeans_sizes", s"$path/sizes")
  }

  def loadKmeans(s: SparkSession, path: String): (Array[Array[Long]], Array[Long]) = {
    val centRows = load(s, "kmeans_centroids", s"$path/centroids")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val sizeRows = load(s, "kmeans_sizes", s"$path/sizes")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val k = sizeRows.length
    require(k > 0 && centRows.nonEmpty, s"$path holds an empty k-means model")
    val dims = centRows.map(_._2).max + 1
    val cents = Array.ofDim[Long](k, dims)
    centRows.foreach { case (c, d, v) => cents(c)(d) = v }
    (cents, sizeRows.map(_._2))
  }

  // ---- distilled quality model: (j, w, mean) — weights PLUS the
  // training corpus's centering means (mean of the bias row is 0);
  // a deployment must center live features with the TRAINING means ----

  def saveQualityModel(
      s: SparkSession, model: graft.functions.QualityModel.Model, path: String): Unit = {
    import s.implicits._
    save(model.weights.zipWithIndex.map { case (w, j) =>
      (j, w, if (j == 0) 0L else model.means(j - 1))
    }.toSeq.toDF("j", "w", "mean"), "quality_model", path)
  }

  def loadQualityModel(s: SparkSession, path: String): graft.functions.QualityModel.Model = {
    val rows = load(s, "quality_model", path).select("j", "w", "mean")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    graft.functions.QualityModel.Model(
      rows.map(_._2), rows.drop(1).map(_._3))
  }

  // ---- BPE merge table: (rank: int, left, right) — rank IS the merge
  // priority the encoder folds in, so load sorts by it ----

  def saveBpeMerges(s: SparkSession, merges: Seq[(String, String)], path: String): Unit = {
    import s.implicits._
    save(merges.zipWithIndex.map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right"), "bpe_merges", path)
  }

  def loadBpeMerges(s: SparkSession, path: String): Seq[(String, String)] =
    load(s, "bpe_merges", path).select("rank", "left", "right").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq.map(t => (t._2, t._3))

  // ---- frozen drift references (the deploy-time monitor artifacts):
  // dists long-form (event_type, cents, c); profiles one row per type ----

  def saveDriftReferences(
      s: SparkSession, dists: Map[String, RefDist],
      profs: Map[String, RefProfile], path: String): Unit = {
    import s.implicits._
    val distRows = for {
      (t, d) <- dists.toSeq
      (cents, c) <- d.sorted
    } yield (t, cents, c)
    save(distRows.toDF("event_type", "cents", "c"), "drift_dists", s"$path/dists")
    save(profs.toSeq.map { case (t, p) => (t, p.bounds, p.refCounts) }
      .toDF("event_type", "bounds", "counts"), "drift_profiles", s"$path/profiles")
  }

  def loadDriftReferences(s: SparkSession, path: String)
      : (Map[String, RefDist], Map[String, RefProfile]) = {
    val dists = load(s, "drift_dists", s"$path/dists")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> RefDist(rows.sortBy(_._2).map(r => (r._2, r._3)).toVector)
      }
    val profs = load(s, "drift_profiles", s"$path/profiles")
      .collect().map { r =>
        r.getString(0) -> RefProfile(
          r.getSeq[Long](1).toVector, r.getSeq[Long](2).toVector)
      }.toMap
    (dists, profs)
  }
}
