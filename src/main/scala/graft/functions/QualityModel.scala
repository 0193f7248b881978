package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LEARNED QUALITY FILTER (distillation): train a linear scorer that
  * reproduces the pipeline's composite DOUBLE-precision quality rule
  * (`quality_score ≥ τ`, the text_stats gate's alpha+stopword
  * composite at the corpus median) from cheap INTEGER features — the
  * production pattern where an admission filter is distilled into one
  * broadcast weight vector so scoring becomes a single codegen'd dot
  * product at scan speed (the fastText-style classifier every LLM
  * data pipeline carries). The boundary is near-linear in the ppm
  * features but not identical (the rule rounds two double ratios
  * before summing), so the trained model's confusion matrix reports a
  * genuine, non-trivial fit.
  *
  * The trainer is a BATCH-UPDATE PERCEPTRON in pure BIGINT algebra
  * (the q61/PCA fixed-point recipe): per round ONE scan computes every
  * doc's margin y·(w·x) against the broadcast literal weights and
  * collapses map-side into (misclassified count, Σ y·x per dim) — a
  * (dim+2)-sum all-reduce; the driver update is
  * w += sdiv(Σ y·x, max(cnt, 1)) with the sign-safe truncating
  * division both engines share. Everything is order-independent
  * integer arithmetic, so the whole training run replays bit-for-bit
  * in DuckDB as unrolled single-row weight CTEs — a hash-checkable
  * TRAINED classifier, like the k-means gate.
  *
  * Features (all integers; every expression is already pinned by the
  * text_stats / curation gates): bias 1000, token count, alpha ppm,
  * stopword ppm (the `h_en` marker count over tokens), mean token
  * length in millichars, BPE-ish token count.
  *
  * Scale: the feature frame is one corpus scan (localCheckpointed —
  * each round re-reads integers, not text); driver state is
  * [[Dim]] longs; training cost is [[Rounds]] all-reduces. Scoring a
  * 100 TB corpus with the trained weights is a map stage. */
object QualityModel {

  val Rounds = 12
  val Dim = 6
  val BiasX = 1000L

  /** The rule being distilled: the text_stats composite at the corpus
    * median (splits the gate corpora ~50/50 at every SF). */
  val QualityTau = 0.884

  /** RAW label + feature columns over any text-stats frame (the
    * frame-generic half the live monitor shares — `keep` columns pass
    * through): y = ±1 on `quality_score ≥ τ`; features = bias, token
    * count, alpha ppm, stopword ppm, mean token length in millichars,
    * BPE-ish token count. The trainer CENTERS them ([[centered]]) —
    * that is what makes the fixed-step batch perceptron converge: on
    * the raw all-positive features the averaged update oscillates
    * between the two constant predictors (measured 0.47-0.53
    * accuracy); centered, the same loop reaches ~0.98+ (the means pass
    * is one extra all-reduce, itself integer-exact). Rides
    * [[TextAnalysis.textStats]]'s expressions, so engine parity of
    * every ingredient (including the double composite in the label)
    * is gate-proven. */
  private[graft] def rawLabeledOf(stats: DataFrame, keep: Seq[String] = Nil): DataFrame =
    stats.select(
      Seq(
        col("doc_id"),
        when(col("quality_score") >= QualityTau, 1L).otherwise(-1L).as("y"),
        lit(BiasX).as("x0"),
        col("n_tokens").as("x1"),
        expr("(n_alpha * 1000000) div greatest(n_chars, 1)").as("x2"),
        expr("(n_stopwords * 1000000) div greatest(n_tokens, 1)").as("x3"),
        expr("(n_chars * 1000) div greatest(n_tokens, 1)").as("x4"),
        col("n_bpe_tokens").as("x5")) ++ keep.map(col): _*)

  /** The integer feature means (j = 1..Dim-1) — centering stats are
    * PART OF the trained model (a deployment must center live features
    * with the TRAINING corpus's means, not its own). */
  private[graft] def featureMeans(raw: DataFrame): Array[Long] = {
    val m = raw.agg(
      count(lit(1)).as("n"),
      (1 until Dim).map(j => sum(col(s"x$j")).as(s"s$j")): _*).head()
    val n = m.getLong(0)
    // raw features are non-negative, so truncating / == floor here
    (1 until Dim).map(j => m.getLong(j) / n).toArray
  }

  private[graft] def centered(raw: DataFrame, means: Array[Long]): DataFrame =
    raw.select(
      col("doc_id") +: col("y") +: col("x0") +:
        (1 until Dim).map(j =>
          (col(s"x$j") - lit(means(j - 1))).as(s"x$j")): _*)

  private[graft] def labeled(s: SparkSession, dir: String): DataFrame =
    train(s, dir)._1

  /** The deployable model: trained weights plus the training corpus's
    * centering means — both ship together (the live monitor and the
    * artifact store carry the pair). */
  case class Model(weights: Array[Long], means: Array[Long]) {
    require(weights.length == Dim && means.length == Dim - 1,
      s"model geometry ${weights.length}/${means.length} != $Dim")
  }

  private def dot(w: Array[Long]) =
    (0 until Dim).map(j => col(s"x$j") * lit(w(j))).reduce(_ + _)

  /** The fixed-round batch-perceptron loop over a labeled frame —
    * returns the trained weights. Parameterized by the frame so the
    * spec can replay it at a second feature geometry. */
  private[graft] def trainFrame(lab: DataFrame, rounds: Int = Rounds): Array[Long] = {
    var w = Array.fill(Dim)(0L)
    for (_ <- 1 to rounds) {
      val mis = (col("y") * dot(w)) <= 0L
      val aggs = sum(when(mis, 1L).otherwise(0L)).as("cnt") +:
        (0 until Dim).map(j => sum(when(mis, col("y") * col(s"x$j"))).as(s"g$j"))
      val row = lab.agg(aggs.head, aggs.tail: _*).head()
      val cnt = math.max(row.getLong(0), 1L)
      w = w.zipWithIndex.map { case (wj, j) =>
        val g = if (row.isNullAt(j + 1)) 0L else row.getLong(j + 1)
        wj + (if (g < 0) -((-g) / cnt) else g / cnt)
      }
    }
    w
  }

  private[graft] def train(s: SparkSession, dir: String): (DataFrame, Model) =
    trainMemo.getOrElseUpdate(
      (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s), dir)) {
        val raw = rawLabeledOf(TextAnalysis.textStats(s, dir))
        val means = featureMeans(raw)
        val lab = centered(raw, means).localCheckpoint()
        (lab, Model(trainFrame(lab), means))
      }

  private val trainMemo =
    new graft.util.BoundedMemo[(String, String), (DataFrame, Model)](8)

  /** GATE `quality_perceptron`: the trained weight vector plus the
    * final confusion counts of `score > 0` against the rule-based
    * label — one row per dimension, confusion repeated per row (the
    * PCA gain convention). */
  def qualityPerceptron(s: SparkSession, dir: String): DataFrame = {
    val (lab, model) = train(s, dir)
    confusionOf(lab, model)
  }

  /** Confusion of `score > 0` under an EXPLICIT model against the
    * rule-based label over a centered frame, one row per dimension
    * (the gate's output shape) — the scoring half
    * [[qualityPerceptron]] (which passes the memoized training frame)
    * and the deploy gate (which re-centers live features with the
    * LOADED model's means — the deployment contract: centering
    * statistics travel inside the model) share. */
  private def confusionOf(lab: DataFrame, model: Model): DataFrame = {
    val sp = lab.sparkSession
    import sp.implicits._
    val score = dot(model.weights)
    val conf = lab.agg(
      sum(when(col("y") === 1L && score > 0L, 1L).otherwise(0L)).as("tp"),
      sum(when(col("y") === -1L && score > 0L, 1L).otherwise(0L)).as("fp"),
      sum(when(col("y") === -1L && score <= 0L, 1L).otherwise(0L)).as("tn"),
      sum(when(col("y") === 1L && score <= 0L, 1L).otherwise(0L)).as("fn")).head()
    val (tp, fp, tn, fn) =
      (conf.getLong(0), conf.getLong(1), conf.getLong(2), conf.getLong(3))
    model.weights.zipWithIndex
      .map { case (wj, j) => (j.toLong, wj, tp, fp, tn, fn) }
      .toSeq.toDF("j", "w", "tp", "fp", "tn", "fn")
      .orderBy("j")
  }

  /** GATE `quality_perceptron_deploy` — the train-once/deploy-many
    * contract for the distilled quality filter (the ann_ivf_deploy
    * discipline, VERDICT r17 item 5): train, persist weights + the
    * training corpus's centering means through the artifact store,
    * load, and score from the LOADED model. Oracle = quality_perceptron's
    * SQL, so a store round-trip can never silently perturb a weight or
    * a mean (either would flip confusion cells). The temp dir is
    * deleted eagerly — loadQualityModel collects the (Dim+Dim−1)-long
    * model before the scoring plan is built. */
  def qualityPerceptronDeploy(s: SparkSession, dir: String): DataFrame = {
    val (_, model) = train(s, dir)
    val loaded = graft.util.TempArtifacts.withTempDir("graft-quality-deploy-") { p =>
      graft.artifacts.Artifacts.saveQualityModel(s, model, p)
      graft.artifacts.Artifacts.loadQualityModel(s, p)
    }
    confusionOf(
      centered(rawLabeledOf(TextAnalysis.textStats(s, dir)), loaded.means),
      loaded)
  }
}
