package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, expr, size}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live bigram-LM quality monitor — text_lm_bigram's serving side: a
  * frozen integer bigram model rides into the closure, every arriving
  * document's bigrams score fc2 − fc1 against it, and each micro-batch
  * emits one cumulative row per touched SOURCE ("is source X's
  * language-model fit drifting?"). State is THREE longs per source
  * (version, bigram count, lp sum).
  *
  * Two model sources: the production path is the HEAD artifact
  * ([[loadHeadModel]]) — the trained model's frequency-cutoff top-K
  * truncation, bounded by construction so the in-closure map stays
  * driver-sized at any corpus scale, with out-of-head bigrams falling
  * to the smoothing class exactly as the batch `text_lm_bigram_head`
  * gate states; the FULL model ([[loadModel]]) remains for exact
  * parity with `text_lm_bigram` and is guarded by the store's
  * LmFullLoadCap contract.
  *
  * The frozen-model scoring rule for bigrams the training corpus never
  * saw: a missing (w1, w2) scores fc2 = 0 (count-1 smoothing — the
  * lowest class) and a missing head scores fc1 = 0 — so out-of-model
  * text degrades the mean exactly as an LM filter wants. On the
  * training corpus itself every lookup hits, which is what makes the
  * per-source sums BIT-EQUAL to the batch gate's frame
  * ([[graft.functions.TextAnalysis.lmBigramBySource]], spec-pinned with
  * the model loaded from the artifact store).
  */
object StreamingLmBigram {

  /** One ingested document: its source key and token bigrams. */
  case class LDoc(doc_id: Long, source: String, bgs: Seq[(String, String)])

  /** The frozen model. */
  case class LmModel(fc2: Map[(String, String), Long], fc1: Map[String, Long])

  case class LmState(version: Long, n: Long, sumLp: Long)

  case class LmRow(source: String, batch: Long,
      n_bigrams: Long, sum_lp: Long, lp_mean: Double)

  private[streaming] def lpOf(m: LmModel, w1: String, w2: String): Long =
    m.fc2.getOrElse((w1, w2), 0L) - m.fc1.getOrElse(w1, 0L)

  /** HALF_UP at 6 — the batch gate's round(col, 6). */
  private def mean6(sum: Long, n: Long): Double =
    if (n == 0L) 0.0
    else BigDecimal(sum.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[streaming] def lmUpdate(
      m: LmModel, idleTimeout: Option[FiniteDuration])(
      source: String, it: Iterator[LDoc],
      state: GroupState[LmState]): Iterator[LmRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(LmState(0L, 0L, 0L))
      var n = st.n
      var sum = st.sumLp
      var news = false
      it.foreach { d =>
        news = true
        d.bgs.foreach { case (a, b) => n += 1L; sum += lpOf(m, a, b) }
      }
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      if (!news) Iterator.empty
      else {
        val next = LmState(st.version + 1L, n, sum)
        state.update(next)
        Iterator.single(LmRow(source, next.version, n, sum, mean6(sum, n)))
      }
    }

  /** Cumulative per-source LM-fit stream under the frozen model. */
  def monitor(
      docs: Dataset[LDoc], model: LmModel,
      idleTimeout: Option[FiniteDuration] = None): Dataset[LmRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        lmUpdate(model, idleTimeout))
  }

  /** The corpus in the kernel's row shape. The feed builds bigrams as
    * a zip_with pair form while the batch gate
    * ([[graft.functions.TextAnalysis]]'s lmBigramOcc) uses the native
    * WordNgrams "w1 w2" strings — the two are provably the same
    * bigrams because whitespace tokens contain no spaces, so the
    * string ↔ pair mapping is bijective (StreamingLmBigramSpec pins
    * the equality). Docs with < 2 tokens have no bigrams and are
    * excluded (the gate's filter). */
  def docFeed(s: SparkSession, dir: String): Array[LDoc] = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.Portable.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        expr("""zip_with(slice(toks, 1, size(toks) - 1),
                |        slice(toks, 2, size(toks) - 1),
                |        (a, b) -> struct(a AS _1, b AS _2))""".stripMargin)
          .as("bgs"))
      .as[LDoc].collect().sortBy(_.doc_id)
  }

  /** Deploy-time artifact build: train the model frames on `dir`,
    * persist through the store. */
  def saveModel(s: SparkSession, dir: String, path: String): Unit = {
    val (f2, f1) = graft.functions.TextAnalysis.lmModelFrames(s, dir)
    graft.artifacts.Artifacts.saveLmBigram(f2, f1, path)
  }

  /** Load the frozen FULL model from the store — bounded by the
    * store's [[graft.artifacts.Artifacts.LmFullLoadCap]] contract
    * (vocab-sized; the production monitor serves from the HEAD
    * artifact below, whose size is bounded by construction). */
  def loadModel(s: SparkSession, path: String): LmModel = {
    val (f2, f1) = graft.artifacts.Artifacts.loadLmBigram(s, path)
    LmModel(f2, f1)
  }

  /** An [[LmModel]] from head entries — bg "w1 w2" strings split on
    * the single space (whitespace tokens contain no spaces, so the
    * split is the inverse of WordNgrams' join). Out-of-head lookups
    * fall to class 0 on both sides via [[lpOf]]'s getOrElse — the
    * head model needs NO extra smoothing machinery: truncation and
    * never-seen are the same "lowest class" rule, which is exactly
    * what [[graft.functions.TextAnalysis.lmBigramHead]] states in
    * batch. */
  def headModel(
      h2: Array[(String, Long)], h1: Array[(String, Long)]): LmModel =
    LmModel(
      h2.map { case (bg, fc) =>
        val i = bg.indexOf(' ')
        (bg.substring(0, i), bg.substring(i + 1)) -> fc
      }.toMap,
      h1.toMap)

  /** Deploy-time build of the 100-TB serving artifact: the trained
    * model's frequency-cutoff head (top-[[graft.functions.TextAnalysis.LmHeadK2]]
    * bigrams / top-[[graft.functions.TextAnalysis.LmHeadK1]] heads),
    * persisted through the store. The artifact is headK2 + headK1 rows
    * BY CONSTRUCTION — driver-sized whatever the corpus bigram
    * vocabulary, which the full-model path is not (VERDICT r17
    * item 4). */
  def saveHeadModel(s: SparkSession, dir: String, path: String): Unit = {
    val (h2, h1) = graft.functions.TextAnalysis.lmHeadEntries(s, dir)
    graft.artifacts.Artifacts.saveLmBigramHead(s, h2, h1, path)
  }

  /** Load the frozen serving head from the store — the monitor's
    * production model source. */
  def loadHeadModel(s: SparkSession, path: String): LmModel = {
    val (h2, h1) = graft.artifacts.Artifacts.loadLmBigramHead(s, path)
    headModel(h2, h1)
  }

  /** Trained-in-session model (the spec's reference point). */
  def modelFrom(s: SparkSession, dir: String): LmModel = {
    val (f2, f1) = graft.functions.TextAnalysis.lmModelFrames(s, dir)
    LmModel(
      f2.select("w1", "w2", "fc2").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      f1.select("w1", "fc1").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}
