package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.QualityModel

/** Live DISTILLED-QUALITY monitor — quality_perceptron's serving side:
  * the trained model (weights + the TRAINING corpus's centering means,
  * one [[graft.artifacts.Artifacts.loadQualityModel]] artifact) freezes
  * into the closure, every arriving document is scored with one integer
  * dot product, and each micro-batch emits one cumulative confusion row
  * per touched SOURCE — the per-feed quality dashboard ("is source X's
  * admission rate drifting from the rule?"). State is FOUR longs per
  * source.
  *
  * Upstream of the kernel the stream runs the IDENTICAL raw-feature
  * expressions as the trainer ([[QualityModel.rawLabeledOf]] over
  * [[graft.functions.TextAnalysis]]'s frame-generic stats), and the
  * kernel centers them with the FROZEN training means — so summing the
  * final per-source confusions reproduces the batch gate's global
  * confusion exactly (spec-pinned). A deployment that centered with
  * live means instead would silently drift off the trained boundary;
  * the means travel WITH the weights for exactly this reason. */
object StreamingQuality {

  /** One ingested document's raw integer ingredients (y carried so the
    * monitor can confuse-count against the rule; a pure scorer would
    * drop it). */
  case class QDoc(doc_id: Long, source: String, y: Long, x: Seq[Long])

  case class QualityState(version: Long, tp: Long, fp: Long, tn: Long, fn: Long)

  case class QualityRow(source: String, batch: Long,
      tp: Long, fp: Long, tn: Long, fn: Long)

  /** The frozen model's score of one raw feature vector — bias term
    * uncentered, the rest shifted by the TRAINING means. */
  private[streaming] def scoreOf(m: QualityModel.Model, x: Seq[Long]): Long = {
    var s = m.weights(0) * x(0)
    var j = 1
    while (j < m.weights.length) {
      s += m.weights(j) * (x(j) - m.means(j - 1))
      j += 1
    }
    s
  }

  private[streaming] def qualityUpdate(
      m: QualityModel.Model, idleTimeout: Option[FiniteDuration])(
      source: String, it: Iterator[QDoc],
      state: GroupState[QualityState]): Iterator[QualityRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(QualityState(0L, 0L, 0L, 0L, 0L))
      var (tp, fp, tn, fn) = (st.tp, st.fp, st.tn, st.fn)
      var news = false
      it.foreach { d =>
        news = true
        val pos = scoreOf(m, d.x) > 0L
        if (d.y == 1L) { if (pos) tp += 1 else fn += 1 }
        else { if (pos) fp += 1 else tn += 1 }
      }
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      if (!news) Iterator.empty
      else {
        val next = QualityState(st.version + 1L, tp, fp, tn, fn)
        state.update(next)
        Iterator.single(QualityRow(source, next.version, tp, fp, tn, fn))
      }
    }

  /** Cumulative per-source confusion stream under the frozen model. */
  def monitor(
      docs: Dataset[QDoc], model: QualityModel.Model,
      idleTimeout: Option[FiniteDuration] = None): Dataset[QualityRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        qualityUpdate(model, idleTimeout))
  }

  /** The corpus in the kernel's row shape (the trainer's exact raw
    * feature expressions + the source key), ordered by doc_id. */
  def docFeed(s: SparkSession, dir: String): Array[QDoc] = {
    import s.implicits._
    val stats = graft.functions.TextAnalysis.textStatsOf(
      graft.Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text")),
      keep = Seq("source"))
    QualityModel.rawLabeledOf(stats, keep = Seq("source"))
      .select(col("doc_id"), col("source"), col("y"),
        org.apache.spark.sql.functions.array(
          (0 until QualityModel.Dim).map(j => col(s"x$j")): _*).as("x"))
      .as[QDoc].collect().sortBy(_.doc_id)
  }

  /** Deploy-time artifact build: train on `dir`, persist the model. */
  def saveModel(s: SparkSession, dir: String, path: String): Unit =
    graft.artifacts.Artifacts.saveQualityModel(
      s, QualityModel.train(s, dir)._2, path)
}
