package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingAuc.RefDist
import graft.streaming.StreamingDrift.RefProfile

/** Live DRIFT PANEL — report_drift_panel's streaming side, and the
  * composition argument made operational: the three drift monitors
  * (chi-square, KS, U/AUC) don't need three state artifacts — ONE
  * value-domain-bounded histogram per type subsumes them all. The
  * chi bins derive from the histogram against the frozen decile
  * bounds, the KS gap walks the merged support, and the doubled
  * pair-win count folds `hist(v)·winsX2Of(v)` — every statistic is
  * recomputed exactly from the same state at each emission, so the
  * final row per type is BIT-EQUAL to the batch panel
  * ([[graft.operators.Relational.reportDriftPanel]], spec-pinned).
  *
  * Emission: one cumulative row per (touched type, micro-batch) with
  * all three statistics — the dashboard row the batch backfill will
  * reproduce. Types emit only when present in BOTH frozen artifacts
  * (the batch panel's inner joins drop the others identically).
  *
  * Per-batch work per touched type is O(D log D) in the type's
  * distinct value count — the KS monitor's bound; the chi/AUC folds
  * ride the same walk's O(D). State: the one histogram (the same size
  * class as the frozen reference itself). `idleTimeout` optionally
  * evicts idle types (restart-cold trade, stated). */
object StreamingDriftPanel {

  case class PanelState(version: Long, hist: Map[Long, Long])

  case class PanelRow(event_type: String, batch: Long, n_ref: Long,
      n_live: Long, ks_ppm: Long, u_live_x2: Long, auc_ppm: Long,
      chisq_ppm: Long)

  /** All three statistics from one histogram + the two frozen
    * artifacts. */
  private[streaming] def panelOf(
      dist: RefDist, prof: RefProfile,
      hist: collection.Map[Long, Long]): (Long, Long, Long, Long, Long) = {
    val (nLive, ks) = StreamingKs.ksPpm(dist, hist)
    var winsX2 = 0L
    val o = Array.fill(prof.refCounts.length)(0L)
    hist.foreach { case (v, c) =>
      winsX2 += c * dist.winsX2Of(v)
      val bin = prof.bounds.count(_ < v)
      o(bin) += c
    }
    val chisq = StreamingDrift.chisqPpm(prof, o.toVector)
    (nLive, ks, winsX2, StreamingAuc.aucPpm(dist.nRef, nLive, winsX2), chisq)
  }

  private[streaming] def panelUpdate(
      dists: Map[String, RefDist], profs: Map[String, RefProfile],
      idleTimeout: Option[FiniteDuration])(
      eventType: String, it: Iterator[StreamingProfile.PEv],
      state: GroupState[PanelState]): Iterator[PanelRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else (dists.get(eventType), profs.get(eventType)) match {
      case (Some(dist), Some(prof)) =>
        val st = state.getOption.getOrElse(PanelState(0L, Map.empty))
        var hist = st.hist
        var news = false
        it.foreach { ev =>
          hist = hist.updated(ev.cents, hist.getOrElse(ev.cents, 0L) + 1L)
          news = true
        }
        idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
        if (!news) Iterator.empty
        else {
          val next = PanelState(st.version + 1L, hist)
          state.update(next)
          val (nLive, ks, winsX2, auc, chisq) = panelOf(dist, prof, hist)
          Iterator.single(PanelRow(
            eventType, next.version, dist.nRef, nLive, ks, winsX2, auc, chisq))
        }
      case _ => Iterator.empty // dropped by the batch panel's inner joins too
    }

  /** Cumulative live panel stream: one row per
    * (touched type, micro-batch), all three statistics per row. */
  def panel(
      events: Dataset[StreamingProfile.PEv],
      dists: Map[String, RefDist], profs: Map[String, RefProfile],
      idleTimeout: Option[FiniteDuration] = None): Dataset[PanelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        panelUpdate(dists, profs, idleTimeout))
  }

  /** Both frozen artifacts in one deploy-time build. */
  def referencesFrom(s: SparkSession, dir: String)
      : (Map[String, RefDist], Map[String, RefProfile]) =
    (StreamingAuc.referenceFrom(s, dir), StreamingDrift.referenceFrom(s, dir))

  /** Train both references on `dir` and persist them — the "frozen at
    * deploy time" contract finally freezes a REAL stored artifact: the
    * monitor deployment loads what this wrote, it does not retrain. */
  def saveReferences(s: SparkSession, dir: String, path: String): Unit = {
    val (dists, profs) = referencesFrom(s, dir)
    graft.artifacts.Artifacts.saveDriftReferences(s, dists, profs, path)
  }

  /** Both frozen artifacts from a STORED deploy (see [[saveReferences]]);
    * the monitor path is identical to the trained-in-session one —
    * ArtifactsSpec pins bit-equal panel rows. */
  def referencesFromArtifact(s: SparkSession, path: String)
      : (Map[String, RefDist], Map[String, RefProfile]) =
    graft.artifacts.Artifacts.loadDriftReferences(s, path)
}
