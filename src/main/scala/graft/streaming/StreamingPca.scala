package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Similarity

/** Live per-class PC1 projection bands — embed_pca_project's streaming
  * side in the frozen-reference form (the StreamingDrift/StreamingAuc
  * discipline): the principal axis trains at deploy time
  * ([[Similarity.pcaPowerTrain]] — 64 longs, the training-time
  * artifact) and freezes into the monitor's closure; the live stream
  * then keeps FOUR longs of state per label (n, sum, min, max of the
  * fixed-point projection) and emits one cumulative band row per
  * (touched label, micro-batch). An embedding drifting off the
  * corpus's dominant axis shows up as a migrating band long before a
  * full spectral re-fit would run.
  *
  * Determinism: the kernel quantizes exactly like the batch gate
  * (HALF_UP at [[Similarity.PcaEScale]] — BigDecimal, matching Spark
  * SQL `round`) and the mean uses the same sign-safe truncating
  * division, so once the feed is consumed the final row per label is
  * BIT-EQUAL to batch [[Similarity.embedPcaProject]] (spec-pinned) —
  * the dashboard shows the number the batch backfill will reproduce.
  *
  * State: O(1) per label (sum_proj holds to ~2.8e8 vectors/label at
  * |proj| ≤ 3.2e10 — beyond that, shard labels or re-shift the axis).
  * `idleTimeout` optionally evicts idle labels (a returning label
  * restarts cold — the StreamingDrift trade, stated).
  */
object StreamingPca {

  case class VecIn(vec_id: Long, label: Int, embedding: Seq[Float])

  case class BandState(version: Long, n: Long, sum: Long, min: Long, max: Long)

  case class BandRow(label: Int, batch: Long, n: Long, mean_proj: Long,
      min_proj: Long, max_proj: Long)

  /** One vector's fixed-point quantization — the same integers the
    * batch gate's quantized frame produces (HALF_UP at
    * [[Similarity.PcaEScale]], matching Spark SQL `round`). */
  private[streaming] def quantize(emb: Seq[Float]): Array[Long] = {
    val q = new Array[Long](emb.length)
    var i = 0
    while (i < q.length) {
      q(i) = java.math.BigDecimal.valueOf(emb(i).toDouble * Similarity.PcaEScale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      i += 1
    }
    q
  }

  private[streaming] def dotQ(q: Array[Long], axis: Array[Long]): Long = {
    var i = 0
    var dot = 0L
    while (i < axis.length) { dot += q(i) * axis(i); i += 1 }
    dot
  }

  /** Fixed-point projection of one raw vector onto the frozen axis. */
  private[streaming] def projOf(axis: Array[Long], emb: Seq[Float]): Long =
    dotQ(quantize(emb), axis)

  /** Sign-safe truncating mean — Spark `DIV` / DuckDB `//`-on-abs. */
  private[streaming] def meanOf(sum: Long, n: Long): Long =
    if (sum < 0) -((-sum) / n) else sum / n

  private def update(axis: Array[Long], idleTimeout: Option[FiniteDuration])(
      label: Int, it: Iterator[VecIn],
      state: GroupState[BandState]): Iterator[BandRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(BandState(0L, 0L, 0L, Long.MaxValue, Long.MinValue))
      var n = st.n
      var sum = st.sum
      var lo = st.min
      var hi = st.max
      it.foreach { v =>
        val p = projOf(axis, v.embedding)
        n += 1L; sum += p
        if (p < lo) lo = p
        if (p > hi) hi = p
      }
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      if (n == st.n) Iterator.empty // timer-only invocation
      else {
        val next = BandState(st.version + 1L, n, sum, lo, hi)
        state.update(next)
        Iterator.single(BandRow(label, next.version, n, meanOf(sum, n), lo, hi))
      }
    }

  /** Cumulative projection-band stream: one row per
    * (touched label, micro-batch). */
  def bands(
      vecs: Dataset[VecIn], axis: Array[Long],
      idleTimeout: Option[FiniteDuration] = None): Dataset[BandRow] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    vecs
      .groupByKey(_.label)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        update(axis, idleTimeout))
  }

  /** Deploy-time axis: the trained iterate as longs (memoized per
    * (session, dir) inside pcaPowerTrain — bounded, 64 longs). */
  def axisFrom(s: SparkSession, dir: String): Array[Long] =
    Similarity.pcaPowerTrain(s, dir)._1.map(_.toLong)

  // ---------------------------------------------------------------------
  // TOP-M twin (embed_pca_project_topm's live side): one frozen axis
  // PER COMPONENT, 4·m longs of state per label, m band rows per
  // (touched label, batch). Each arrival quantizes ONCE and dots every
  // axis — the streaming analogue of the batch card's
  // one-scan-m-expressions shape. Final rows per (component, label)
  // BIT-EQUAL to batch embedPcaProjectTopm (spec-pinned).
  // ---------------------------------------------------------------------

  case class BandCell(n: Long, sum: Long, min: Long, max: Long)

  case class TopmState(version: Long, cells: Seq[BandCell])

  case class TopmRow(label: Int, batch: Long, component: Long, n: Long,
      mean_proj: Long, min_proj: Long, max_proj: Long)

  private def updateTopm(
      axes: Seq[Array[Long]], idleTimeout: Option[FiniteDuration])(
      label: Int, it: Iterator[VecIn],
      state: GroupState[TopmState]): Iterator[TopmRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val st = state.getOption.getOrElse(TopmState(0L,
        Seq.fill(axes.length)(BandCell(0L, 0L, Long.MaxValue, Long.MinValue))))
      val cells = st.cells.toArray
      var news = false
      it.foreach { v =>
        news = true
        val q = quantize(v.embedding)
        var c = 0
        while (c < cells.length) {
          val p = dotQ(q, axes(c))
          val cell = cells(c)
          cells(c) = BandCell(cell.n + 1L, cell.sum + p,
            math.min(cell.min, p), math.max(cell.max, p))
          c += 1
        }
      }
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      if (!news) Iterator.empty // timer-only invocation
      else {
        val next = TopmState(st.version + 1L, cells.toVector)
        state.update(next)
        cells.iterator.zipWithIndex.map { case (cell, c) =>
          TopmRow(label, next.version, c + 1L, cell.n,
            meanOf(cell.sum, cell.n), cell.min, cell.max)
        }
      }
    }

  /** Cumulative top-m projection-band stream: m rows per
    * (touched label, micro-batch). */
  def bandsTopm(
      vecs: Dataset[VecIn], axes: Seq[Array[Long]],
      idleTimeout: Option[FiniteDuration] = None): Dataset[TopmRow] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    require(axes.nonEmpty && axes.map(_.length).distinct.length == 1,
      "axes must be non-empty and share one dim")
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    vecs
      .groupByKey(_.label)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        updateTopm(axes, idleTimeout))
  }

  /** Deploy-time axes: the m trained deflation iterates as longs
    * (memoized inside pcaTopMTrain — bounded, m·dim longs). */
  def axesFrom(s: SparkSession, dir: String): Seq[Array[Long]] =
    Similarity.pcaTopMTrain(s, dir).map(_._1.map(_.toLong))
}
