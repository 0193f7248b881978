package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.QuantileSketch

/** Streaming INTER-ARRIVAL monitOR — the live side of the batch gap
  * gate (`Relational.q76Interarrival`): a per-user gap emitter STACKED
  * onto a per-event-type quantile sketch, so every micro-batch emits
  * each touched type's current gap percentiles ("how long do users
  * idle before a purchase?", live). The stack is the q69/q75
  * discipline — both stages are append-mode flatMapGroupsWithState;
  * the first shuffles on user_id, the second on the ≤ |types| type
  * key.
  *
  * Semantics match the batch gate's shape: a gap is the µs since the
  * user's PREVIOUS action of any type, tagged with the CURRENT event's
  * type, over the total (us, event_id) per-user order (arrivals
  * re-sorted per batch; the family's in-order-feed contract applies
  * across batches — [[gapsWatermarked]] is the watermark-driven form
  * that removes the precondition for out-of-order deployments).
  * State: stage 1 keeps (last us, last event_id) —
  * two longs per user; stage 2 keeps one bounded
  * [[QuantileSketch]] per type — O(capacity·log(n/capacity))
  * regardless of stream length, EXACT nearest-rank below capacity
  * (spec-pinned against a driver model in the exact regime). */
object StreamingGaps {

  case class GapRow(event_type: String, gap_us: Long)

  case class GapSnapshot(event_type: String, batch: Long, n: Long,
      quantiles: Seq[Double])

  private[streaming] def gapUpdate(
      idleTimeout: Option[FiniteDuration])(
      user: Long, it: Iterator[StreamingProfile.PEv],
      state: GroupState[(Long, Long)]): Iterator[GapRow] =
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val arrivals = it.toSeq.sortBy(e =>
        (StreamingTransitions.tsMicros(e.ts), e.event_id))
      var last = state.getOption.orNull
      val out = Seq.newBuilder[GapRow]
      arrivals.foreach { e =>
        val us = StreamingTransitions.tsMicros(e.ts)
        if (last != null) out += GapRow(e.event_type, us - last._1)
        last = (us, e.event_id)
      }
      if (arrivals.nonEmpty) state.update(last)
      idleTimeout.foreach(t => state.setTimeoutDuration(t.toMillis))
      out.result().iterator
    }

  /** Per-user gaps, tagged with the current event's type. */
  def gaps(
      events: Dataset[StreamingProfile.PEv],
      idleTimeout: Option[FiniteDuration] = None): Dataset[GapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        gapUpdate(idleTimeout))
  }

  /** Per-type cumulative gap percentiles, one snapshot per touched
    * (type, batch); nearest-rank, exact below `capacity`. */
  def gapQuantiles(
      gapRows: Dataset[GapRow], capacity: Int,
      fractions: Seq[Double]): Dataset[GapSnapshot] = {
    val spark = gapRows.sparkSession
    import spark.implicits._
    gapRows
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (t: String, it: Iterator[GapRow], state: GroupState[(Long, Array[Byte])]) =>
          val (version, sketch) = state.getOption
            .map { case (v, b) => (v, QuantileSketch.deserialize(b)) }
            .getOrElse((0L, new QuantileSketch(capacity)))
          var touched = false
          it.foreach { g => sketch.add(g.gap_us.toDouble); touched = true }
          if (!touched) Iterator.empty
          else {
            val nextVersion = version + 1
            state.update((nextVersion, sketch.serialized))
            Iterator.single(GapSnapshot(t, nextVersion, sketch.n,
              fractions.map(sketch.quantile)))
          }
      }
  }

  /** The stacked pipeline: events → per-user gaps → per-type
    * percentile snapshots. */
  def monitor(
      events: Dataset[StreamingProfile.PEv], capacity: Int = 4096,
      fractions: Seq[Double] = Seq(0.5, 0.9, 0.99),
      idleTimeout: Option[FiniteDuration] = None): Dataset[GapSnapshot] =
    gapQuantiles(gaps(events, idleTimeout), capacity, fractions)

  /** WATERMARK-DRIVEN gap emitter — [[gaps]] without the family's
    * in-order-feed precondition (VERDICT r15 residual 2): a genuinely
    * out-of-order deployment buffers each user's arrivals in state and
    * emits a gap only once the watermark has passed the event, at
    * which point no earlier arrival can still appear (Spark drops
    * sub-watermark rows before the operator — that drop is the
    * standard watermark trade, stated rather than hidden). Emitted
    * gaps are over the total (us, event_id) per-user order exactly as
    * the batch gate computes them, REGARDLESS of arrival order within
    * the `delay` horizon.
    *
    * State per user: the ripening buffer — O(arrival rate × delay),
    * the price of reordering; watermark-bounded, never stream-length —
    * plus the (last us, last event_id) pair. An event-time timer armed
    * on the OLDEST buffered event flushes users the feed went quiet
    * on as soon as the watermark ripens their next gap (no new
    * per-user data needed), so the buffered tail is exactly the
    * sub-`delay` horizon.
    * Spec-pinned against the batch model on a deliberately
    * cross-batch-disordered feed in StreamingGapsSpec. */
  /** r20 (VERDICT r19 item 1 — state-encoder packing): the ripening
    * buffer is three ALIGNED PRIMITIVE/FLAT ARRAYS, not a
    * Seq[case class]. The Catalyst encoder for a Seq[struct] pays a
    * per-element (de)serializer round-trip per user per batch — and the
    * watermark lags a full batch behind the feed, so at any batch
    * boundary the buffers hold roughly one whole batch of events: the
    * encoder was the dominant task cost of the q76 gate (JobProbe: ~26 s
    * of task time over its 8 streaming jobs at sf0.1; even the no-data
    * timer batch re-encoded every user's buffer). Array[Long] encodes as
    * one primitive UnsafeArrayData copy; the type tags stay one
    * Array[String]. Output semantics are bit-identical and pinned by
    * StreamingGapsSpec (cross-batch disorder, timer flush, in-order
    * equivalence) and the q76 oracle gate. */
  case class WmGapState(pus: Array[Long], pid: Array[Long],
      ptyp: Array[String], lastUs: Long, lastId: Long, hasLast: Boolean)

  private[streaming] def wmGapUpdate(
      user: Long, it: Iterator[StreamingProfile.PEv],
      state: GroupState[WmGapState]): Iterator[GapRow] = {
    val st = state.getOption.getOrElse(WmGapState(
      Array.emptyLongArray, Array.emptyLongArray, new Array[String](0),
      0L, 0L, false))
    val arrivals = it.toArray
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val np = st.pus.length
    val total = np + arrivals.length
    // merged view: buffered events first, then this batch's arrivals
    val mus = new Array[Long](total)
    val mid = new Array[Long](total)
    val mty = new Array[String](total)
    System.arraycopy(st.pus, 0, mus, 0, np)
    System.arraycopy(st.pid, 0, mid, 0, np)
    System.arraycopy(st.ptyp, 0, mty, 0, np)
    var i = 0
    while (i < arrivals.length) {
      val e = arrivals(i)
      mus(np + i) = StreamingTransitions.tsMicros(e.ts)
      mid(np + i) = e.event_id
      mty(np + i) = e.event_type
      i += 1
    }
    // ripe ⟺ strictly below the watermark: a future row can still carry
    // ts == watermark (Spark only drops strictly-late rows). Hold keeps
    // merged order (order inside the buffer is irrelevant — ripe events
    // are always sorted before emission).
    var nRipe = 0
    i = 0
    while (i < total) { if (mus(i) < wmUs) nRipe += 1; i += 1 }
    val nHold = total - nRipe
    val ripe = new Array[Int](nRipe)
    val hus = new Array[Long](nHold)
    val hid = new Array[Long](nHold)
    val hty = new Array[String](nHold)
    var r = 0; var h = 0
    i = 0
    while (i < total) {
      if (mus(i) < wmUs) { ripe(r) = i; r += 1 }
      else { hus(h) = mus(i); hid(h) = mid(i); hty(h) = mty(i); h += 1 }
      i += 1
    }
    val ordered = ripe.sortBy(k => (mus(k), mid(k)))
    val out = Seq.newBuilder[GapRow]
    var (lastUs, lastId, hasLast) = (st.lastUs, st.lastId, st.hasLast)
    ordered.foreach { k =>
      if (hasLast) out += GapRow(mty(k), mus(k) - lastUs)
      lastUs = mus(k); lastId = mid(k); hasLast = true
    }
    // unchanged ⟺ nothing arrived and nothing ripened (then hold ==
    // pending element-for-element and the last-triple is untouched) —
    // the same no-op-write condition the old Seq equality check encoded
    if (arrivals.length > 0 || nRipe > 0)
      state.update(WmGapState(hus, hid, hty, lastUs, lastId, hasLast))
    if (nHold > 0) {
      // fire as soon as the watermark passes the OLDEST buffered event
      // (the next to ripen — arming on the newest would hold ripe gaps
      // hostage to the whole buffer); the timer fires when the
      // watermark moves STRICTLY beyond it, which is exactly the
      // event's ripening point, and the max() keeps the timestamp
      // above the current watermark (set-time contract) in the
      // sub-millisecond-tie edge
      var minUs = Long.MaxValue
      i = 0
      while (i < nHold) { if (hus(i) < minUs) minUs = hus(i); i += 1 }
      state.setTimeoutTimestamp(
        math.max(minUs / 1000L, state.getCurrentWatermarkMs() + 1L))
    }
    out.result().iterator
  }

  /** Out-of-order-safe per-user gaps: `events` watermarked on `ts` by
    * `delay` (e.g. "10 minutes"), gaps released in event-time order as
    * the watermark ripens them. Compose with [[gapQuantiles]] for the
    * full monitor. */
  def gapsWatermarked(
      events: Dataset[StreamingProfile.PEv], delay: String): Dataset[GapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(wmGapUpdate)
  }

  /** CORRECTNESS GATE `q76_gaps_watermarked` (VERDICT r16 item 6 —
    * q76's gap algebra under BOUNDED-DISORDER arrival, the B19
    * contract a real deployment runs under): the watermark-driven
    * emitter consumes the whole events corpus in three micro-batches
    * whose arrivals are deterministically SCRAMBLED within 6-hour
    * blocks (a fixed multiplicative permutation of event_id — any
    * order within the horizon gives the same multiset, which is the
    * operator's contract), the 12-hour delay exceeds the block span so
    * nothing is watermark-dropped, gaps ripen progressively (state
    * stays horizon-bounded — a corpus-span delay would buffer the
    * whole feed, measured 6.0 vs 2.x s), and a SENTINEL event ripens
    * the final horizon (the default no-data micro-batch then fires the
    * event-time timers). The collected gap multiset must equal the
    * batch `lag()` order — the DuckDB oracle is that SQL directly,
    * with no streaming machinery on the oracle side. */
  def watermarkGate(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (shuffled, maxMs) = gateFeedMemo.getOrElseUpdate(
      (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s), dir)) {
        val rows = graft.Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .as[StreamingProfile.PEv].collect()
        val blockUs = 6L * 3600 * 1000000
        (rows.sortBy(e =>
          (StreamingTransitions.tsMicros(e.ts) / blockUs,
            e.event_id * 0x9E3779B97F4A7C15L)),
          rows.iterator.map(_.ts.getTime).max)
      }
    val n = shuffled.length
    val slices = Seq(
      shuffled.slice(0, n / 3), shuffled.slice(n / 3, 2 * n / 3),
      shuffled.slice(2 * n / 3, n)).map(_.toIndexedSeq)
    val delayHours = 12L // > the 6-hour scramble block span, with margin
    val sentinel = StreamingProfile.PEv(-1L, -1L,
      new java.sql.Timestamp(maxMs + delayHours * 3600000L + 3600000L),
      "sentinel", 0L)
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamingProfile.PEv]
    val out = gapsWatermarked(stream.toDS(), s"$delayHours hours")
    val sink = s"q76_wm_gate_${System.nanoTime()}"
    // state-partition cap (the StreamingBench discipline): the keyed
    // state op pays per-partition-per-batch overhead, and this gate's
    // feed is a driver-side MemoryStream — wide shuffle buys nothing
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = s.conf.get(partKey)
    s.conf.set(partKey, math.min(8, prevParts.toInt).toString)
    val q = out.toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    val got =
      try {
        (slices :+ IndexedSeq(sentinel)).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
        s.table(sink).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      } finally {
        q.stop()
        s.catalog.dropTempView(sink)
        s.conf.set(partKey, prevParts)
      }
    // r19: `got.toDF.orderBy` planned a 32-way LocalTableScan (leaf
    // parallelism) — 32 tasks each deserializing a slice of the 23k-row
    // collected relation plus a range exchange (measured ~8 s of task
    // time, ~0.4 s wall, for a sort the driver does in ~2 ms). Pre-sort
    // driver-side and hand Spark ONE slice; the plan-level orderBy stays
    // as the output-contract total order (now a single cheap task over
    // already-sorted rows).
    val sorted = got.sortBy(identity)
    s.sparkContext.parallelize(sorted, 1)
      .toDF("event_type", "gap_us").orderBy("event_type", "gap_us")
  }

  /** Memoized scrambled feed for [[watermarkGate]] — the gate runs
    * twice per bench invocation and the collect+sort is pure input
    * prep, not the operator under measurement (the StreamingBench
    * prepare discipline applied to a batch-registered gate). */
  private val gateFeedMemo = new graft.util
    .BoundedMemo[(String, String), (Array[StreamingProfile.PEv], Long)](8)
}
