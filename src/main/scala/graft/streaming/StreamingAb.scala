package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Relational

/** Streaming A/B EXPERIMENT monitor — the live twin of the batch
  * chi-square gate (`Relational.q81AbChisq`): users are hash-assigned
  * to arms with the EXACT batch salt (`pmod(h32('exp1|' || user_id),
  * 2)` — sticky, uniform, experiment-independent), per-user state
  * tracks cumulative purchases against the conversion bar, and the
  * kernel emits DELTA rows (arm, Δusers, Δconversions) only when a
  * user first appears or first crosses the bar. The live dashboard is
  * then a running `groupBy(arm): sum` over the delta stream, and the
  * statistic at any instant is [[abChisqPpm]] — the batch gate's exact
  * integer formula, so once the feed is consumed the live counters
  * equal the batch q81 row bit for bit (spec-pinned).
  *
  * State per user is 2 longs; a user already converted never updates
  * state again (RocksDB churn discipline). NO idle eviction by design:
  * arm assignment must stay sticky for the experiment's lifetime — an
  * evicted returning user would re-emit Δusers and corrupt the
  * margins. Experiment population, not traffic, bounds the store
  * (a 100-TB event stream over 100 M users is 1.6 GB of state spread
  * over the cluster).
  */
object StreamingAb {

  /** Sticky salted arm — the batch rule on the driver side
    * (`Md5Hash.hashPair` IS `h32`: md5 bytes 0–3 big-endian). */
  def armOf(user: Long): Long =
    graft.functions.expressions.Md5Hash
      .hashPair(UTF8String.fromString(s"exp1|$user"))._1 % 2L

  /** purchases-so-far + converted latch (converted ⇒ state frozen). */
  case class AbState(purchases: Long, converted: Boolean)

  /** One emission per (user, batch) with news: Δusers ∈ {0,1} on first
    * sight, Δconv ∈ {0,1} on crossing the bar (both can be 1 at once). */
  case class AbDelta(arm: Long, d_users: Long, d_conv: Long)

  private[streaming] def abUpdate(convertBar: Long)(
      user: Long, it: Iterator[StreamingTransitions.Ev],
      state: GroupState[AbState]): Iterator[AbDelta] = {
    var purchases = 0L
    var any = false
    it.foreach { e => any = true; if (e.event_type == "purchase") purchases += 1L }
    if (!any) Iterator.empty
    else {
      val held = state.getOption
      val newUser = held.isEmpty
      val st0 = held.getOrElse(AbState(0L, converted = false))
      if (st0.converted) {
        // latched: nothing can change — skip the state write entirely
        if (newUser) state.update(st0) // unreachable, defensive
        Iterator.empty
      } else {
        val np = st0.purchases + purchases
        val conv = np >= convertBar
        state.update(AbState(np, conv))
        val dU = if (newUser) 1L else 0L
        val dC = if (conv) 1L else 0L
        if (dU == 0L && dC == 0L) Iterator.empty
        else Iterator.single(AbDelta(armOf(user), dU, dC))
      }
    }
  }

  /** Delta stream over a live event feed. */
  def deltas(
      events: Dataset[StreamingTransitions.Ev],
      convertBar: Long = Relational.AbConvertPurchases): Dataset[AbDelta] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        abUpdate(convertBar))
  }

  /** The q81 statistic as driver arithmetic over the running counters —
    * the EXACT batch integer algebra (margins → `e = (rowT·colT) div
    * N`, `Σ ((o−e)²·1e6) div max(e,1)`), so a dashboard computing this
    * over the summed delta stream shows the number the batch backfill
    * will reproduce. Returns (conv_a_ppm, conv_b_ppm, chisq_ppm). */
  def abChisqPpm(nA: Long, nB: Long, convA: Long, convB: Long): (Long, Long, Long) = {
    // max(·,1) guards: "at any instant" includes prefixes where one
    // arm (or both) is still empty — a dashboard must render 0, not
    // crash, there (the batch twin's `div` nulls instead)
    val n = math.max(nA + nB, 1L)
    val convT = convA + convB
    val nonT = (nA - convA) + (nB - convB)
    val eAc = nA * convT / n
    val eAn = nA * nonT / n
    val eBc = nB * convT / n
    val eBn = nB * nonT / n
    // wrap-free split-div cell (Relational.chisqCellPpm == the batch
    // q81 SQL cell): the naive (o−e)²·1e6 product wraps signed 64-bit
    // at |o−e| ≈ 3.03e6 — a deviation a divergent arm in a 100M-user
    // experiment reaches — silently corrupting the statistic
    def cell(o: Long, e: Long): Long = graft.operators.Relational.chisqCellPpm(o, e)
    val chisq = cell(convA, eAc) + cell(nA - convA, eAn) +
      cell(convB, eBc) + cell(nB - convB, eBn)
    (convA * 1000000L / math.max(nA, 1L), convB * 1000000L / math.max(nB, 1L), chisq)
  }
}
