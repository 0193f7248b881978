package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-sessionization: the batch-queryable twin of TTL state eviction
  * (SURVEY B12/C1). A key idle for more than `ttlMicros` of event time
  * starts a new session; the running aggregate restarts per session —
  * exactly the observable behavior of `MapWithStateTTL.eventTime`, which
  * is asserted equal in MapWithStateTTLSpec and property-tested against a
  * reference fold model in SessionizationPropertySpec.
  *
  * Scale: two window passes over the same (key, ts) ordering — Catalyst
  * plans a single sort+shuffle per partition key reused by both windows.
  */
object Sessionization {

  /** Adds `session_id` (1-based per key) and `running_value` (per-session
    * cumulative sum of `value`, DECIMAL(18,2)) to `df`.
    *
    * @param orderCol  total-order tiebreak within equal timestamps
    */
  def runningSumByGap(
      df: DataFrame,
      key: String,
      tsMicros: Column,
      orderCol: String,
      value: Column,
      ttlMicros: Long): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(tsMicros, col(orderCol))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(tsMicros, 1).over(byKey)
    val sessioned = df
      .withColumn("new_sess",
        when(prev.isNull || (tsMicros - prev) > ttlMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
    val bySess = Window.partitionBy(col(key), col("session_id"))
      .orderBy(tsMicros, col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned
      .withColumn("running_value",
        sum(value.cast("decimal(18,2)")).over(bySess).cast("decimal(18,2)"))
      .drop("new_sess")
  }

  /** Skew-proof EXACT twin of [[runningSumByGap]] — the time-slice
    * salting recipe for the one scale limit the plain form has (a single
    * hot key's entire history sorts in one task):
    *
    *  1. events window over (key, slice = ts div sliceMicros) — the hot
    *     key's work splits across its slices;
    *  2. per-slice partial sessions collapse to ONE SUMMARY ROW each, so
    *     the per-key merge pass (plain gap-sessionization over partial
    *     sessions: consecutive summaries merge when start − prev_end ≤
    *     ttl) orders thousands of rows, not the raw event history — the
    *     same events→summaries collapse that makes the as-of salting
    *     recipe work (AsOfJoinSpec "skew recipe");
    *  3. the merged session id and the carry (sum of earlier partials in
    *     the same merged session) join back on (key, slice, slice_sess).
    *
    * Exactness needs `sliceMicros ≥ ttlMicros`: then a qualifying gap
    * (≤ ttl) can only reach the NEXT non-empty slice's first partial
    * session, which is the next summary row in (key, start) order, so
    * the summary-level merge sees every boundary the event-level rule
    * would. Within-slice gaps > ttl already split in pass 1. Equal
    * output (session_id and running_value per event) is spec-pinned
    * against the plain form, including a hot-key case. */
  def runningSumByGapSalted(
      df: DataFrame,
      key: String,
      tsMicros: Column,
      orderCol: String,
      value: Column,
      ttlMicros: Long,
      sliceMicros: Long): DataFrame = {
    require(sliceMicros >= ttlMicros,
      s"sliceMicros ($sliceMicros) must be >= ttlMicros ($ttlMicros) for exactness")
    val d2 = "decimal(18,2)"
    // integer `div`, not `/`: Column./ is double division, and a double
    // round-trip at epoch-microsecond magnitudes can misplace a
    // boundary event into the neighboring slice
    val sliced = df.withColumn("us", tsMicros)
      .withColumn("slice", expr(s"us div ${sliceMicros}L"))
    // pass 1: partial sessions within (key, slice)
    val w1 = Window.partitionBy(col(key), col("slice")).orderBy(col("us"), col(orderCol))
    val cum1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev1 = lag(col("us"), 1).over(w1)
    val parts = sliced
      .withColumn("new_part",
        when(prev1.isNull || (col("us") - prev1) > ttlMicros, 1L).otherwise(0L))
      .withColumn("slice_sess", sum(col("new_part")).over(cum1))
    val wPart = Window.partitionBy(col(key), col("slice"), col("slice_sess"))
      .orderBy(col("us"), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val events = parts.withColumn("run_part", sum(value.cast(d2)).over(wPart).cast(d2))
    // pass 2: gap-merge the per-partial summaries (one row per partial)
    val summaries = events.groupBy(col(key), col("slice"), col("slice_sess"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        sum(value.cast(d2)).cast(d2).as("part_sum"))
    val w2 = Window.partitionBy(col(key)).orderBy(col("start_us"))
    val cum2 = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevEnd = lag(col("end_us"), 1).over(w2)
    val merged = summaries
      .withColumn("new_sess",
        when(prevEnd.isNull || (col("start_us") - prevEnd) > ttlMicros, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum2))
    val wSess = Window.partitionBy(col(key), col("session_id"))
      .orderBy(col("start_us"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = merged
      .withColumn("carry", sum(col("part_sum")).over(wSess))
      .select(col(key), col("slice"), col("slice_sess"), col("session_id"), col("carry"))
    // join back: merged id + carried sum onto every event of the partial
    events
      .join(carries, Seq(key, "slice", "slice_sess"))
      .withColumn("running_value",
        (col("run_part") + coalesce(col("carry"), lit(0).cast(d2))).cast(d2))
      .drop("new_part", "slice", "slice_sess", "run_part", "carry", "us")
  }
}
