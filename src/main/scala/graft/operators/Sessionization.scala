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
}
