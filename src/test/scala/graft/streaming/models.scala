package graft.streaming

import java.sql.Timestamp

/** Top-level row types for streaming specs (case classes nested in a
  * suite capture the outer instance and break encoders/serialization). */
case class KV(k: String, v: Int)
case class Ev(event_id: Long, user_id: Long, ts: Timestamp, cents: Long)
case class TsVal(v: Int, ts: Timestamp)

object TsUtil {
  /** Exact epoch microseconds — Timestamp.getTime is ms-truncated, the
    * sub-ms part lives in getNanos. */
  def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
}

object StateProbe {
  /** Poll a running query's lastProgress until the state operator's
    * total row count satisfies `expect`; returns the last observed
    * count (-1 if no state-operator progress was ever seen). Used to
    * assert PHYSICAL state eviction, not just output semantics. */
  def awaitStateRows(
      query: org.apache.spark.sql.streaming.StreamingQuery,
      expect: Long => Boolean,
      timeoutMs: Long = 15000): Long = {
    val deadline = System.currentTimeMillis + timeoutMs
    var last = -1L
    while (System.currentTimeMillis < deadline) {
      val p = query.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        last = p.stateOperators.head.numRowsTotal
        if (expect(last)) return last
      }
      Thread.sleep(100)
    }
    last
  }
}
