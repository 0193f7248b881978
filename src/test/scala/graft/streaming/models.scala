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
