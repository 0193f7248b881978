package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** INCREMENTAL CDC APPLY — the streaming form of the batch MERGE
  * (`Relational.q42Upsert`): maintain the current row per key as keyed
  * state while a snapshot-then-changes stream plays through, emitting
  * each key's post-batch state — materialized-view maintenance, the
  * deployment shape a warehouse MERGE becomes when the change feed is
  * continuous.
  *
  * Contracts:
  *  - input rows are (key, payload, op): op = "load" | "upsert" |
  *    "delete"; within a micro-batch, changes for one key apply in
  *    deterministic key-grouped arrival order (the MERGE contract of
  *    one change per key per batch is the caller's to keep, exactly as
  *    for batch MERGE);
  *  - every applied change emits the key's new state (deletes emit a
  *    tombstone row with `live = false`), so the LAST emission per key
  *    IS the merged table — StreamingUpsertSpec pins content parity
  *    with the batch q42 output;
  *  - state per key is one row (the current version), the natural
  *    bound of any keyed CDC view; key-hash partitioning spreads it
  *    exactly like the batch full-outer join's shuffle.
  */
object StreamingUpsert {

  case class Change(
      key: Long, custkey: Long, status: String, price: Double, op: String)

  case class Upserted(
      key: Long, custkey: Long, status: String, price: Double,
      version: Long, live: Boolean)

  def apply(changes: Dataset[Change]): Dataset[Upserted] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[Change],
         state: org.apache.spark.sql.streaming.GroupState[Upserted]) =>
          val out = Seq.newBuilder[Upserted]
          it.foreach { c =>
            val version = state.getOption.map(_.version + 1).getOrElse(1L)
            val next = c.op match {
              case "delete" =>
                // tombstone: the key's current version is retired; keep
                // the last payload for audit, flagged dead
                state.getOption
                  .getOrElse(Upserted(key, c.custkey, c.status, c.price,
                    version, live = true))
                  .copy(version = version, live = false)
              case _ =>
                Upserted(key, c.custkey, c.status, c.price, version, live = true)
            }
            state.update(next)
            out += next
          }
          out.result().iterator
      }
  }
}
