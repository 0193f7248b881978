package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming DATA-QUALITY MONITOR — the ingest-side form of the batch
  * audit (`Relational.dqChecks`): every arriving fact is screened
  * against declarative rules and violations stream out as typed rows,
  * so `groupBy(rule).count()` in complete mode is the live violation
  * dashboard (and alerting is a filter on it).
  *
  * Two plan shapes this deliberately exercises that nothing else in the
  * streaming suite does:
  *  - STREAM-STATIC LEFT ANTI JOIN for referential integrity (orphan
  *    facts vs a broadcast dimension snapshot) — stateless: each
  *    micro-batch probes the static relation, no state store at all;
  *  - COMPLETE-MODE AGGREGATION for the running totals (bounded state:
  *    one counter per rule).
  *
  * Scale posture: rules are scan-speed predicates or a broadcast anti
  * probe; violating ROWS never aggregate more than (rule, key) and the
  * dashboard state is O(#rules). A dimension too big to broadcast
  * becomes a keyed-state membership check (the StreamingUpsert shape)
  * instead of a static join. */
object StreamingDq {

  /** A screened fact: event envelope + the payload the rules inspect. */
  case class Fact(event_id: Long, user_id: Long, cents: Long)

  case class Violation(rule: String, event_id: Long)

  /** Cap for the `cents_above_cap` rule (sanity ceiling on a money
    * column — the "absurd value" rule every ingest monitor carries). */
  val CentsCap = 1000000000L

  /** Violation stream for a fact stream against a STATIC user
    * dimension: three rules — referential orphan (anti join),
    * non-positive amount, amount above cap. `validUsers` must be a
    * batch (static) frame with a `user_id` column; Spark broadcasts it
    * into every micro-batch. */
  def violations(facts: Dataset[Fact], validUsers: DataFrame): Dataset[Violation] = {
    val spark = facts.sparkSession
    import spark.implicits._
    val orphan = facts
      .join(broadcast(validUsers.select(col("user_id"))), Seq("user_id"),
        "left_anti")
      .select(lit("orphan_user").as("rule"), col("event_id"))
    val nonPos = facts.filter(col("cents") <= 0L)
      .select(lit("nonpositive_cents").as("rule"), col("event_id"))
    val aboveCap = facts.filter(col("cents") > CentsCap)
      .select(lit("cents_above_cap").as("rule"), col("event_id"))
    orphan.unionByName(nonPos).unionByName(aboveCap).as[Violation]
  }

  /** Running violation totals — complete-mode dashboard over
    * [[violations]]: one row per rule that has ever fired. */
  def totals(v: Dataset[Violation]): DataFrame =
    v.groupBy("rule").agg(count(lit(1)).as("n_violations"))
}
