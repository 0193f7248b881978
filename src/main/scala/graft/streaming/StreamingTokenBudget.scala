package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Streaming token-budget admission: the continuous form of the batch
  * `token_budget_mix` gate (per-source cumulative token quota, docs
  * admitted in doc_id order until the budget is crossed) for a
  * continuously-ingesting corpus — the admission step of data-mixture
  * curation run at ingest time instead of as a nightly batch.
  *
  * Pure composition over [[RunningReduce.keyed]]: the per-source
  * cumulative token sum IS a keyed running reduce whose state is one
  * (doc_id, n_tokens, cum) triple per source — O(#sources) state total,
  * nothing per-document. Token counts come from the same `tokens`
  * expression as the batch gate, so per-doc decisions are identical to
  * `TextAnalysis.tokenBudgetMix` when docs arrive in doc_id order per
  * source (cross-batch continuation included — spec-pinned in
  * StreamingTokenBudgetSpec). As with the batch form, `cum_tokens`
  * accumulates every document's tokens; `action` merely compares it to
  * the budget, so an overflowing source keeps counting (auditable
  * overflow mass) without admitting.
  */
object StreamingTokenBudget {

  case class DocIn(doc_id: Long, source: String, text: String)

  /** (doc_id, source, n_tokens, cum_tokens, action) per arriving doc. */
  def admissions(docs: Dataset[DocIn], budget: Long = 1000L): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counted = docs
      .select(col("doc_id"), col("source"),
        size(Portable.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
    RunningReduce.keyed(counted, (0L, 0L, 0L))(
      _._2, _._1, _._1) {
      case ((_, _, cum), (id, _, n)) => (id, n, cum + n)
    }
      .select(col("_2._1").as("doc_id"), col("_1").as("source"),
        col("_2._2").as("n_tokens"), col("_2._3").as("cum_tokens"),
        when(col("_2._3") <= budget, "admit").otherwise("overflow").as("action"))
  }

  /** [[admissions]] denominated in TRAINED-BPE tokens (the live twin of
    * the batch `token_budget_trained` gate): the merge table is the
    * FROZEN training-time artifact shipped in the closure (the
    * StreamingDrift discipline), per-doc counts come from the native
    * [[graft.functions.expressions.BpeTrainedCount]] eval — a
    * stateless scan-speed column, so the keyed state stays one triple
    * per source. Decisions equal the batch gate on an in-order feed
    * (spec-pinned in StreamingTokenBudgetSpec). */
  def admissionsTrained(
      docs: Dataset[DocIn], merges: Seq[(String, String)],
      budget: Long = graft.functions.TextAnalysis.TrainedBudget): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counted = docs
      .select(col("doc_id"), col("source"),
        graft.functions.expressions.BpeTrainedCount(col("text"), merges)
          .getField("n_bpe_trained").as("n_tokens"))
      .as[(Long, String, Long)]
    RunningReduce.keyed(counted, (0L, 0L, 0L))(
      _._2, _._1, _._1) {
      case ((_, _, cum), (id, _, n)) => (id, n, cum + n)
    }
      .select(col("_2._1").as("doc_id"), col("_1").as("source"),
        col("_2._2").as("n_bpe_trained"), col("_2._3").as("cum_tokens"),
        when(col("_2._3") <= budget, "admit").otherwise("overflow").as("action"))
  }
}
