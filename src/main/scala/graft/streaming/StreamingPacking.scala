package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{Portable, TextAnalysis}

/** Live sequence packing — the streaming side of the batch
  * `pack_sequences` gate, completing the curation family's live story
  * (curate → admit → PACK at ingest time): each arriving document is
  * assigned its start offset in the per-source token stream and the
  * training-sequence id that offset falls in, exactly the batch gate's
  * greedy by-doc_id-order packing.
  *
  * Pure composition over [[RunningReduce.keyed]] (the token-budget
  * discipline): the per-source cumulative token total IS a keyed
  * running reduce with ONE (doc_id, n_tokens, cum) triple of state per
  * source — O(#sources), nothing per document or per sequence. Token
  * counts come from the same `tokens` expression as the batch gate, so
  * per-doc assignments are identical to
  * [[TextAnalysis.packSequencesOf]]'s internal window when docs arrive
  * in doc_id order per source (cross-batch continuation included —
  * spec-pinned in StreamingPackingSpec: streamed assignments grouped
  * per (source, seq_id) equal the batch gate's rows). A downstream
  * consumer groups assignments into physical training sequences; a
  * sequence is CLOSED once the source's cumulative offset passes its
  * end — with in-order feeds that is a watermark-free, purely
  * offset-driven close.
  */
object StreamingPacking {

  /** (doc_id, source, n_tokens, start_offset, seq_id) per arriving
    * doc. */
  def assignments(
      docs: Dataset[StreamingTokenBudget.DocIn],
      seqLen: Long = TextAnalysis.PackSeqLen): DataFrame = {
    require(seqLen >= 1L, "sequence length must be positive")
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
        col("_2._2").as("n_tokens"),
        (col("_2._3") - col("_2._2")).as("start_offset"))
      .withColumn("seq_id", expr(s"start_offset div $seqLen"))
  }
}
