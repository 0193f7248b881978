package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live INGEST QA monitor — the streaming twin of the scan-speed half
  * of the batch data card (`PipelineDemo.sourceCard`): per arriving
  * document the IDENTICAL per-row gate expressions
  * (`PipelineDemo.perRowGateCols` — stateless, so they apply to a
  * stream unchanged) produce the quality/language verdicts, and a
  * source-keyed kernel accumulates cumulative counters, emitting one
  * snapshot row per (touched source, micro-batch). The dedup and
  * contamination columns of the batch card need corpus-level
  * artifacts (drop lists) and stay batch-side; a live feed gets those
  * from StreamingNearDup/StreamingDecontamination instead.
  *
  * State is 4 longs per source — bounded by the source catalog, not
  * traffic. Spec-pinned equal to the batch card's matching columns
  * once the feed is consumed.
  */
object StreamingIngestCard {

  case class Flags(source: String, n_tokens: Long, q_fail: Long, non_en: Long)

  case class CardState(docs: Long, tokens: Long, qfail: Long, nonEn: Long)

  case class CardRow(
      source: String, n_docs: Long, n_tokens: Long,
      n_quality_fail: Long, n_non_en: Long)

  private[streaming] def cardUpdate(
      source: String, it: Iterator[Flags],
      state: GroupState[CardState]): Iterator[CardRow] = {
    var d, t, q, n = 0L
    it.foreach { f =>
      d += 1L; t += f.n_tokens; q += f.q_fail; n += f.non_en
    }
    if (d == 0L) Iterator.empty
    else {
      val st0 = state.getOption.getOrElse(CardState(0L, 0L, 0L, 0L))
      val st = CardState(st0.docs + d, st0.tokens + t, st0.qfail + q, st0.nonEn + n)
      state.update(st)
      Iterator.single(CardRow(source, st.docs, st.tokens, st.qfail, st.nonEn))
    }
  }

  /** Cumulative card stream over a live (source, text) doc feed. */
  def cards(docs: DataFrame): Dataset[CardRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.examples.PipelineDemo.perRowGateCols(docs)
      .select(col("source"), col("n_tokens"),
        when(!col("quality_pass"), 1L).otherwise(0L).as("q_fail"),
        when(col("detected_lang") =!= "en", 1L).otherwise(0L).as("non_en"))
      .as[Flags]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        cardUpdate)
  }
}
