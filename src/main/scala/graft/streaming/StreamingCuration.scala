package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Portable, TextAnalysis}
import graft.functions.expressions.MarkerHits

/** Incremental curation: the streaming twin of
  * `examples/PipelineDemo.curate` for a continuously-ingesting corpus.
  * Every per-document gate of the batch pipeline is a pure expression,
  * so it runs unchanged on a streaming DataFrame; the one genuinely
  * stateful stage — exact dedup — runs bounded-state via
  * [[StreamingDedup.withinWatermark]] on the content digest.
  *
  *   raw stream
  *     → quality gate   (alpha ratio + token count, per-row)
  *     → language gate  (English stopword-marker argmax, per-row)
  *     → PII scrub      (email/IPv4/phone redaction, per-row)
  *     → exact dedup    (md5(text) within the watermark horizon)
  *     → fingerprint    (rolling token hash, per-row)
  *
  * Batch-parity caveats, stated rather than hidden: dedup admits a
  * re-emission once a digest's state ages past the horizon (the
  * bounded-state contract — batch dedup sees the whole corpus), and
  * near-dup is a corpus-global decision that belongs in a periodic
  * batch compaction over the accumulated output (or the stored-index
  * incremental form, `Dedup.dedupIncrementalAgainst`, per micro-batch).
  * Benchmark decontamination and mixture budgets, by contrast, DO run
  * in the per-event path now: the Bloom-bitmap probe is a stateless
  * per-row expression ([[StreamingDecontamination]]; pass `bitmap` to
  * add the stage here) and the per-source token quota is an
  * O(#sources)-state running reduce ([[StreamingTokenBudget]]).
  *
  * At scale this is one stateless scan per micro-batch plus one
  * digest-keyed state store bounded by the horizon's cardinality.
  */
object StreamingCuration {

  /** Quality + language + scrub + dedup + fingerprint over a streaming
    * DataFrame with columns (doc_id, text, source) and event-time column
    * `tsCol`. Output: curated rows with `fingerprint` and `redacted`. */
  /** @param bitmap optional benchmark Bloom bitmap
    *               ([[graft.functions.Dedup.benchmarkBitmap]]): when
    *               given, contaminated docs (≥ `minOverlap` hits) are
    *               dropped before the stateful dedup stage — stateless,
    *               decision parity with the batch bitmap gate. */
  def curate(
      docs: DataFrame,
      tsCol: String,
      horizon: String,
      minTokens: Int = 10,
      minAlphaRatio: Double = 0.6,
      bitmap: Option[Array[Byte]] = None,
      minOverlap: Int = 4): DataFrame =
    StreamingDedup.withinWatermark(
      statelessGates(docs, minTokens, minAlphaRatio, bitmap, minOverlap),
      tsCol, horizon, Seq("digest"))
      .withColumn("fingerprint", Portable.rollingFingerprint(col("toks")))
      .drop("toks", "en_hits")

  /** The stateless per-row prefix of [[curate]] — quality gate,
    * language gate, PII scrub, content digest, optional
    * benchmark-bitmap decontamination. Pure expressions over any frame
    * with a `text` column, so it runs unchanged on a BATCH frame too —
    * which is how the `streaming_curation` bench line derives its
    * exact expected count (batch distinct digests among gate-passers)
    * for the live run. */
  def statelessGates(
      docs: DataFrame,
      minTokens: Int = 10,
      minAlphaRatio: Double = 0.6,
      bitmap: Option[Array[Byte]] = None,
      minOverlap: Int = 4): DataFrame = {
    val toks = Portable.tokens(col("text"))
    val enHits = MarkerHits(col("toks"), TextAnalysis.langMarkers.head._2)
    val scrubbed = docs
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_alpha",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long"))
      .filter(col("n_tokens") >= minTokens &&
        col("n_alpha").cast("double") / col("n_chars") >= minAlphaRatio)
      .withColumn("en_hits", enHits)
      // stream-friendly language gate: the corpus is English-marked when
      // any English stopword marker appears (the full 5-way argmax of
      // TextAnalysis.langId is equally per-row and drops in unchanged)
      .filter(col("en_hits") > 0)
      .withColumn("redacted", redact(col("text")))
      .withColumn("digest", md5(col("text")))
    bitmap.fold(scrubbed)(bm =>
      scrubbed.filter(
        graft.functions.Dedup.bloomOverlapCount(col("text"), bm) < minOverlap))
  }

  /** The pii_scrub gate's redaction chain as a reusable column. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, TextAnalysis.EmailPattern, "[EMAIL]"),
        TextAnalysis.Ipv4Pattern, "[IP]"),
      TextAnalysis.PhonePattern, "[PHONE]")
}
