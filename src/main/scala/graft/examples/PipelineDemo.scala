package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Dedup, TextAnalysis}
import graft.functions.Portable.{h32, rollingFingerprint, tokens}

/** End-to-end training-data curation pipeline — the composition story:
  * every stage is one of the library's operators, chained as plain
  * DataFrame transforms so Catalyst optimizes across stage boundaries
  * (filters merge, column pruning reaches the scan, shared shuffles
  * reuse).
  *
  *   raw documents
  *     → quality gate   (TextAnalysis.textStats: alpha ratio, stopwords)
  *     → language gate  (TextAnalysis.langId: keep detected English)
  *     → exact dedup    (Dedup digest grouping: keep first copy)
  *     → near-dup gate  (Dedup.dedupDropList: drop LSH-verified dupes)
  *     → decontaminate  (Dedup.decontaminate: quarantine eval-set overlap)
  *     → reproducible 10% sample (Dedup.sampleByHash)
  *     → token budget   (TextAnalysis.tokenBudgetMix: per-source quota)
  *     → fingerprint    (TextAnalysis.fingerprint: provenance id)
  *     → sequence pack  (TextAnalysis.packSequencesOf: training slices)
  *
  * Each gate is computed as an INDEPENDENT global decision over the raw
  * corpus and intersected at the end (so e.g. the token budget is
  * admission against the full per-source stream, not the survivors —
  * dropped docs still consume their slot; re-run the budget over the
  * curated output if strict quota filling is required).
  *
  * Run: sbt "runMain graft.examples.PipelineDemo [sfDir]"
  */
object PipelineDemo {

  /** The curated corpus for `sfDir` — the PRODUCTION (fused) plan the
    * driver gates run (`curation_pipeline` / `curation_packed`):
    *
    *  - the four scan-speed gates (quality, language, hash-sample,
    *    fingerprint) ride ONE pass over the corpus as columns — the
    *    per-stage form re-scans and re-shuffles the full fact once per
    *    gate (8 doc_id exchanges), which is exactly what a 100 TB
    *    composition must not do;
    *  - the heavy gates join by their SMALL side: the exact-dup,
    *    near-dup and contamination verdicts are anti-joins against the
    *    drop/quarantine lists (duplicate-rate-sized, AQE broadcasts
    *    them), and the token budget is a semi-join against the
    *    admit list (budget-sized by construction).
    *
    * Set-identical to the per-stage intersection [[curatedByStages]]
    * (the gates are independent global decisions, so intersection
    * order and join direction cannot change the survivor set) —
    * pinned in PipelineDemoSpec; the DuckDB oracle composes the
    * per-stage SQL, so the gate ALSO proves the fusion changed
    * nothing. */
  /** Per-row gate columns over ONE corpus projection (toks projected
    * first: MarkerHits is CodegenFallback — see TextAnalysis.textStats
    * note): stats, detected language, fingerprint, sample-hash — all
    * the scan-speed gate inputs, unfiltered (the card aggregates the
    * flags; [[curated]] filters on them). */
  /** The scan-speed gate columns over ANY frame with a `text` column —
    * stateless transforms, so the live ingest monitor
    * (`StreamingIngestCard`) applies the IDENTICAL expressions to a
    * stream. */
  private[graft] def perRowGateCols(docs: DataFrame): DataFrame =
    TextAnalysis.langHitCols(
      docs.withColumn("toks", tokens(col("text"))))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_alpha",
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long"))
      .withColumn("alpha_ratio",
        round(col("n_alpha").cast("double") / col("n_chars"), 6))
      .withColumn("detected_lang", TextAnalysis.detectedLangCol)
      .withColumn("fingerprint", rollingFingerprint(col("toks")))
      .withColumn("quality_pass",
        col("alpha_ratio") >= 0.6 && col("n_tokens") >= 10)
      .withColumn("sampled", pmod(h32(col("text")), lit(100L)) < 10)

  private[graft] def perRowGates(spark: SparkSession, sfDir: String): DataFrame =
    perRowGateCols(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("source"), col("text")))

  /** Exact-dup drops among ORIGINALS (synthetic +1e15 copies are never
    * group minima, so the original keep set is raw's own digest-group
    * minima): one digest exchange, drop-list-sized output — groups
    * with copies are rare, so collect_list is bounded by multiplicity. */
  private[graft] def exactDropsOf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("dg"))
      .groupBy("dg")
      .agg(min(col("doc_id")).as("keep_id"),
        collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(explode(col("ids")).as("doc_id"), col("keep_id"))
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id")

  private[graft] def nearDropsOf(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.dedupDropList(spark, sfDir)
      .filter(col("action") === "drop").select("doc_id")

  private[graft] def quarantinedOf(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.decontaminate(spark, sfDir)
      .filter(col("action") === "quarantine").select("doc_id")

  /** The fused survivor plan from already-built stage frames — shared
    * by [[curated]] and [[sourceCard]] so the card never builds the
    * drop lists (and the eager decontamination checkpoint behind them)
    * a second time. */
  private def curatedFrom(
      perRow: DataFrame, admitted: DataFrame, exactDrops: DataFrame,
      nearDrops: DataFrame, quarantined: DataFrame): DataFrame =
    perRow
      .filter(col("quality_pass") && col("detected_lang") === "en" && col("sampled"))
      .join(admitted, Seq("doc_id"), "left_semi")
      .join(exactDrops, Seq("doc_id"), "left_anti")
      .join(nearDrops, Seq("doc_id"), "left_anti")
      .join(quarantined, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "fingerprint", "text")

  private def admittedOf(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.tokenBudgetMix(spark, sfDir)
      .filter(col("action") === "admit").select("doc_id")

  def curated(spark: SparkSession, sfDir: String): DataFrame =
    curatedFrom(perRowGates(spark, sfDir), admittedOf(spark, sfDir),
      exactDropsOf(spark, sfDir), nearDropsOf(spark, sfDir),
      quarantinedOf(spark, sfDir))

  /** PER-SOURCE DATA CARD — the QA report a curation pipeline
    * publishes next to the corpus: per source, document and token
    * mass plus every gate's rejection count and the final survivor
    * count. Scale shape: the per-row flags aggregate map-side in the
    * one corpus pass; the drop lists are small frames LEFT-joined as
    * flags (AQE broadcasts them); the survivor count reuses the fused
    * [[curated]] plan. All columns are exact BIGINT counts — hash-gate
    * clean by construction. */
  def sourceCard(spark: SparkSession, sfDir: String): DataFrame = {
    // every stage frame built ONCE and shared between the flag joins
    // and the survivor count (decontamination's eager checkpoint and
    // the LSH drop list must not run twice per card)
    val perRow = perRowGates(spark, sfDir)
    val exactDrops = exactDropsOf(spark, sfDir)
    val nearDrops = nearDropsOf(spark, sfDir)
    val quarantined = quarantinedOf(spark, sfDir)
    val card = perRow
      .join(exactDrops.withColumn("f_exact", lit(1L)), Seq("doc_id"), "left")
      .join(nearDrops.withColumn("f_near", lit(1L)), Seq("doc_id"), "left")
      .join(quarantined.withColumn("f_quar", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(!col("quality_pass"), 1L).otherwise(0L)).as("n_quality_fail"),
        sum(when(col("detected_lang") =!= "en", 1L).otherwise(0L)).as("n_non_en"),
        sum(coalesce(col("f_exact"), lit(0L))).as("n_exact_dup"),
        sum(coalesce(col("f_near"), lit(0L))).as("n_near_dup"),
        sum(coalesce(col("f_quar"), lit(0L))).as("n_quarantined"))
    val survivors = curatedFrom(perRow, admittedOf(spark, sfDir),
      exactDrops, nearDrops, quarantined)
      .groupBy("source").agg(count(lit(1)).as("n_curated"))
    card.join(survivors, Seq("source"), "left")
      .withColumn("n_curated", coalesce(col("n_curated"), lit(0L)))
      .orderBy("source")
  }

  /** The pedagogical per-stage composition — every gate is the
    * registered operator's own frame, intersected on doc_id. Kept as
    * the equality reference for [[curated]] (PipelineDemoSpec pins the
    * two set-identical). */
  private[graft] def curatedByStages(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.documents(spark, sfDir)

    val quality = TextAnalysis.textStats(spark, sfDir)
      .filter(col("alpha_ratio") >= 0.6 && col("n_tokens") >= 10)
      .select("doc_id")
    val english = TextAnalysis.langId(spark, sfDir)
      .filter(col("detected_lang") === "en")
      .select("doc_id")

    val exactKeep = Dedup.dedupExact(spark, sfDir).select("doc_id")
    val nearKeep = Dedup.dedupDropList(spark, sfDir)
      .filter(col("action") === "keep").select("doc_id")

    val clean = Dedup.decontaminate(spark, sfDir)
      .filter(col("action") === "keep").select("doc_id")
    val sampled = Dedup.sampleByHash(spark, sfDir).select("doc_id")
    val admitted = TextAnalysis.tokenBudgetMix(spark, sfDir)
      .filter(col("action") === "admit").select("doc_id")

    raw
      .join(quality, "doc_id")
      .join(english, "doc_id")
      .join(exactKeep, "doc_id")
      .join(nearKeep, "doc_id")
      .join(clean, "doc_id")
      .join(sampled, "doc_id")
      .join(admitted, "doc_id")
      .join(TextAnalysis.fingerprint(spark, sfDir).select("doc_id", "fingerprint"), "doc_id")
      .select("doc_id", "lang", "source", "fingerprint", "text")
  }

  /** The curated corpus for `sfDir`, with per-stage counts. */
  def curate(spark: SparkSession, sfDir: String): (DataFrame, Seq[(String, Long)]) = {
    val raw = Tables.documents(spark, sfDir)

    val quality = TextAnalysis.textStats(spark, sfDir)
      .filter(col("alpha_ratio") >= 0.6 && col("n_tokens") >= 10)
      .select("doc_id")
    val english = TextAnalysis.langId(spark, sfDir)
      .filter(col("detected_lang") === "en")
      .select("doc_id")

    val exactKeep = Dedup.dedupExact(spark, sfDir).select("doc_id")
    val nearKeep = Dedup.dedupDropList(spark, sfDir)
      .filter(col("action") === "keep").select("doc_id")

    val clean = Dedup.decontaminate(spark, sfDir)
      .filter(col("action") === "keep").select("doc_id")
    val sampled = Dedup.sampleByHash(spark, sfDir).select("doc_id")
    val admitted = TextAnalysis.tokenBudgetMix(spark, sfDir)
      .filter(col("action") === "admit").select("doc_id")

    val cur = curated(spark, sfDir)

    // terminal stage: slice the CURATED corpus into training sequences
    // (packing runs over survivors — unlike the admission gates above,
    // which are global decisions over the raw corpus)
    val packed = TextAnalysis.packSequencesOf(cur)

    val counts = Seq(
      "raw" -> raw.count(),
      "quality" -> quality.count(),
      "english" -> english.count(),
      "exact_keep" -> exactKeep.count(),
      "near_keep" -> nearKeep.count(),
      "decontaminated" -> clean.count(),
      "sampled_10pct" -> sampled.count(),
      "budget_admitted" -> admitted.count(),
      "curated" -> cur.count(),
      "packed_sequences" -> packed.count())
    (cur, counts)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (curated, counts) = curate(spark, sfDir)
    counts.foreach { case (stage, n) => println(f"$stage%-14s $n%7d") }
    curated.show(5, truncate = 40)
    spark.stop()
  }
}
