package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Dedup, TextAnalysis}

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

  /** The curated corpus for `sfDir` — the LAZY frame (no counting
    * actions), so the driver gate (`curation_pipeline`) and the
    * terminal packing gate (`curation_packed`) pay exactly one job
    * each. Stage composition is [[curate]]'s contract verbatim. */
  def curated(spark: SparkSession, sfDir: String): DataFrame = {
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
