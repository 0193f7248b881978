package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query on
  * SPARK_GRAFT_SF_DIR, prints the full result JSON line, writes it to a
  * durable file, then prints a compact (<1.9 KB) summary line LAST so the
  * driver's 2000-char stdout-tail capture always parses (see print site).
  *
  * Measurement discipline:
  *  - `noop` datasource write forces full materialization of every
  *    operator (a bare count() can let Catalyst prune the very columns a
  *    query exists to compute);
  *  - fixed alphabetical order so per-round numbers are comparable;
  *  - AQE on, shuffle partitions = cores, matching the 100 TB posture of
  *    sizing partitions to parallelism rather than the 200 default.
  */
object Bench {

  /** Clean-machine min-of-N record of [[StreamingBench.controlPipeline]]
    * (fixed 20k-event synthetic feed, sfDir-independent) — re-pinned
    * round 11 AFTER the 24g-default-heap change (5 near-idle isolated
    * JVM runs, min 1.663, spread 1.66-1.92; the prior 1.57 was pinned
    * under the 8g heap); see BASELINE.md. Isolated-run minimum — the
    * control lands LOWER in full-suite position (~1.4 s) because the
    * suite's earlier lines warm the streaming machinery; that bias is
    * stable round-over-round, which is what adjudication needs. */
  val StreamControlBaselineSec = 1.66

  /** Retry trigger threshold: a streaming line whose min-of-2 exceeds
    * this factor × its healthy anchor gets extra in-process attempts.
    * SPARK_GRAFT_RETRY_FACTOR overrides (diagnostics: 0 forces a retry
    * on every anchored line, huge disables). */
  def retryFactor: Double =
    sys.env.get("SPARK_GRAFT_RETRY_FACTOR").map(_.toDouble).getOrElse(1.5)

  /** Healthy full-suite anchors per streaming line — the round-16
    * grand-closing run (commit f6bac45: 228 lines, near-idle controls
    * 0.68×/0.65×), with the three round-16 chase-list lines re-pinned
    * to their round-17 ISOLATED min-of-3 values (BASELINE.md). Used
    * ONLY to trigger ambient-variance retries, never for grading —
    * BASELINE.md first-green rows remain the 2× adjudication record.
    * A new line without an anchor simply never retries (its first
    * round records its anchor for the next). */
  val StreamHealthyAnchorSec: Map[String, Double] = Map(
    "streaming_ab" -> 1.295, "streaming_anomaly" -> 0.481,
    "streaming_attribution" -> 1.323, "streaming_auc" -> 1.221,
    "streaming_cdc_upsert" -> 2.059, "streaming_count_min" -> 0.991,
    "streaming_count_windows" -> 1.294, "streaming_curation" -> 1.063,
    "streaming_daily_close" -> 1.192, "streaming_decontaminate" -> 1.098,
    "streaming_dedup" -> 2.797, "streaming_dq" -> 0.721,
    "streaming_drift" -> 2.574, "streaming_drift_panel" -> 1.264,
    "streaming_enrich" -> 0.982, "streaming_ewma" -> 2.009,
    "streaming_funnel" -> 1.314, "streaming_funnel_latency" -> 1.24,
    "streaming_funnel_rocksdb" -> 1.37, "streaming_gaps" -> 2.28,
    "streaming_gaps_watermarked" -> 2.24,
    "streaming_incremental_dedup" -> 4.242, // r17 isolated re-pin
    "streaming_ingest_card" -> 1.461, // r17 isolated re-pin
    "streaming_interval_join" -> 3.092,
    "streaming_interval_join_rocksdb" -> 4.425,
    "streaming_kmv" -> 0.876, "streaming_kmv_rocksdb" -> 1.021,
    "streaming_kmv_rocksdb_changelog" -> 0.924, "streaming_ks" -> 1.18,
    "streaming_ndv" -> 0.921, "streaming_near_dup" -> 1.752,
    "streaming_packing" -> 0.856, "streaming_paths" -> 1.472,
    "streaming_paths_agg" -> 2.616, "streaming_pca" -> 0.834,
    "streaming_pca_topm" -> 1.009, // r17 isolated
    "streaming_profile_rocksdb" -> 1.599,
    "streaming_profile_warm_rocksdb" -> 1.234,
    "streaming_quality" -> 0.915, // r17 isolated
    "streaming_quantiles" -> 1.08, "streaming_recent_rocksdb" -> 1.771,
    "streaming_retention" -> 1.266, "streaming_rrf" -> 1.148, // r17 isolated
    "streaming_running_reduce" -> 1.386,
    "streaming_semantic_dedup" -> 1.039,
    "streaming_semantic_dedup_rocksdb" -> 1.199,
    "streaming_session_funnel" -> 2.119,
    "streaming_session_window" -> 4.271, "streaming_stickiness" -> 1.299,
    "streaming_temporal_join" -> 1.378, "streaming_token_budget" -> 0.911,
    "streaming_token_budget_trained" -> 0.823, "streaming_topk" -> 0.923,
    "streaming_transitions" -> 1.814, // r17 isolated re-pin
    "streaming_ttl_hotkey" -> 4.33, "streaming_ttl_pipeline" -> 1.993,
    "streaming_ttl_rocksdb" -> 2.182, "streaming_tws_rocksdb" -> 2.443,
    "streaming_wau" -> 1.388,
    // r18: the two lines the r17 guard audit found unanchored —
    // streaming_lm_bigram from its first-round values (1.375 in-suite
    // r17 continuation record / 1.554 isolated), dedup_pipeline_cold
    // from the r17 grand closing (it rides the streaming segment's
    // retry loop, so an anchor here is all it needs)
    "streaming_lm_bigram" -> 1.375, "dedup_pipeline_cold" -> 1.565)

  /** Healthy full-suite anchors for the HEAVY BATCH lines (VERDICT r17
    * item 1) — before r18, only streaming lines could retry, which is
    * exactly how q55_triangles=65.8 s (12× its in-suite band) entered
    * the official BENCH_r17.json when the driver's sweep ran under
    * 4.47× batch-control ambient. Sources: the r17 grand closing
    * (commit 3e4be90 — 236 lines, controls 0.59×/0.71×) for the lines
    * it carried; the r17 continuation record (703ccb2, 0.79×/0.80×)
    * for lines added after it, including the graph family at its
    * round-18 re-pinned machine state (BASELINE.md r18 adjudication:
    * isolated min-of-3 q55 5.34 / q61 4.33 / q70 4.66 / q76 4.67 at
    * 1.09-1.31× controls — ambient-proportional, data+code unchanged);
    * BASELINE.md isolated rows for the three newest gates. Anchors
    * trigger retries ONLY — BASELINE.md first-green rows remain the 2×
    * adjudication record. Lines under ~1.5 s clean are unanchored: an
    * ambient spike there can't fake a meaningful regression. */
  val BatchHealthyAnchorSec: Map[String, Double] = Map(
    // graph/iterative family (703ccb2 in-suite, r18 re-pin adjudicated)
    "q55_triangles" -> 5.47, "q61_pagerank" -> 4.896,
    "q70_kcore" -> 5.078, "q76_gaps_watermarked" -> 5.359,
    "q73_bfs_reach" -> 2.757,
    // column-profile family (grand closing)
    "column_histogram_depth" -> 3.587, "column_histogram_depth_band" -> 3.546,
    "column_profile" -> 2.571, "column_histogram" -> 1.996,
    "column_profile_approx" -> 1.948, "column_winsorize" -> 1.722,
    // dedup family (grand closing; spans/split from 703ccb2)
    "dedup_canonical" -> 2.518, "dedup_jaccard" -> 1.685,
    "dedup_components" -> 1.623, "dedup_components_minlabel" -> 1.665,
    "dedup_spans" -> 1.66, "split_leakage_safe" -> 2.304,
    "report_split_contamination" -> 2.855,
    // reports/cards
    "report_source_card" -> 2.481, "report_source_overlap" -> 1.619,
    "report_drift_panel" -> 1.56, "report_tokenizer_card" -> 2.0,
    // percentile/window heavies
    "q28_percentile" -> 2.252, "q38_percentile_interp" -> 2.012,
    "q41_percentile_band" -> 2.062, "q59_anomaly_mad" -> 1.66,
    "q79_drift_chisq" -> 1.833,
    // joins/assoc
    "q3_join_agg" -> 1.789, "q45_pit_join" -> 1.789,
    "q40_session_salted" -> 1.901, "q54_copurchase" -> 1.555,
    "q66_assoc_rules" -> 2.159, "q68_frequent_triples" -> 1.969,
    "q65_rfm" -> 1.628, "q71_neighbor_jaccard" -> 1.514,
    // curation pipelines
    "curation_packed" -> 2.192, "curation_pipeline" -> 2.046,
    // ann heavies (703ccb2 / BASELINE isolated for the newest)
    "ann_sq8" -> 3.476, "ann_sq8_deploy" -> 2.722,
    "ann_ivf_sq8" -> 3.767, "ann_ivf_deploy" -> 1.717,
    "ann_pq_recall" -> 1.692, "sample_kcenter_ivf" -> 1.716,
    // text/lm
    "text_lm_bigram" -> 1.493, "text_lm_bigram_head" -> 1.922)

  /** sfDir-independent SHUFFLE thermometer (the round-18 re-pin
    * lesson): the scan-shaped q2 control read 1.09× of its pin while
    * the shuffle-heavy graph family read 1.2-1.5× of its records —
    * a light control under-reads IO/shuffle-path ambient, and the
    * reader could not separate "machine slower at shuffling" from a
    * real heavy-family regression. This probe hash-exchanges 8M rows
    * (~128 MB through the shuffle write+read path) into a bounded
    * aggregate — the cost shape of the heavy family's per-round
    * exchanges, with zero data dependence. Adjudication rule: a heavy
    * batch line moved only with this control ⇒ shuffle-path ambient;
    * moved without it ⇒ suspect the operator. */
  def shuffleControl(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    spark.range(0L, 8000000L)
      .select(((col("id") * 2654435761L) % 8000000L).as("k"), col("id").as("v"))
      .repartition(32, col("k"))
      .groupBy((col("k") % 1000L).as("g"))
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .write.mode("overwrite").format("noop").save()
  }

  /** Isolated pin for [[shuffleControl]] — min of 5 fresh-JVM isolated
    * runs at round-18 open (1.019/1.111/1.285/1.476/1.951 under q2
    * controls 1.25-1.84× — the wide spread is the POINT: shuffle IO
    * rides ambient far harder than the scan control, which is why this
    * thermometer exists; see BASELINE.md r18 adjudication row). Pinned
    * on a ≥1.2× day — on a near-idle machine load_factor may read
    * below 1, like the other isolated-minimum pins. */
  val ShuffleControlBaselineSec = 1.019

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: codegen/classloading/parquet-reader init, so per-query
    // timings measure steady-state work, not first-query infra costs
    // (measured: first query pays ~5 s of one-time setup otherwise)
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // min of two timed runs per query: single-run totals were observed to
    // jitter 40%+ under varying container load; the min is the standard
    // low-noise estimator of a query's actual cost. A failed run records
    // -1 (never elapsed-until-crash) and lands in the errors map, so a
    // query that regresses to throwing shrinks nothing silently.
    // The two runs are INTERLEAVED as full passes (A..Z, A..Z), not
    // back-to-back (A,A,B,B): BENCH_r02's false regression came from one
    // load spike hitting both adjacent samples of the same queries;
    // spacing a query's two samples a whole pass apart decorrelates them.
    // dev filter: `runMain graft.Bench name1 name2` times only those
    // line items (batch or streaming); no args = the full suite. Unknown
    // names fail fast — a typo must not exit 0 with an empty run.
    // Streaming/cold line items run through the SAME min-of-2
    // interleaved discipline as the batch queries (two full passes,
    // A..Z A..Z) — r6/r7 showed single-run streaming numbers are
    // unadjudicable under container load spikes. Feeds AND the
    // driver-side expected-count models are memoized and pre-populated
    // (StreamingBench.prepare) before the first timed pass, so both
    // samples of every line measure engine cost only.
    val streamingThunks: Seq[(String, () => Unit)] = Seq(
      "streaming_control" -> (() => StreamingBench.controlPipeline(spark)),
      "shuffle_control" -> (() => Bench.shuffleControl(spark)),
      "dedup_pipeline_cold" -> (() => {
        graft.functions.Dedup.evictSharedPipeline(spark, sfDir)
        graft.functions.Dedup.dedupMinhash(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }),
      "streaming_ttl_pipeline" -> (() => StreamingBench.ttlPipeline(spark, sfDir)),
      "streaming_running_reduce" -> (() => StreamingBench.runningReducePipeline(spark, sfDir)),
      "streaming_count_windows" -> (() => StreamingBench.countWindowsPipeline(spark, sfDir)),
      "streaming_topk" -> (() => StreamingBench.topKPipeline(spark, sfDir)),
      "streaming_ttl_rocksdb" -> (() => StreamingBench.ttlPipelineRocksDB(spark, sfDir)),
      "streaming_tws_rocksdb" -> (() => StreamingBench.twsPipelineRocksDB(spark, sfDir)),
      "streaming_profile_rocksdb" ->
        (() => StreamingBench.profilePipelineRocksDB(spark, sfDir)),
      "streaming_profile_warm_rocksdb" ->
        (() => StreamingBench.profileWarmPipelineRocksDB(spark, sfDir)),
      "streaming_recent_rocksdb" ->
        (() => StreamingBench.recentPipelineRocksDB(spark, sfDir)),
      "streaming_dedup" -> (() => StreamingBench.dedupPipeline(spark, sfDir)),
      "streaming_quantiles" -> (() => StreamingBench.quantilesPipeline(spark, sfDir)),
      "streaming_interval_join" -> (() => StreamingBench.intervalJoinPipeline(spark, sfDir)),
      "streaming_interval_join_rocksdb" ->
        (() => StreamingBench.intervalJoinPipelineRocksDB(spark, sfDir)),
      "streaming_ndv" -> (() => StreamingBench.ndvPipeline(spark, sfDir)),
      "streaming_kmv" -> (() => StreamingBench.kmvPipeline(spark, sfDir)),
      "streaming_kmv_rocksdb" ->
        (() => StreamingBench.kmvPipelineRocksDB(spark, sfDir)),
      "streaming_kmv_rocksdb_changelog" ->
        (() => StreamingBench.kmvPipelineRocksDBChangelog(spark, sfDir)),
      "streaming_transitions" ->
        (() => StreamingBench.transitionsPipeline(spark, sfDir)),
      "streaming_paths" ->
        (() => StreamingBench.pathsPipeline(spark, sfDir)),
      "streaming_paths_agg" ->
        (() => StreamingBench.pathsAggPipeline(spark, sfDir)),
      "streaming_funnel" ->
        (() => StreamingBench.funnelPipeline(spark, sfDir)),
      "streaming_retention" ->
        (() => StreamingBench.retentionPipeline(spark, sfDir)),
      "streaming_attribution" ->
        (() => StreamingBench.attributionPipeline(spark, sfDir)),
      "streaming_session_funnel" ->
        (() => StreamingBench.sessionFunnelPipeline(spark, sfDir)),
      "streaming_dq" ->
        (() => StreamingBench.dqPipeline(spark, sfDir)),
      "streaming_wau" ->
        (() => StreamingBench.wauPipeline(spark, sfDir)),
      "streaming_stickiness" ->
        (() => StreamingBench.stickinessPipeline(spark, sfDir)),
      "streaming_daily_close" ->
        (() => StreamingBench.dailyClosePipeline(spark, sfDir)),
      "streaming_drift" ->
        (() => StreamingBench.driftPipeline(spark, sfDir)),
      "streaming_ab" ->
        (() => StreamingBench.abPipeline(spark, sfDir)),
      "streaming_gaps" ->
        (() => StreamingBench.gapsPipeline(spark, sfDir)),
      "streaming_gaps_watermarked" ->
        (() => StreamingBench.gapsWatermarkedPipeline(spark, sfDir)),
      "streaming_auc" ->
        (() => StreamingBench.aucPipeline(spark, sfDir)),
      "streaming_ks" ->
        (() => StreamingBench.ksPipeline(spark, sfDir)),
      "streaming_drift_panel" ->
        (() => StreamingBench.driftPanelPipeline(spark, sfDir)),
      "streaming_ewma" ->
        (() => StreamingBench.ewmaPipeline(spark, sfDir)),
      "streaming_funnel_latency" ->
        (() => StreamingBench.funnelLatencyPipeline(spark, sfDir)),
      "streaming_funnel_rocksdb" ->
        (() => StreamingBench.funnelPipelineRocksDB(spark, sfDir)),
      "streaming_anomaly" ->
        (() => StreamingBench.anomalyPipeline(spark, sfDir)),
      "streaming_count_min" -> (() => StreamingBench.countMinPipeline(spark, sfDir)),
      "streaming_near_dup" -> (() => StreamingBench.nearDupPipeline(spark, sfDir)),
      "streaming_semantic_dedup" ->
        (() => StreamingBench.semanticDedupPipeline(spark, sfDir)),
      "streaming_semantic_dedup_rocksdb" ->
        (() => StreamingBench.semanticDedupPipelineRocksDB(spark, sfDir)),
      "streaming_incremental_dedup" ->
        (() => StreamingBench.incrementalDedupPipeline(spark, sfDir)),
      "streaming_decontaminate" ->
        (() => StreamingBench.decontaminationPipeline(spark, sfDir)),
      "streaming_token_budget" ->
        (() => StreamingBench.tokenBudgetPipeline(spark, sfDir)),
      "streaming_ingest_card" ->
        (() => StreamingBench.ingestCardPipeline(spark, sfDir)),
      "streaming_token_budget_trained" ->
        (() => StreamingBench.tokenBudgetTrainedPipeline(spark, sfDir)),
      "streaming_packing" ->
        (() => StreamingBench.packingPipeline(spark, sfDir)),
      "streaming_ttl_hotkey" ->
        (() => StreamingBench.ttlHotKeyPipeline(spark, sfDir)),
      "streaming_pca" ->
        (() => StreamingBench.pcaPipeline(spark, sfDir)),
      "streaming_rrf" ->
        (() => StreamingBench.rrfPipeline(spark, sfDir)),
      "streaming_pca_topm" ->
        (() => StreamingBench.pcaTopmPipeline(spark, sfDir)),
      "streaming_quality" ->
        (() => StreamingBench.qualityPipeline(spark, sfDir)),
      "streaming_lm_bigram" ->
        (() => StreamingBench.lmBigramPipeline(spark, sfDir)),
      "bpe_encode_deep" ->
        (() => StreamingBench.deepBpePipeline(spark, sfDir)),
      "streaming_curation" ->
        (() => StreamingBench.curationPipeline(spark, sfDir)),
      "streaming_session_window" -> (() => StreamingBench.sessionWindowPipeline(spark, sfDir)),
      "streaming_cdc_upsert" -> (() => StreamingBench.cdcUpsertPipeline(spark, sfDir)),
      "streaming_enrich" -> (() => StreamingBench.enrichPipeline(spark, sfDir)),
      "streaming_temporal_join" -> (() => StreamingBench.temporalJoinPipeline(spark, sfDir)))
    val known = SparkEntry.queries.keySet ++ streamingThunks.map(_._1)
    val only: Option[Set[String]] = if (args.isEmpty) None else Some(args.toSet)
    only.foreach { names =>
      val unknown = names.diff(known)
      require(unknown.isEmpty, s"unknown bench line items: ${unknown.mkString(", ")}")
    }
    // Load-control queries: q2 (batch) and streaming_control (fixed
    // synthetic streaming pipeline) run in EVERY bench invocation so a
    // reader can separate container load from real regressions — per
    // segment, since load hits micro-batch machinery and batch scans
    // differently. Clean-machine min-of-2 records live in BASELINE.md;
    // the JSON carries sec + load_factor for both. A line item is only
    // a regression if it moved MORE than its segment's control did.
    val ControlQuery = "q2_filter_project"
    // Re-pinned round 11 (twice): first on the REGENERATED testdata
    // (old 0.41 was pre-round-9-parquet), then after the 24g default
    // heap (5 near-idle isolated runs, min 0.55, spread 0.55-0.80; the
    // 8g pin was 0.62). Isolated-run minimum — in-suite the control
    // lands lower (~0.35-0.47) from suite warmup; stable bias.
    val ControlBaselineSec = 0.55
    val StreamControl = "streaming_control"
    val StreamControlBaselineSec = Bench.StreamControlBaselineSec
    val ShuffleControl = "shuffle_control"
    def wanted(name: String): Boolean =
      name == ControlQuery || name == StreamControl ||
        name == ShuffleControl || only.forall(_.contains(name))

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timeOnce(name: String, thunk: () => Unit): Double = {
      if (!wanted(name)) return -2.0 // filtered out by dev args
      val t0 = System.nanoTime()
      try { thunk(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          -1.0
      }
    }
    def runQ(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): () => Unit =
      () => fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => wanted(name) }
    def pass(): Map[String, Double] =
      ordered.map { case (name, fn) => name -> timeOnce(name, runQ(fn)) }.toMap
    // Ambient-variance guard, both segments (VERDICT r16 item 1 for
    // streaming, r17 item 1 for batch): a line whose min-of-2 still
    // exceeds RetryFactor × its healthy-run anchor gets up to two extra
    // in-process attempts, and the min over ALL attempts is reported —
    // so one container load spike in the driver's single sweep can no
    // longer fake a 2×-of-baseline regression (BENCH_r17 shipped
    // q55=65.8 s exactly that way). Retried lines are listed in the
    // JSON for the reader. A failed RETRY is ignored (timed directly,
    // not via timeOnce): a line that already produced two good samples
    // must not become `failed` because its third, optional one threw.
    val retried = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def retryAboveAnchor(name: String, firstBest: Double, thunk: () => Unit,
        anchors: Map[String, Double]): Double = {
      var best = firstBest
      var extra = 0
      while (extra < 2 &&
          anchors.get(name).exists(anchor => best > Bench.retryFactor * anchor)) {
        extra += 1
        val t0 = System.nanoTime()
        val t =
          try { thunk(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name retry failed (ignored): ${e.getMessage}")
            -1.0
          }
        if (t >= 0) best = math.min(best, t)
        else extra = 2
      }
      if (extra > 0) {
        retried(name) = retried.getOrElse(name, 0) + extra
        System.err.println(
          s"[bench] $name retried ${extra}x (anchor ${anchors(name)}), min $best")
      }
      best
    }
    val (pass1, pass2) = (pass(), pass())
    val results = ordered.map { case (name, fn) =>
      val (a, b) = (pass1(name), pass2(name))
      name -> (if (a < 0 || b < 0) -1.0
        else retryAboveAnchor(name, math.min(a, b), runQ(fn),
          Bench.BatchHealthyAnchorSec))
    }
    // Streaming + cold-build segment, same two-interleaved-passes
    // min-of-2 as the batch queries. `dedup_pipeline_cold` evicts the
    // shared LSH cache inside each timed run, so both samples are fully
    // cold builds; every other pipeline's feed/model work was hoisted
    // into the untimed prepare below.
    val streamingOrdered = streamingThunks.filter { case (n, _) => wanted(n) }
    // prepare memoizes the sfDir-fed event feeds + expected-count models;
    // streaming_control (synthetic, self-contained) and dedup_pipeline_cold
    // (Dedup-owned inputs) don't touch them, so a batch-only dev-filtered
    // run — where the control is the only streaming line — skips the cost
    val needsPrepare = streamingOrdered.exists { case (n, _) =>
      n != StreamControl && n != ShuffleControl && n != "dedup_pipeline_cold" }
    if (needsPrepare)
      try StreamingBench.prepare(spark, sfDir,
        n => streamingOrdered.exists(_._1 == n))
      catch { case e: Throwable =>
        System.err.println(s"[bench] streaming prepare failed: ${e.getMessage}") }
    def streamingPass(): Map[String, Double] =
      streamingOrdered.map { case (n, f) => n -> timeOnce(n, f) }.toMap
    val (sp1, sp2) = (streamingPass(), streamingPass())
    // Streaming lines ride the container's load far harder than batch
    // scans — three code-untouched lines moved 1.4-1.8× between two
    // same-code r16 runs — and a streaming re-run is cheap: feeds and
    // models are memoized in prepare.
    val streamingResults = streamingOrdered.map { case (n, f) =>
      val (a, b) = (sp1(n), sp2(n))
      if (a < 0 || b < 0) n -> -1.0
      else n -> retryAboveAnchor(n, math.min(a, b), f,
        Bench.StreamHealthyAnchorSec)
    }
    // Untimed diagnostic AFTER the timed runs: stage-by-stage wall
    // times of the cold LSH build (bands, candidate join, bounded
    // intersections, verify+materialize), so a slow driver-round
    // dedup_pipeline_cold is attributable from the round artifact.
    val stagesJson =
      if (!wanted("dedup_pipeline_cold")) "{}"
      else try {
        val st = graft.functions.Dedup.coldStageProbe(spark, sfDir)
        st.foreach { case (n, t) =>
          System.err.println(s"[cold-stage] $n = ${math.round(t * 1000) / 1000.0} s") }
        st.map { case (n, t) => "\"" + n + "\":" + math.round(t * 1000) / 1000.0 }
          .mkString("{\"dedup_pipeline_cold\":{", ",", "}}")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] cold stage probe failed: ${e.getMessage}")
        "{}"
      }
    val progressJson = StreamingBench.progressJson
    StreamingBench.clearMemo()

    // Control self-retry (VERDICT r17 item 1): the controls are the
    // artifact's load thermometers — every other line is adjudicated
    // AGAINST them, so a control that itself caught an ambient spike
    // mis-reads the whole run (BENCH_r17's 4.47× control made healthy
    // lines look 4× regressed). When a control's min-of-2 exceeds 2×
    // its near-idle pin, re-measure up to twice and keep the min — a
    // best-effort clean control, with the retry visible in `retried`.
    // The 2× trigger is looser than the line guard's 1.5× on purpose:
    // the control baselines are ISOLATED-run minima that in-suite runs
    // normally undershoot, so 2× is already an unambiguous hot signal.
    def retryControl(name: String, baseline: Double, cur: Double,
        thunk: () => Unit): Double = {
      var best = cur
      var extra = 0
      while (extra < 2 && best > 2.0 * baseline) {
        extra += 1
        val t0 = System.nanoTime()
        val t =
          try { thunk(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name control retry failed (ignored): ${e.getMessage}")
            -1.0
          }
        if (t >= 0) best = math.min(best, t)
        else extra = 2
      }
      if (extra > 0) {
        retried(name) = retried.getOrElse(name, 0) + extra
        System.err.println(
          s"[bench] control $name retried ${extra}x (pin $baseline), min $best")
      }
      best
    }
    val batchControlSec = {
      val cur = results.toMap.getOrElse(ControlQuery, -1.0)
      if (cur < 0) cur
      else retryControl(ControlQuery, ControlBaselineSec, cur,
        runQ(SparkEntry.queries(ControlQuery)))
    }
    val streamControlSec = {
      val cur = streamingResults.toMap.getOrElse(StreamControl, -1.0)
      if (cur < 0) cur
      else retryControl(StreamControl, StreamControlBaselineSec, cur,
        () => StreamingBench.controlPipeline(spark))
    }
    val shuffleControlSec = {
      val cur = streamingResults.toMap.getOrElse(ShuffleControl, -1.0)
      if (cur < 0) cur
      else retryControl(ShuffleControl, Bench.ShuffleControlBaselineSec, cur,
        () => Bench.shuffleControl(spark))
    }
    def patchControls(rs: Seq[(String, Double)]): Seq[(String, Double)] =
      rs.map {
        case (ControlQuery, _) => ControlQuery -> batchControlSec
        case (StreamControl, _) => StreamControl -> streamControlSec
        case (ShuffleControl, _) => ShuffleControl -> shuffleControlSec
        case kv => kv
      }
    val all = patchControls(results ++ streamingResults).filter(_._2 != -2.0)
    // 3-decimal rounding everywhere: BASELINE.md records are 2-3 decimals,
    // and the shorter doubles keep both JSON lines as small as possible
    // (the driver's artifact capture keeps only a 2000-char stdout tail).
    def r3(d: Double): Double = math.round(d * 1000) / 1000.0
    val qs = all.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // full JSON string escaping — Spark exception messages embed plan
    // fragments with newlines/tabs; a raw control char would corrupt the
    // one-line output exactly in the failure-reporting path
    def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errJson = errors.map { case (k, v) =>
      "\"" + esc(k) + "\":\"" + esc(v) + "\""
    }.mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    val controlSec = batchControlSec
    val loadFactor =
      if (controlSec > 0) controlSec / ControlBaselineSec else -1.0
    val scSec = streamControlSec
    val scLoad = if (scSec > 0) scSec / StreamControlBaselineSec else -1.0
    val shLoad =
      if (shuffleControlSec > 0) shuffleControlSec / Bench.ShuffleControlBaselineSec
      else -1.0
    val controlJson =
      s""""control":{"name":"$ControlQuery","sec":${r3(controlSec)},"baseline_sec":$ControlBaselineSec,"load_factor":${r3(loadFactor)}},"stream_control":{"name":"$StreamControl","sec":${r3(scSec)},"baseline_sec":$StreamControlBaselineSec,"load_factor":${r3(scLoad)}},"shuffle_control":{"name":"$ShuffleControl","sec":${r3(shuffleControlSec)},"baseline_sec":${Bench.ShuffleControlBaselineSec},"load_factor":${r3(shLoad)}}"""
    val retriedJson = retried
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"retried":$retriedJson,$controlJson,"stages":$stagesJson,"progress":$progressJson,"sf":"$sfDir"}"""
    // The full line (121+ query timings plus per-batch streaming progress)
    // is ~6 KB — far beyond the driver's 2000-char stdout tail, which is
    // why BENCH_r09/r10 both landed `parsed: null` despite healthy runs.
    // Three-layer evidence plan:
    //   1. the full line goes to stdout FIRST (whole-log consumers) and to
    //      a durable file (per-line record survives even when stdout is
    //      tail-truncated);
    //   2. a COMPACT summary line goes LAST and is size-guarded under
    //      1900 chars, so the tail always contains one complete parseable
    //      JSON line: totals, failures, both load controls, and the
    //      slowest lines — enough to adjudicate the round;
    //   3. stage/progress detail also mirrors to stderr at the probe sites.
    println(line)
    // Filtered/dev invocations (any name args) must NOT clobber the
    // canonical full-suite record: a 7-line spot-check once silently
    // replaced the driver's official 149-line round record. Dev runs go
    // to a side path unless SPARK_GRAFT_BENCH_FULL overrides explicitly.
    val defaultFullName =
      if (only.isEmpty) "BENCH_FULL_LOCAL.json" else "BENCH_FULL_DEV.json"
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      if (new java.io.File("/root/repo").isDirectory) s"/root/repo/$defaultFullName"
      else defaultFullName)
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-line file write failed: ${e.getMessage}") }
    // Compact line: cap the error map (3 entries, 80-char messages) and
    // include only the top-K slowest lines, shrinking K until the line
    // fits the 1900-char budget with guaranteed room to spare.
    val errCompact = errors.take(3).map { case (k, v) =>
      "\"" + esc(k) + "\":\"" + esc(v.take(80)) + "\""
    }.mkString("{", ",", "}")
    val bySlowest = all.toSeq.filter(_._2 >= 0).sortBy(-_._2)
    def compactLine(k: Int): String = {
      val top = bySlowest.take(k)
        .map { case (n, v) => "\"" + n + "\":" + r3(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_lines":${all.size},"n_failed":${errors.size},"errors":$errCompact,$controlJson,"queries":$top,"full":"$fullPath","sf":"$sfDir"}"""
    }
    val compact = (12 to 0 by -1).iterator.map(compactLine).find(_.length <= 1900)
      .getOrElse(compactLine(0))
    println(compact)
    spark.stop()
    // ALWAYS exit 0: per-line failures are already reported in
    // `errors`/`n_failed` above, and the driver's correctness gate is the
    // authority on pass/fail. Exiting non-zero made the driver record
    // `parsed: null` and erased the evidence for every HEALTHY line
    // (BENCH_r09: one schema break nuked per-line numbers for 64 gates).
    sys.exit(0)
  }
}
