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
  *
  * Timeout resilience (VERDICT r18 item 1 — BENCH_r18.json was rc=124 /
  * parsed=null because this main buffered all results and printed one
  * final line):
  *  - every completed sample is flushed incrementally to a durable
  *    partial file (BENCH_PARTIAL_LOCAL.json), so even SIGKILL leaves a
  *    per-line record on disk;
  *  - a JVM shutdown hook prints a complete compact JSON line (flagged
  *    "partial":true) from whatever finished when the process is
  *    terminated early — the driver's `timeout` sends SIGTERM, which
  *    provably reaches this forked JVM (the r18 tail shows Spark's own
  *    abort hooks running), so rc=124 still yields a parsed artifact;
  *  - SPARK_GRAFT_TIME_BUDGET_S (default 1500): past 70% of the budget
  *    the run sheds all optional work — anchor retries, conditional
  *    second samples, the untimed cold-stage probe — and degrades to
  *    min-of-1 so it finishes inside the driver's window instead of
  *    dying mid-suite.
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

  /** Retry trigger threshold: a line whose min-of-2 exceeds this factor
    * × its healthy anchor gets extra in-process attempts.
    * SPARK_GRAFT_RETRY_FACTOR overrides (diagnostics: 0 forces a retry
    * on every anchored line, huge disables). */
  def retryFactor: Double =
    sys.env.get("SPARK_GRAFT_RETRY_FACTOR").map(_.toDouble).getOrElse(1.5)

  /** JSON object of every anchored-retry line's FULL sample list (the
    * pre-retry min first, then each retry attempt; failed attempts stay
    * as -1). r20 (VERDICT r19 item 7): the retry guard keeps the min,
    * which is a downward-biased estimator whenever it fires — this field
    * puts every sample in the artifact so the bias is auditable, not
    * trusted. Pinned in BenchGuardSpec. */
  def renderRetrySamples(samples: Seq[(String, Seq[Double])]): String =
    samples.map { case (name, ss) =>
      "\"" + name + "\":[" +
        ss.map(s => (math.round(s * 1000) / 1000.0).toString).mkString(",") + "]"
    }.mkString("{", ",", "}")

  /** Soft deadline for the whole bench main, seconds (VERDICT r18
    * item 1b). The driver's own timeout budget is not observable from
    * here; 1500 s is comfortably under any plausible sweep window while
    * a clean full suite (conditional second passes, see below) finishes
    * in well under half of it. Past 70% of this budget the run sheds
    * retries/second-samples/diagnostics and degrades to min-of-1. */
  def timeBudgetSec: Double =
    sys.env.get("SPARK_GRAFT_TIME_BUDGET_S").map(_.toDouble).getOrElse(1500.0)

  /** Cap on total seconds spent in anchor-retry attempts per sweep
    * (VERDICT r18 item 2) — the r18 closing spent 48 lines × 1-2
    * retries under imperfect ambient; a hot window must not multiply
    * the whole suite. Controls are exempt (they are the thermometers
    * every other line is adjudicated against). */
  def retryBudgetSec: Double =
    sys.env.get("SPARK_GRAFT_RETRY_BUDGET_S").map(_.toDouble).getOrElse(30.0)

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
    // streaming_drift re-pinned r20: unboxed kernel + the reference
    // build hoisted to prepare (its own documented contract) — a drift
    // back to per-event Vector.updated cost must trip the guard
    "streaming_drift" -> 1.621, "streaming_drift_panel" -> 1.264,
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
    "streaming_lm_bigram" -> 1.375, "dedup_pipeline_cold" -> 1.565,
    // r19 anchor-by-default sweep (VERDICT r18 item 3): the last
    // unanchored streaming-segment line, from the r18 grand closing
    // (commit 6167a5c, controls 0.85×/0.97×/1.02×)
    "bpe_encode_deep" -> 0.892)

  /** Healthy full-suite anchors for BATCH lines. Before r18, only
    * streaming lines could retry, which is exactly how
    * q55_triangles=65.8 s (12× its in-suite band) entered the official
    * BENCH_r17.json when the driver's sweep ran under 4.47× ambient;
    * r18 anchored the heavy batch lines but left "lines under ~1.5 s
    * clean" unanchored, and q1_agg=28.48 s (21× clean) entered the
    * working-tree record the same way one tier down (VERDICT r18
    * item 3). r19 therefore anchors EVERY batch line whose clean
    * closing value is ≥ 0.8 s — below that an ambient spike cannot
    * fake a meaningful regression. Sources: the r17 grand closing
    * (3e4be90) / r17 continuation record (703ccb2) / BASELINE.md
    * isolated rows for the pre-r19 pins (kept verbatim), and the r18
    * grand closing (6167a5c: 249 lines, controls 0.85×/0.97×/1.02×,
    * post-reboot machine state per BASELINE.md r18 adjudication) for
    * the r19 anchor-by-default block. Anchors trigger retries ONLY —
    * BASELINE.md first-green rows remain the 2× adjudication record. */
  val BatchHealthyAnchorSec: Map[String, Double] = Map(
    // graph/iterative family (703ccb2 in-suite, r18 re-pin adjudicated)
    // graph family + q76 re-pinned r20 (observe-fused rounds / packed
    // WmGapState): closing-sweep values at 0.71x/0.74x/0.85x controls —
    // a drift back to the per-round probe-action or Seq-encoder cost
    // must trip the guard
    "q55_triangles" -> 3.794, // r19 pre-expansion rebalance closing (r20 close 4.28 under wobble — kept)
    "q61_pagerank" -> 3.423, // r20 mid-sweep clean read (close wobbled 4.27)
    "q70_kcore" -> 4.162, "q76_gaps_watermarked" -> 3.959,
    "q73_bfs_reach" -> 2.757,
    // column-profile family — spread/rank-interval lines re-pinned to
    // the r19 optimization closing; depth keeps its r18 pin (local
    // cost unchanged — the rewrite's win is the scale shape)
    "column_histogram_depth" -> 3.342, // r19 valuesAtRanks rewrite
    "column_histogram_depth_band" -> 3.11,
    "column_profile" -> 1.945, "column_histogram" -> 1.945,
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
    // basket family re-pinned to the r19 rebalance closing
    "q40_session_salted" -> 1.901, "q54_copurchase" -> 1.48,
    "q66_assoc_rules" -> 1.829, "q68_frequent_triples" -> 1.512,
    "q65_rfm" -> 1.628, "q71_neighbor_jaccard" -> 1.514,
    // curation pipelines
    "curation_packed" -> 2.192, "curation_pipeline" -> 2.046,
    // ann heavies — SQ8 family re-pinned to the r19 optimization
    // closing (the Sq8ReconDot loop expression; a drift back to the
    // interpreted-dot cost must now trip the guard)
    "ann_sq8" -> 1.966, "ann_sq8_deploy" -> 1.627,
    // ann_ivf_sq8: r19 closed at a 2.88 wobble-top read and pinned it;
    // r20 re-read clean (VERDICT r19 item 3): three FRESH-JVM dev
    // sweeps at 0.97-1.41x/0.77-0.83x controls gave 1.719/1.891/1.918 —
    // the r19 dev-min band (1.77), so the 2.88 was ambient, not code.
    // Re-pinned at the max of the three clean reads.
    "ann_ivf_sq8" -> 1.918, "ann_ivf_deploy" -> 1.717,
    "ann_pq_recall" -> 1.692, "sample_kcenter_ivf" -> 1.573,
    // text/lm
    "text_lm_bigram" -> 1.493, "text_lm_bigram_head" -> 1.922,
    // r19 anchor-by-default block (VERDICT r18 item 3): every batch
    // line ≥ 0.8 s in the r18 grand closing (6167a5c) not pinned above
    "ann_cosine_topk" -> 2.155, "ann_ivf" -> 1.566, "ann_ivf_pq" -> 1.125,
    "ann_ivf_recall" -> 1.636, "ann_lsh_bucketed" -> 0.948, "ann_pq" -> 1.424,
    "ann_pq_deploy" -> 2.242, "ann_recall_at_k" -> 1.374, "approx_count_min" -> 1.527,
    "approx_distinct_kmv" -> 1.493, // r19 single fact-distinct closing
    "approx_ndv" -> 1.401, "approx_ndv_overlap" -> 1.516,
    "approx_quantiles" -> 1.643, "bm25_score" -> 1.217, "chunk_overlap" -> 1.142,
    "decontaminate" -> 1.283, "decontaminate_bloom" -> 2.009, "decontaminate_bloom_bitmap" -> 2.0,
    "dedup_editdist" -> 1.463, "dedup_incremental" -> 1.697, "dedup_lines" -> 1.015,
    // embed_pca_project_topm was dropped from the map in r19 (the
    // LitDotLong fix took it to ~0.18 s, under the 0.8 s policy floor);
    // r20 (ADVICE r19): re-pinned at its OLD interpreted-dot value so a
    // silent drift back to that path — a >5x regression on this line —
    // still trips the guard; the floor policy exempts lines whose
    // healthy value is sub-0.8 s from NEW pins, it does not require
    // deleting a pin that still guards a known failure mode
    "embed_pca_project_topm" -> 0.986,
    "dedup_semantic" -> 1.565, "dq_checks" -> 1.237,
    "feature_hash" -> 0.897, "knn_join" -> 0.85, "mix_epochs" -> 1.029,
    "pii_scrub" -> 0.628, // r19 spread closing
    "q10_rank_topn" -> 0.806, "q13_count_window" -> 0.922,
    "q14_mapwithstate_ttl" -> 1.125, "q15_rollup" -> 1.27, "q1_agg" -> 1.354,
    "q20_grouping_sets" -> 1.205, "q21_session_window" -> 1.178, "q26_cube" -> 1.453,
    "q29_window_funcs" -> 0.912, "q33_salted_join" -> 0.854, "q37_asof_multikey" -> 1.152,
    "q42_upsert" -> 2.025, "q43_zorder" -> 1.09, "q44_scd2" -> 1.169,
    "q46_regional_revenue" -> 1.357, "q47_top_qty_customers" -> 2.006, "q48_small_qty_revenue" -> 1.389,
    "q49_rollup" -> 1.082, "q50_funnel" -> 1.272, "q51_exclusive_fault" -> 1.934,
    "q56_funnel_latency" -> 1.399, "q57_retention" -> 1.034, "q58_transitions" -> 0.947,
    "q60_active_islands" -> 0.891, "q63_session_funnel" -> 1.894, "q64_rolling_wau" -> 0.844,
    "q67_ltv_triangle" -> 1.208, "q69_path_topk" -> 0.935, "q72_stickiness" -> 1.048,
    "q74_gap_fill" -> 1.058, "q75_ewma" -> 1.796, "q76_interarrival" -> 1.949,
    "q77_target_encode" -> 1.076, "q78_quantile_bins" -> 2.31, "q83_ks_test" -> 1.945,
    "q84_mann_whitney" -> 1.431, "q85_small_qty_revenue" -> 1.433, "q9_running_sum" -> 1.051,
    "quality_perceptron_deploy" -> 1.224, "quality_repetition" -> 1.452, "retrieval_qlm" -> 1.421,
    "retrieval_rrf" -> 1.87, "sample_kcenter" -> 1.325, "sample_reservoir" -> 1.254,
    "sample_temperature" -> 1.38, "text_boilerplate" -> 1.099, "text_bpe_trained" -> 1.154,
    "text_freq_class_head" -> 1.047, "text_stats" -> 0.886, "token_budget_temperature" -> 1.059,
    "token_budget_trained" -> 1.614, "token_budget_waterfill" -> 0.948)

  /** RocksDB/changelog bench twins demoted to the nightly tier
    * (VERDICT r18 item 2): each is the same pipeline as its HDFS-state
    * sibling with only the state-store provider swapped, so per-round
    * per-line coverage loses nothing by sampling ONE of them per day —
    * the provider either works for all or breaks for all, and the
    * specs (RocksDBStateSpec + per-family streaming specs) pin
    * correctness regardless of the bench tier. The default sweep runs
    * the day-rotating keeper; SPARK_GRAFT_FULL=1 runs all ten; naming
    * one explicitly as a dev arg always runs it. Correctness gates are
    * untouched — these are bench-only lines. */
  val RocksTwinRotation: Vector[String] = Vector(
    "streaming_ttl_rocksdb", "streaming_tws_rocksdb",
    "streaming_profile_rocksdb", "streaming_profile_warm_rocksdb",
    "streaming_recent_rocksdb", "streaming_interval_join_rocksdb",
    "streaming_kmv_rocksdb", "streaming_kmv_rocksdb_changelog",
    "streaming_funnel_rocksdb", "streaming_semantic_dedup_rocksdb")
  def rotatingRocksKeeper: String =
    RocksTwinRotation(java.time.LocalDate.now().getDayOfYear % RocksTwinRotation.size)

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

  /** Direct HOST-contention probe, recorded in `run_shape.host_probe`
    * at sweep start and end. The round-19 evening investigation found
    * the stream control at a persistent 2.1-2.4× while loadavg, PSI and
    * at-rest steal all read idle — the contention was HOST-side
    * (overcommitted hypervisor CPUs), visible only as (a) elevated
    * thread-wakeup latency and (b) steal% accrued while RUNNABLE:
    * measured 69-688 µs per cross-thread wakeup (healthy: single-digit
    * µs) and 5% steal under an 8-thread spin on the same machine whose
    * at-rest steal was 0.01%. Latency-bound paths (streaming
    * micro-batch dispatch: hundreds of futex wakeups per batch) degrade
    * ~2-3× under this while throughput-bound scans/shuffles barely
    * move — exactly the batch≈1.1×/stream≈2.2× thermometer split that
    * window showed. Embedding the two readings makes every bench
    * artifact self-adjudicating: a reader can separate "host was
    * overcommitted" from "operator regressed" without trusting pins.
    *
    *  - `wakeup_us`: one cross-thread SynchronousQueue handoff round
    *    trip / 2 — the futex wake+schedule latency streaming dispatch
    *    pays per task. Healthy ≤10 µs; >30 µs = contended host.
    *  - `steal_pct`: steal share of /proc/stat delta over a 400 ms
    *    4-thread spin (steal only accrues while runnable, so an at-rest
    *    reading is blind). Healthy ≈0; >2% = overcommitted host.
    *
    * Cost ≤ ~1 s even under heavy contention (iterations are capped by
    * a 300 ms deadline). Returns (-1,-1) on any failure — never fails
    * the sweep. */
  def hostProbe(): (Double, Double) = {
    val wakeupUs =
      try {
        val q1 = new java.util.concurrent.SynchronousQueue[Integer]()
        val q2 = new java.util.concurrent.SynchronousQueue[Integer]()
        val n = 3000
        val echo = new Thread(() => {
          var i = 0
          try { while (i < n) { q1.take(); q2.put(0); i += 1 } }
          catch { case _: InterruptedException => () }
        })
        echo.setDaemon(true)
        echo.start()
        val deadline = System.nanoTime() + 300000000L // 300 ms cap
        val t0 = System.nanoTime()
        var i = 0
        while (i < n && System.nanoTime() < deadline) { q1.put(0); q2.take(); i += 1 }
        val perSwitch = (System.nanoTime() - t0) / 1000.0 / math.max(i, 1) / 2
        echo.interrupt()
        perSwitch
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    val stealPct =
      try {
        def stat(): Array[Long] =
          scala.io.Source.fromFile("/proc/stat").getLines().next()
            .trim.split("\\s+").drop(1).map(_.toLong)
        val before = stat()
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val spinners = (1 to 4).map { _ =>
          val th = new Thread(() => while (!stop.get()) ())
          th.setDaemon(true); th.start(); th
        }
        Thread.sleep(400)
        val after = stat()
        stop.set(true)
        spinners.foreach(_.join(200))
        if (before.length >= 8 && after.length >= 8) {
          val d = after.zip(before).map { case (x, y) => (x - y).toDouble }
          val tot = d.sum
          if (tot > 0) 100.0 * d(7) / tot else -1.0
        } else -1.0
      } catch { case scala.util.control.NonFatal(_) => -1.0 }
    (wakeupUs, stealPct)
  }

  def main(args: Array[String]): Unit = {
    val benchStartNanos = System.nanoTime()
    // host-contention reading BEFORE any Spark work warms the machine
    val (startWakeupUs, startStealPct) = hostProbe()
    def elapsedSec: Double = (System.nanoTime() - benchStartNanos) / 1e9
    def budgetFrac: Double =
      if (timeBudgetSec <= 0) 0.0 else elapsedSec / timeBudgetSec
    // Past 70% of the soft deadline: shed anchor retries, conditional
    // second samples and untimed diagnostics (keep min-of-1) so the run
    // finishes inside the driver's window instead of dying mid-suite.
    // Hot-window economy mode (r19): when the START host probe already
    // shows a contended hypervisor (wakeup latency above the threshold;
    // healthy is single-digit µs, the contended evening read 35-48 µs),
    // second passes and anchor retries only burn the driver's window
    // polishing numbers the guard will divert as ambient anyway — so the
    // sweep goes min-of-1 from the first line, finishing well inside any
    // driver timeout and leaving the probe readings as the explanation.
    // Controls are unaffected (retryControl has its own 2× trigger and
    // its re-measurements are adjudication evidence, not polish). The
    // record auto-diverts to the ambient file via the existing
    // shed ⇒ ambient rule. 0 disables.
    val hotWakeupThresholdUs =
      sys.env.get("SPARK_GRAFT_HOT_WAKEUP_US").map(_.toDouble).getOrElse(30.0)
    val hotWindow = hotWakeupThresholdUs > 0 && startWakeupUs > hotWakeupThresholdUs
    if (hotWindow)
      System.err.println(
        f"[bench] start wakeup latency $startWakeupUs%.1f us > " +
          f"$hotWakeupThresholdUs%.0f us - contended host window: min-of-1 " +
          "economy mode, record will divert to the ambient file")
    @volatile var shedLogged = hotWindow
    def shedExtras: Boolean = {
      val shed = hotWindow || budgetFrac > 0.70
      if (shed && !shedLogged) {
        shedLogged = true
        System.err.println(
          f"[bench] time budget ${timeBudgetSec}%.0f s is ${budgetFrac * 100}%.0f%% " +
            "spent - shedding retries/second-passes/diagnostics (min-of-1 from here)")
      }
      shed
    }

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
    // ERROR, not WARN: the driver's artifact keeps a merged
    // stdout+stderr 2000-char tail, and BENCH_r18's tail was 100%
    // ResolveWriteToStream/DAGScheduler WARN spam — exactly the noise
    // that evicted every parseable line from the capture window. The
    // heartbeat lines below only help if they stay IN the tail.
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: codegen/classloading/parquet-reader init, so per-query
    // timings measure steady-state work, not first-query infra costs
    // (measured: first query pays ~5 s of one-time setup otherwise)
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    // Streaming/cold line items (same timing discipline as batch; feeds
    // AND driver-side expected-count models are memoized and
    // pre-populated via StreamingBench.prepare before the first timed
    // pass, so every sample measures engine cost only).
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
      "streaming_count_windows_tws" ->
        (() => StreamingBench.countWindowsTwsPipeline(spark, sfDir)),
      "streaming_running_reduce_ttl_tws" ->
        (() => StreamingBench.runningReduceTtlTwsPipeline(spark, sfDir)),
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
    val fullTier = sys.env.get("SPARK_GRAFT_FULL").contains("1")
    val keeper = rotatingRocksKeeper
    val demotedToday = RocksTwinRotation.filterNot(_ == keeper)
    def wanted(name: String): Boolean =
      name == ControlQuery || name == StreamControl ||
        name == ShuffleControl || (only match {
          case Some(names) => names.contains(name) // dev args override demotion
          case None => fullTier || !demotedToday.contains(name)
        })

    // ---- incremental evidence state (shared with the shutdown hook) ----
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val retried = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // r20 (VERDICT r19 item 7): EVERY timing sample of an anchor-retried
    // line — the pre-retry min first, then each retry attempt (failed
    // attempts as -1) — so the keep-the-min estimator's downward bias is
    // auditable from the artifact instead of trusted
    val retrySamples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // best successful sample per line, across passes AND retries — the
    // single source the final JSON, the partial file, and the shutdown
    // hook all read. Concurrent because the hook thread reads it while
    // the main thread may be mid-update.
    val bestSample = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()
    @volatile var finishedNormally = false
    var retrySpentSec = 0.0
    var secondPassRan = 0
    var secondPassSkipped = 0

    def r3(d: Double): Double = math.round(d * 1000) / 1000.0
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
    def writeFile(path: String, content: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] file write failed ($path): ${e.getMessage}") }

    val repoDir = if (new java.io.File("/root/repo").isDirectory) "/root/repo/" else ""
    val partialPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTIAL",
      s"${repoDir}BENCH_PARTIAL_LOCAL.json")

    // Snapshot of everything completed so far, in a stable order, as the
    // same shape as the final "queries" map: errored lines -1, in-flight
    // lines absent. Used by the per-sample flush and the shutdown hook.
    def snapshot(): (Seq[(String, Double)], Map[String, String]) = {
      import scala.jdk.CollectionConverters._
      // errors is mutated on the main thread while the shutdown hook
      // snapshots — copy under the same lock the writers hold
      val errSnap = errors.synchronized { errors.toMap }
      val best = bestSample.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
      val names = (SparkEntry.queries.keys.toSeq.sorted ++ streamingThunks.map(_._1))
        .filter(n => best.contains(n) || errSnap.contains(n))
      (names.map(n => n -> (if (errSnap.contains(n)) -1.0 else best(n))), errSnap)
    }
    def partialLine(reason: String): String = {
      val (snap, errSnap) = snapshot()
      val qs = snap.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      val errJson = errSnap.map { case (k, v) =>
        "\"" + esc(k) + "\":\"" + esc(v) + "\"" }.mkString("{", ",", "}")
      val total = snap.map(_._2).filter(_ >= 0).sum
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","partial":true,"reason":"${esc(reason)}","elapsed_s":${r3(elapsedSec)},"n_lines":${snap.size},"n_failed":${errSnap.size},"start_wakeup_us":${r3(startWakeupUs)},"start_steal_pct":${r3(startStealPct)},"errors":$errJson,"queries":$qs,"sf":"$sfDir"}"""
    }
    // Tiny always-parseable progress line: totals + the 3 slowest lines
    // so far + a pointer at the per-line partial file. Printed to stdout
    // after EVERY completed sample — empirically (r19 SIGTERM dry run)
    // the shutdown hook's own println does NOT survive the driver
    // killing the sbt parent (the output pump dies with sbt), so the
    // only line guaranteed to be in a killed run's tail is one printed
    // BEFORE the kill. ~300 chars × ~500 samples is noise-free for
    // whole-log consumers ("partial":true distinguishes them) and keeps
    // the driver's 2000-char tail holding a complete parseable record
    // at every instant of the run.
    def heartbeatLine(): String = {
      val (snap, errSnap) = snapshot()
      val total = snap.map(_._2).filter(_ >= 0).sum
      val top = snap.filter(_._2 >= 0).sortBy(-_._2).take(3)
        .map { case (n, v) => "\"" + n + "\":" + r3(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","partial":true,"reason":"in-progress","elapsed_s":${r3(elapsedSec)},"n_lines":${snap.size},"n_failed":${errSnap.size},"start_wakeup_us":${r3(startWakeupUs)},"slowest":$top,"full":"$partialPath","sf":"$sfDir"}"""
    }
    def recordSample(name: String, sec: Double): Unit = {
      val prev = Option(bestSample.get(name)).map(_.doubleValue)
      bestSample.put(name, prev.fold(sec)(math.min(_, sec)))
      // durable per-sample flush: even SIGKILL mid-line leaves every
      // prior line's best sample on disk
      writeFile(partialPath, partialLine("in-progress") + "\n")
      println(heartbeatLine())
      System.out.flush()
    }
    // The driver's sweep timeout sends SIGTERM (rc=124); this hook turns
    // that from "parsed: null" into a complete compact JSON line built
    // from whatever finished, printed LAST on stdout for the tail capture.
    val shutdownHook = new Thread(() => {
      if (!finishedNormally) {
        try {
          val line = partialLine("terminated-early")
          writeFile(partialPath, line + "\n")
          // compact guard: the partial queries map can exceed the tail
          // budget late in a run — if so, fall back to totals-only
          val out = if (line.length <= 1900) line else {
            val (snap, errSnap) = snapshot()
            val total = snap.map(_._2).filter(_ >= 0).sum
            s"""{"metric":"total","value":${r3(total)},"unit":"sec","partial":true,"reason":"terminated-early","elapsed_s":${r3(elapsedSec)},"n_lines":${snap.size},"n_failed":${errSnap.size},"full":"$partialPath","sf":"$sfDir"}"""
          }
          println(out)
          System.out.flush()
        } catch { case _: Throwable => () }
      }
    }, "bench-partial-emitter")
    Runtime.getRuntime.addShutdownHook(shutdownHook)

    // One timed sample. recordError=false is the retry path: a line that
    // already produced a good sample must not become `failed` because an
    // optional extra attempt threw. Returns elapsed even on failure via
    // the second tuple slot so retry spend is charged for failed attempts.
    def sampleOnce(name: String, thunk: () => Unit,
        recordError: Boolean): (Double, Double) = {
      val t0 = System.nanoTime()
      try {
        thunk()
        val t = (System.nanoTime() - t0) / 1e9
        recordSample(name, t)
        (t, t)
      } catch {
        case e: Throwable =>
          val dt = (System.nanoTime() - t0) / 1e9
          if (recordError) {
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            errors.synchronized {
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            }
          } else
            System.err.println(s"[bench] $name retry failed (ignored): ${e.getMessage}")
          (-1.0, dt)
      }
    }
    def timeOnce(name: String, thunk: () => Unit): Double =
      if (!wanted(name)) -2.0 // filtered out by dev args / demotion
      else sampleOnce(name, thunk, recordError = true)._1
    def runQ(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): () => Unit =
      () => fn(spark, sfDir).write.mode("overwrite").format("noop").save()

    // Ambient-variance guard, both segments (VERDICT r16 item 1 for
    // streaming, r17 item 1 for batch): a line whose best sample still
    // exceeds RetryFactor × its healthy-run anchor gets up to two extra
    // in-process attempts, and the min over ALL attempts is reported —
    // so one container load spike in the driver's single sweep can no
    // longer fake a 2×-of-baseline regression (BENCH_r17 shipped
    // q55=65.8 s exactly that way). Retried lines are listed in the
    // JSON. r19: total retry spend is capped (retryBudgetSec) and
    // retries are shed entirely past 70% of the time budget.
    def retryAboveAnchor(name: String, firstBest: Double, thunk: () => Unit,
        anchors: Map[String, Double]): Double = {
      var best = firstBest
      var extra = 0
      val samples = Seq.newBuilder[Double]
      samples += firstBest
      while (extra < 2 && !shedExtras && retrySpentSec < retryBudgetSec &&
          anchors.get(name).exists(anchor => best > Bench.retryFactor * anchor)) {
        extra += 1
        val (t, dt) = sampleOnce(name, thunk, recordError = false)
        retrySpentSec += dt
        samples += t
        if (t >= 0) best = math.min(best, t)
        else extra = 2
      }
      if (extra > 0) {
        retried(name) = retried.getOrElse(name, 0) + extra
        retrySamples(name) = retrySamples.getOrElse(name, Seq.empty) ++ samples.result()
        System.err.println(
          s"[bench] $name retried ${extra}x (anchor ${anchors(name)}), min $best")
      }
      best
    }

    // Segment runner: one full pass in fixed order, then a SECOND pass
    // only over lines whose first sample exceeded their healthy anchor
    // (VERDICT r18 item 2 — a first sample at-or-under its clean-run
    // anchor IS the healthy number; re-timing it buys nothing). Lines
    // without an anchor always get the second sample so a NEW line's
    // first-round pin stays a min-of-2. The passes stay spaced (full
    // pass 1 completes before pass 2 starts) so a load spike cannot hit
    // both samples of the same line (the BENCH_r02 lesson). Anchor
    // retries then run per line on the min.
    def runSegment(lines: Seq[(String, () => Unit)],
        anchors: Map[String, Double]): Seq[(String, Double)] = {
      val active = lines.filter { case (n, _) => wanted(n) }
      val pass1 = active.map { case (n, f) => n -> timeOnce(n, f) }.toMap
      val second = scala.collection.mutable.Map.empty[String, Double]
      active.foreach { case (n, f) =>
        val v = pass1(n)
        if (v >= 0) {
          val needs = anchors.get(n).forall(a => v > a)
          if (needs && !shedExtras) {
            secondPassRan += 1
            second(n) = sampleOnce(n, f, recordError = true)._1
          } else if (needs) secondPassSkipped += 1
        }
      }
      active.map { case (n, f) =>
        val a = pass1(n)
        val b = second.getOrElse(n, a)
        n -> (if (a < 0 || b < 0) -1.0
          else retryAboveAnchor(n, math.min(a, b), f, anchors))
      }
    }

    val results = runSegment(
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) => n -> runQ(fn) },
      Bench.BatchHealthyAnchorSec)

    // Streaming + cold-build segment. `dedup_pipeline_cold` evicts the
    // shared LSH cache inside each timed run, so every sample is a fully
    // cold build; every other pipeline's feed/model work is hoisted into
    // the untimed prepare below.
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
    val streamingResults =
      runSegment(streamingOrdered, Bench.StreamHealthyAnchorSec)

    // Untimed diagnostic AFTER the timed runs: stage-by-stage wall
    // times of the cold LSH build (bands, candidate join, bounded
    // intersections, verify+materialize), so a slow driver-round
    // dedup_pipeline_cold is attributable from the round artifact.
    // Shed near the deadline — it's evidence, not a measurement.
    val stagesJson =
      if (!wanted("dedup_pipeline_cold") || shedExtras) "{}"
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
    // best-effort clean control, with the retry visible in `retried`
    // AND the pre-retry in-suite reading kept in the JSON (sec_in_suite)
    // so a reader sees both the ambient that prevailed during the sweep
    // and the best-effort re-measurement (ADVICE r18). Controls are
    // exempt from the retry-spend cap but respect the hard deadline
    // (they're cheap; the budget check here is only against a pathological
    // hang). The 2× trigger is looser than the line guard's 1.5× on
    // purpose: the control baselines are ISOLATED-run minima that
    // in-suite runs normally undershoot, so 2× is already an unambiguous
    // hot signal.
    def retryControl(name: String, baseline: Double, cur: Double,
        thunk: () => Unit): Double = {
      var best = cur
      var extra = 0
      while (extra < 2 && best > 2.0 * baseline && budgetFrac < 0.9) {
        extra += 1
        val (t, _) = sampleOnce(name, thunk, recordError = false)
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
    val batchControlPreRetry = results.toMap.getOrElse(ControlQuery, -1.0)
    val batchControlSec =
      if (batchControlPreRetry < 0) batchControlPreRetry
      else retryControl(ControlQuery, ControlBaselineSec, batchControlPreRetry,
        runQ(SparkEntry.queries(ControlQuery)))
    val streamControlPreRetry = streamingResults.toMap.getOrElse(StreamControl, -1.0)
    val streamControlSec =
      if (streamControlPreRetry < 0) streamControlPreRetry
      else retryControl(StreamControl, StreamControlBaselineSec, streamControlPreRetry,
        () => StreamingBench.controlPipeline(spark))
    val shuffleControlPreRetry = streamingResults.toMap.getOrElse(ShuffleControl, -1.0)
    val shuffleControlSec =
      if (shuffleControlPreRetry < 0) shuffleControlPreRetry
      else retryControl(ShuffleControl, Bench.ShuffleControlBaselineSec,
        shuffleControlPreRetry, () => Bench.shuffleControl(spark))
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
    val qs = all.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
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
      s""""control":{"name":"$ControlQuery","sec":${r3(controlSec)},"sec_in_suite":${r3(batchControlPreRetry)},"baseline_sec":$ControlBaselineSec,"load_factor":${r3(loadFactor)}},"stream_control":{"name":"$StreamControl","sec":${r3(scSec)},"sec_in_suite":${r3(streamControlPreRetry)},"baseline_sec":$StreamControlBaselineSec,"load_factor":${r3(scLoad)}},"shuffle_control":{"name":"$ShuffleControl","sec":${r3(shuffleControlSec)},"sec_in_suite":${r3(shuffleControlPreRetry)},"baseline_sec":${Bench.ShuffleControlBaselineSec},"load_factor":${r3(shLoad)}}"""
    val retriedJson = retried
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val retrySamplesJson = Bench.renderRetrySamples(retrySamples.toSeq)
    // run-shape evidence: what the budget/conditional machinery actually
    // did this sweep, so a reader can tell min-of-1 lines from min-of-2
    val (endWakeupUs, endStealPct) = hostProbe()
    val hostJson =
      s""""host_probe":{"start_wakeup_us":${r3(startWakeupUs)},"start_steal_pct":${r3(startStealPct)},"end_wakeup_us":${r3(endWakeupUs)},"end_steal_pct":${r3(endStealPct)}}"""
    val shapeJson =
      s""""run_shape":{"elapsed_s":${r3(elapsedSec)},"budget_s":${r3(timeBudgetSec)},"shed":$shedLogged,"hot_window":$hotWindow,"second_pass_ran":$secondPassRan,"second_pass_skipped":$secondPassSkipped,"retry_spend_s":${r3(retrySpentSec)},"retry_budget_s":${r3(retryBudgetSec)},"demoted_twins":${if (fullTier || only.nonEmpty) 0 else demotedToday.size},"rocks_keeper":"$keeper",$hostJson}"""
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"retried":$retriedJson,"retry_samples":$retrySamplesJson,$controlJson,$shapeJson,"stages":$stagesJson,"progress":$progressJson,"sf":"$sfDir"}"""
    // The full line (200+ query timings plus per-batch streaming progress)
    // is ~6 KB — far beyond the driver's 2000-char stdout tail, which is
    // why BENCH_r09/r10 both landed `parsed: null` despite healthy runs.
    // Three-layer evidence plan:
    //   1. the full line goes to stdout FIRST (whole-log consumers) and to
    //      a durable file (per-line record survives even when stdout is
    //      tail-truncated);
    //   2. a COMPACT summary line goes LAST and is size-guarded under
    //      1900 chars, so the tail always contains one complete parseable
    //      JSON line: totals, failures, load controls, and the slowest
    //      lines — enough to adjudicate the round;
    //   3. stage/progress detail also mirrors to stderr at the probe sites;
    //   4. (r19) every sample also flushed incrementally to the partial
    //      file, and a shutdown hook emits a parsed partial line on early
    //      termination — see object scaladoc.
    println(line)
    // Filtered/dev invocations (any name args) must NOT clobber the
    // canonical full-suite record: a 7-line spot-check once silently
    // replaced the driver's official 149-line round record. Dev runs go
    // to a side path unless SPARK_GRAFT_BENCH_FULL overrides explicitly.
    // r19 (VERDICT r18 item 5): a full-suite sweep that ran HOT — ANY of
    // the three thermometers above 1.5× its pin — or that SHED its
    // second passes/retries (degraded to min-of-1) is an ambient
    // artifact, not a record; it goes to BENCH_FULL_LOCAL_ambient.json
    // so the clean record the anchors cite survives driver-window
    // overwrites. All three controls, not just batch: the r19 dress
    // rehearsal ran at q2 1.18× while the shuffle path read 4.03× and
    // every heavy line ballooned — a batch-only guard re-admits the r18
    // q1_agg=28.48 incident through the other two load paths.
    val ambientHot = only.isEmpty &&
      (loadFactor > 1.5 || scLoad > 1.5 || shLoad > 1.5 || shedLogged)
    val defaultFullName =
      if (only.nonEmpty) "BENCH_FULL_DEV.json"
      else if (ambientHot) "BENCH_FULL_LOCAL_ambient.json"
      else "BENCH_FULL_LOCAL.json"
    if (ambientHot)
      System.err.println(f"[bench] hot run (controls ${loadFactor}%.2fx/" +
        f"${scLoad}%.2fx/${shLoad}%.2fx, shed=$shedLogged) - " +
        "writing to BENCH_FULL_LOCAL_ambient.json, keeping the clean record")
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      s"$repoDir$defaultFullName")
    writeFile(fullPath, line + "\n")
    // the run completed: the partial file's "in-progress" snapshot is
    // superseded by the full record — rewrite it as a completed marker
    // pointing at the authoritative file
    writeFile(partialPath,
      s"""{"partial":false,"completed":true,"full":"$fullPath"}""" + "\n")
    // Compact line: cap the error map (3 entries, 80-char messages) and
    // include only the top-K slowest lines, shrinking K until the line
    // fits the 1900-char budget with guaranteed room to spare.
    val errCompact = errors.take(3).map { case (k, v) =>
      "\"" + esc(k) + "\":\"" + esc(v.take(80)) + "\""
    }.mkString("{", ",", "}")
    val bySlowest = all.filter(_._2 >= 0).sortBy(-_._2)
    def compactLine(k: Int): String = {
      val top = bySlowest.take(k)
        .map { case (n, v) => "\"" + n + "\":" + r3(v) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_lines":${all.size},"n_failed":${errors.size},"errors":$errCompact,$controlJson,$shapeJson,"queries":$top,"full":"$fullPath","sf":"$sfDir"}"""
    }
    val compact = (12 to 0 by -1).iterator.map(compactLine).find(_.length <= 1900)
      .getOrElse(compactLine(0))
    finishedNormally = true
    println(compact)
    System.out.flush()
    spark.stop()
    // ALWAYS exit 0: per-line failures are already reported in
    // `errors`/`n_failed` above, and the driver's correctness gate is the
    // authority on pass/fail. Exiting non-zero made the driver record
    // `parsed: null` and erased the evidence for every HEALTHY line
    // (BENCH_r09: one schema break nuked per-line numbers for 64 gates).
    sys.exit(0)
  }
}
