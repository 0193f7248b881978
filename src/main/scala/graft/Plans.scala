package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dumps the executed physical plan of each headline query to
  * PLANS.md — the evidence that scans are pruned/pushed, dims are
  * broadcast, aggregates are partial+final, and hot projections sit
  * inside WholeStageCodegen. Run after operator changes:
  *   sbt "runMain graft.Plans" (writes PLANS.md at the repo root)
  *
  * Plans are captured AFTER an action so AQE has finalized (see
  * spark4-env notes: codegen markers render as "*(n)" only in executed
  * plans).
  */
object Plans {
  private val Headline = Seq(
    "q1_agg",              // partial+final hash aggregate over decimal sums
    "q2_filter_project",   // predicate + projection pushdown into parquet
    "q3_join_agg",         // broadcast star join, single fact shuffle
    "q10_rank_topn",       // WindowGroupLimit pushdown of rank filter
    "q14_mapwithstate_ttl",// two stacked windows over one sort
    "q19_asof_join",       // RANGE-frame as-of without a join
    "q23_interval_join",   // time-bounded range join
    "dedup_simhash",       // zero-shuffle map-side sketch
    "dedup_minhash",       // LSH pipeline: band join + candidate-bounded verify
    "ann_lsh_bucketed",    // broadcast query set + bucket-equality join
    "ann_ivf",             // fixed-k codebook broadcast + map-side argmax assignment
    "text_fingerprint",    // native md5 fold at scan speed
    "q31_count_distinct",  // expand-based multi-distinct
    "q32_asof_native",     // custom LogicalPlan/Strategy/merge exec
    "q35_asof_left",       // LEFT OUTER as-of (null-filled right side)
    "q37_asof_multikey",   // multi-key as-of (long+string equality keys)
    "decontaminate",       // broadcast benchmark shingle set, scan-speed corpus
    "dedup_components",    // iterative star-contraction CC (final-join plan)
    "q28_percentile",      // shared-exchange multi-column rank sorts + broadcast counts
    "q39_pivot",           // explicit-values pivot → one-shuffle conditional agg
    "pii_scrub",           // per-row regexp redaction at scan speed
    "quality_repetition",  // array metrics + posting-list argmax join
    "ann_pq",              // PQ codes encode + broadcast ADC scan + bounded refine
    "approx_quantiles",    // mergeable sketch agg, map-side combine
    "dedup_lines",         // packed-slot min winners, no join-back
    "knn_join",            // bucket-bounded self-join + per-vector window top-k
    "approx_ndv",          // two-level HLL register aggregate
    "approx_count_min",    // d×w-bounded counter aggregate + broadcast probe lookups
    "decontaminate_bloom", // broadcast position-set semi-join, k-hit bloom rule
    "column_histogram",    // min/max broadcast + integer-exact bucket aggregate
    "column_histogram_depth", // per-column sort + row-position depth buckets
    "dedup_incremental",   // incoming bands vs index bands, no index self-join
    "q46_regional_revenue", // 6-table star: broadcast dim chain, one fact shuffle
    "q47_top_qty_customers", // Q18 shape: HAVING-filtered fact aggregate below the join
    "q48_small_qty_revenue", // Q17 shape: per-group fact aggregate joined back, integer threshold
    "q49_rollup",          // multi-level aggregate: one Expand + one shuffle, no re-scan
    "q50_funnel",          // chained conditional mins, one user_id partitioning end to end
    "q42_upsert",          // CDC full-outer merge, change side wins
    "pack_sequences",      // per-source running-offset window + roll-up
    "embed_centroids",     // fixed-point (label, dim) combiner aggregate
    "q43_zorder",          // normalized Morton key from broadcast stats
    "bm25_score",          // single-pass tf array + broadcast corpus stats
    "column_profile",      // stack -> one scan + per-column aggregate (exact gate)
    "column_profile_approx", // one-scan two-level stats+HLL fold, no expand
    "ann_pq_recall",       // trained-codebook PQ vs value-hashed brute top-k
    "ann_ivf_pq",          // FAISS composition: cells bound, codes score, refine exact
    "q44_scd2",            // SCD2 lead() intervals: one exchange, no self-join
    "q45_pit_join",        // PIT enrichment over the custom as-of exec
    "dedup_spans",         // one explosion -> packed-slot winners, per-doc decode (no join-back)
    "sample_reservoir",    // candidate-bounded exact per-stratum ranking
    "sample_temperature",  // integer temperature targets + bounded ranking
    "dedup_canonical",     // packed-argmax canonical per dup cluster
    "text_freq_class",     // self-trained vocab join, integer log2 classes
    "text_freq_class_head", // broadcast top-K vocab map literal, zero scoring joins
    "ann_ivf_recall",      // planted-dup recall gate over the trained-codebook IVF path
    "q41_percentile_band", // shared multi-column band refinement: one sketch agg, one window, one wide final agg
    "token_budget_temperature", // integer temperature token targets + running-sum admission
    "q51_exclusive_fault", // Q21 shape rewritten: per-order window counters, zero self-joins
    "dedup_semantic",      // SemDeDup: codebook broadcast + top-2 cell pair join
    "approx_ndv_overlap",  // HLL register max-merge union, no fact rescan
    "q52_idle_capital",    // Q22 shape: 1-row stats broadcast + anti join, integer cents
    "mix_epochs",          // integer epoch plans: budgets + greedy hash-prefix fraction
    "q53_json_extract",    // schema'd from_json, parse pruned to the referenced field
    "q54_copurchase",      // basket arrays + map-side pair comprehension, one exchange
    "q55_triangles",       // degree-oriented wedges + broadcast close, DOULION sample
    "q56_funnel_latency",  // funnel chain + shared-exchange percentile fold
    "q57_retention",       // (user, week) distinct + user-partitioned cohort chain
    "q58_transitions",     // one user exchange: lag window into tiny pair aggregate
    "q59_anomaly_mad",     // two percentile passes on one event_type partitioning
    "q60_active_islands",  // islands via day - rank, one user partitioning
    "dq_checks",           // six audit rules, all 1-row aggregates + anti joins
    "approx_distinct_kmv", // per-set map-side top-k + k-set-only union merge
    "q62_attribution",     // one user exchange: strictly-before last() window
    "q63_session_funnel",  // one user exchange: gap + session-id + 3 min() windows
    "q64_rolling_wau",     // bounded 7x expansion + distinct, 1-row spine
    "q65_rfm",             // band-machinery quartiles: sketch brackets + banded boundary ranks, zero global sorts
    "q66_assoc_rules",     // pair comprehension + tiny-side broadcast ratios
    "q67_ltv_triangle",    // cohort via min() window, tiny triangle cumsum
    "q68_frequent_triples", // 3-subset comprehension, no three-way join
    "q69_path_topk",       // two leads on ONE user window pass, tiny path aggregate
    "q70_kcore",           // fixed-round peel: degree agg + semi joins per round
    "q71_neighbor_jaccard", // top-k node cap + half-edge self-join, pair frame broadcast
    "q72_stickiness",      // one fact-distinct exchange; dau/wau joins on day-sized frames
    "column_winsorize",    // band-machinery thresholds broadcast into one clip aggregate
    "q74_gap_fill",        // packed daily-close argmax + user-partitioned fill window
    "q75_ewma",            // calendar-bounded per-user fold; lag() reuses the user exchange
    "q76_interarrival",    // one user lag window + shared-exchange percentile machinery
    "q77_target_encode",   // broadcast category stats + 1-row prior; fact encoded at scan speed
    "feature_hash",        // explode + map-side partial agg onto <=1024 buckets
    "q78_quantile_bins",   // one rank window; 9-row/type bounds broadcast; HOF assign
    "q79_drift_chisq",     // ref-half rank + two scan-speed binned halves, tiny chi-square agg
    "q80_sequence_motifs", // one user exchange; per-row string scans; 1-row stacked agg
    "q81_ab_chisq",        // one user agg; 1-row margins + integer chi-square
    "text_bpe_trained",    // bounded-vocab trained merges; distinct-pretoken fold + broadcast lens
    "curation_pipeline",   // FUSED composition: one corpus pass + small-side drop/admit joins
    "report_source_card",  // one-pass flag aggregate + broadcast drop-list flags + survivor reuse
    "report_source_overlap", // (source, md5-pair) distinct + bounded-fan-out self-join
    "q82_survival",        // one user exchange -> tiny lifetime histogram windows
    "q83_ks_test",         // (type, cents) map-side fold + per-type CDF windows
    "q84_mann_whitney",    // q83's fold reused for doubled-midrank U/AUC algebra
    "report_drift_panel",  // composed panel: checkpointed shared fold + q79 branch
    "embed_pca_project",   // trained-iterate literal dot; one scan + label rollup
    "embed_kmeans_profile", // literal-centroid packed argmin; one scan + tiny rollup
    "embed_pca_project_topm", // m literal dots + generator stack; STILL one corpus scan
    "quality_perceptron",  // trained-weights literal dot + 1-row confusion all-reduce
    "token_budget_waterfill", // one token-sum exchange; |sources|-row level algebra
    "ann_sq8",             // SQ8: literal-bounds integer encode + broadcast reconstruction-dot scan + bounded refine
    "text_lm_bigram",      // self-trained bigram model join, integer log2 classes
    "report_split_contamination", // two-policy leak tail over the banded-LSH pair set
    "retrieval_qlm",       // r18: one tf-vector scan + 1-row corpus-stats broadcast, integer Dirichlet fold
    "q85_small_qty_revenue", // r18: correlated-subquery DECORRELATION — one fact aggregate + join-back, not a re-scan per row
    "quality_perceptron_deploy") // r18: LOADED-model literal dot — plan must match quality_perceptron's scoring half

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — executed physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` at `$sfDir` (local[4], AQE default).\n")
    sb.append("`*(n)` prefixes mark WholeStageCodegen stages; `PushedFilters`/\n")
    sb.append("`ReadSchema` show what reached the parquet scan.\n")

    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() (not a separate write action) so THIS df's AQE plan is
      // the one finalized and codegen-annotated
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      sb.append(s"\n## $name\n\n```\n")
      sb.append(plan.linesIterator.take(80).mkString("\n"))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${Headline.size} plans)")
    spark.stop()
  }
}
