package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.multimodal.Multimodal

/** Training-data-pipeline extension operators (builder mandate; SURVEY
  * §7.4), registered for the driver gate alongside the relational suite.
  * Every entry has a DuckDB oracle in [[ExtensionOracles]].
  */
object Extensions {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats"       -> (TextAnalysis.textStats _),
    "text_lang_id"     -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "dedup_exact"      -> (Dedup.dedupExact _),
    "dedup_jaccard"    -> (Dedup.dedupJaccard _),
    "dedup_minhash"    -> (Dedup.dedupMinhash _),
    "dedup_editdist"   -> (Dedup.dedupEditDist _),
    "dedup_simhash"    -> (Dedup.simhash _),
    "dedup_lines"      -> (Dedup.dedupLines _),
    "dedup_spans"      -> ((s: SparkSession, dir: String) =>
      Dedup.dedupSpans(s, dir, posBits = Dedup.SpanGatePosBits)),
    "dedup_drop_list"  -> (Dedup.dedupDropList _),
    "dedup_components" -> (Dedup.dedupComponents _),
    // cluster-hashed split: no near-dup cluster ever spans train/eval
    // (the contamination a doc-level hash split permits)
    "split_leakage_safe" -> ((s: SparkSession, dir: String) =>
      Dedup.splitLeakageSafe(s, dir)),
    // the measurement justifying it: leaked eval docs per split policy
    // (doc-hash leaks, cluster-hash provably zero)
    "report_split_contamination" -> ((s: SparkSession, dir: String) =>
      Dedup.reportSplitContamination(s, dir)),
    "dedup_components_minlabel" -> (Dedup.dedupComponentsMinLabel _),
    "dedup_canonical"  -> (Dedup.dedupCanonical _),
    "sample_by_hash"   -> ((s: SparkSession, dir: String) => Dedup.sampleByHash(s, dir)),
    "sample_stratified" -> ((s: SparkSession, dir: String) => Dedup.sampleStratified(s, dir)),
    "sample_reservoir" -> ((s: SparkSession, dir: String) => Dedup.sampleReservoir(s, dir)),
    "sample_temperature" -> ((s: SparkSession, dir: String) => Dedup.sampleTemperature(s, dir)),
    "decontaminate"    -> ((s: SparkSession, dir: String) => Dedup.decontaminate(s, dir)),
    // Bloom-filter decontamination: deterministic — positions (and
    // therefore false positives) are md5-derived identically in both
    // engines; forced-FP regime pinned in BloomDecontaminationSpec
    "decontaminate_bloom" -> ((s: SparkSession, dir: String) => Dedup.decontaminateBloom(s, dir)),
    "text_boilerplate" -> ((s: SparkSession, dir: String) => Dedup.textBoilerplate(s, dir)),
    // 128 KB bitmap + codegen'd bit test instead of the 4 MB position-set
    // broadcast join — bit-identical decisions, shares the bloom oracle
    "decontaminate_bloom_bitmap" -> ((s: SparkSession, dir: String) => Dedup.decontaminateBloomBitmap(s, dir)),
    // incremental near-dup: incoming batch vs precomputed index bands +
    // itself — index×index pairs never generated (the daily-increment
    // shape at 100 TB)
    "dedup_incremental" -> ((s: SparkSession, dir: String) => Dedup.dedupIncremental(s, dir)),
    // exact dedup over the canonical text form — catches case/punct/
    // whitespace variants byte-exact dedup misses (differential
    // spec-pinned in ExtensionsSpec)
    "dedup_exact_normalized" -> (Dedup.dedupExactNormalized _),
    // systematic PPS: token-weighted document sampling, integer-exact
    "sample_pps" -> ((s: SparkSession, dir: String) => Dedup.samplePps(s, dir)),
    "token_budget_mix" -> ((s: SparkSession, dir: String) => TextAnalysis.tokenBudgetMix(s, dir)),
    "token_budget_temperature" -> ((s: SparkSession, dir: String) => TextAnalysis.tokenBudgetTemperature(s, dir)),
    "mix_epochs" -> (TextAnalysis.mixEpochs _),
    "pack_sequences"   -> (TextAnalysis.packSequences _),
    "bm25_score"       -> (TextAnalysis.bm25Score _),
    // query-likelihood LM ranking (Dirichlet-smoothed, integer ppb —
    // the third classical lexical ranker; sum-of-probs deviation
    // documented at TextAnalysis.qlmScore)
    "retrieval_qlm"    -> (TextAnalysis.qlmScore _),
    "chunk_overlap"    -> (TextAnalysis.chunkOverlap _),
    "text_bpe_tokens"  -> (TextAnalysis.bpeTokenCount _),
    // TRAINED BPE: driver-trained merge table over the bounded
    // vocabulary (deterministic tie rule), distributed fold encode —
    // real-tokenizer-denominated counts, not the pretoken proxy
    "text_bpe_trained" -> (TextAnalysis.bpeTrainedCounts _),
    // per-source tokenizer-fit diagnostics over the trained codec
    // (compression + fertility in exact integer ppm)
    "report_tokenizer_card" -> (TextAnalysis.reportTokenizerCard _),
    "text_bpe_merges"  -> (TextAnalysis.bpeMerges _),
    // budget admission denominated in TRAINED tokens (the unit an LLM
    // trainer bills), not the pretoken proxy
    "token_budget_trained" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.tokenBudgetTrained(s, dir)),
    // water-filling allocation: cap every source at the level L with
    // sum(min(t, L)) <= budget — closed-form integer algebra over the
    // |sources|-row frame; the only corpus-sized work is the token sum
    "token_budget_waterfill" -> (TextAnalysis.tokenBudgetWaterfill _),
    "text_freq_class"  -> (TextAnalysis.freqClassQuality _),
    // bigram conditional-probability classes (CCNet-style LM quality,
    // one order up from the unigram freq-class proxy; integer log2)
    "text_lm_bigram"   -> (TextAnalysis.lmBigram _),
    // the serving form: top-K bigram/head maps broadcast as literals,
    // tail class 0 both sides (the live monitor's exact scoring rule)
    "text_lm_bigram_head" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.lmBigramHead(s, dir)),
    // the 100-TB form: top-K vocabulary head broadcast as a map literal,
    // default tail class, zero scoring joins (VERDICT r6 item 8)
    "text_freq_class_head" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.freqClassQualityHead(s, dir)),
    // distilled quality filter: integer batch-perceptron trained to
    // reproduce the rule-based editorial gate — per round ONE scan
    // collapsing to a (dim+2)-sum all-reduce, weights hash-replayed
    "quality_perceptron" -> (graft.functions.QualityModel.qualityPerceptron _),
    // train -> persist (weights + centering means) -> load -> score
    // from the LOADED model; must hash-equal plain quality_perceptron
    // (same oracle — the ann_ivf_deploy contract for the classifier)
    "quality_perceptron_deploy" ->
      (graft.functions.QualityModel.qualityPerceptronDeploy _),
    "ann_cosine_topk"  -> (Similarity.annBrute _),
    "ann_lsh_bucketed" -> (Similarity.annLsh _),
    "ann_lsh_multiprobe" -> (Similarity.annLshMultiProbe _),
    "ann_recall_at_k"  -> (Similarity.annRecallAtK _),
    "ann_ivf"          -> (Similarity.annIvf _),
    // train -> persist (artifact store) -> load -> search, end to end;
    // must hash-equal plain ann_ivf (same oracle)
    "ann_ivf_deploy"   -> (Similarity.annIvfDeploy _),
    "ann_pq"           -> (Similarity.annPq _),
    // codebook -> persist (float32 arrays) -> load -> encode/ADC/refine
    // from the LOADED copy; must hash-equal plain ann_pq (same oracle)
    "ann_pq_deploy"    -> (Similarity.annPqDeploy _),
    // recall-threshold gate for the TRAINED PQ codebook (k-means is not
    // oracle-reproducible in SQL; annBrute is value-hashed by its own
    // gate, so thresholded recall against it is the quality contract)
    "ann_pq_recall"    -> (Similarity.annPqRecall _),
    // recall gate for the TRAINED IVF codebook, planted-near-dup form:
    // brute-force recall@k is data-bound for a cell-restricted index on
    // an isotropic corpus (~nprobe/ncells), so the oracle-checkable
    // quality contract is locality — every planted near-dup query finds
    // its source (see Similarity.annIvfRecall scaladoc)
    "ann_ivf_recall"   -> (Similarity.annIvfRecall _),
    "ann_ivf_probe2"   -> (Similarity.annIvfProbe2 _),
    // the FAISS IVF-PQ composition: cell-bounded candidates, ADC-coded
    // scoring, constant exact refine — exact-oracle-checkable because
    // both codebooks are hash-picked
    "ann_ivf_pq"       -> (Similarity.annIvfPq _),
    // scalar 8-bit quantization (the FAISS SQ8 path): integer-exact
    // train/encode/score + constant exact refine — a FULL value oracle
    // (no recall adjudication anywhere in the SQ8 chain)
    "ann_sq8"          -> (Similarity.annSq8 _),
    // train -> persist (artifact store) -> load -> search; must
    // hash-equal plain ann_sq8 (same oracle — the ann_ivf_deploy
    // contract applied to the SQ8 bounds)
    "ann_sq8_deploy"   -> (Similarity.annSq8Deploy _),
    // the FAISS "IVF32,SQ8" composition: cells bound candidates, the
    // integer reconstruction dot scores them, constant exact refine —
    // value-hashed end to end (every trained stage is plain SQL)
    "ann_ivf_sq8"      -> (Similarity.annIvfSq8 _),
    "dedup_embedding"  -> (Similarity.dedupEmbedding _),
    // reciprocal-rank fusion of the BM25 head and per-query ANN top-k
    // (the standard hybrid-search combiner; integer rrf_ppm)
    "retrieval_rrf"    -> (Similarity.retrievalRrf _),
    "dedup_semantic"   -> (Similarity.dedupSemantic _),
    "sample_kcenter"   -> ((s: SparkSession, dir: String) => Similarity.sampleKcenter(s, dir)),
    // production form: incremental min-distance + IVF-cell pruning,
    // provably bit-identical output (same CTE-replay oracle)
    "sample_kcenter_ivf" -> ((s: SparkSession, dir: String) => Similarity.sampleKcenterIvf(s, dir)),
    "knn_join"         -> (Similarity.knnJoin _),
    "embed_centroids"  -> (Similarity.embedCentroids _),
    // fixed-point power iteration (BIGINT all the way — the q61
    // PageRank recipe applied to spectral analysis): one scan per round
    // collapsing to a 64-sum all-reduce row; the iterate is 64 longs of
    // driver state re-broadcast as literals
    "embed_pca_power"   -> (Similarity.embedPcaPower _),
    "embed_pca_project" -> (Similarity.embedPcaProject _),
    // top-m components via integer deflation (residual = e − sdiv(p·x,
    // Σx²), one sign-safe division per element) — m·(iters+1) one-scan
    // all-reduces, m·dim longs of driver state
    "embed_pca_topm"    -> (Similarity.embedPcaTopm _),
    // multi-axis separability card: ONE corpus scan computes all m
    // projections (m dot expressions + a generator stack to long form)
    "embed_pca_project_topm" -> (Similarity.embedPcaProjectTopm _),
    // fixed-point Lloyd k-means (clustering for topic bucketing /
    // mixture design): per round one scan — assignment is a per-row
    // codegen expression against k broadcast literal centroids, the
    // update a k-row all-reduce; hash-checkable unlike the float
    // PQ/IVF trainers
    "embed_kmeans"      -> (Similarity.embedKmeans _),
    // (cluster, label) contingency of the final assignment — the
    // purity card; shares the trained centroids via the kmeans memo
    "embed_kmeans_profile" -> (Similarity.embedKmeansProfile _),
    "text_rare_term"   -> (TextAnalysis.rareTerm _),
    "pii_scrub"        -> (TextAnalysis.piiScrub _),
    "quality_repetition" -> (TextAnalysis.qualityRepetition _),
    "text_top_terms"   -> ((s: SparkSession, dir: String) => TextAnalysis.topTerms(s, dir)),
    // exact-mode sketch gate: capacity >= vocabulary makes SpaceSaving
    // exact, so the plain top-k SQL is a full hash oracle; the
    // approximate regime is pinned in TopKSketchSpec
    "approx_top_terms" -> ((s: SparkSession, dir: String) => TextAnalysis.approxTopTerms(s, dir)),
    // exact-mode sketch gate, same strategy: capacity >= group size
    "approx_quantiles" -> (graft.functions.Profiling.approxQuantiles _),
    // integer-only HLL register summary (the float estimate is derived
    // driver-side — ln() ulp is not pinned cross-engine); accuracy of
    // the estimate itself is spec-pinned in HllSketchSpec
    "approx_ndv"       -> (graft.functions.Profiling.approxNdv _),
    "approx_ndv_overlap" -> (graft.functions.Profiling.approxNdvOverlap _),
    "approx_distinct_kmv" -> (graft.functions.Profiling.approxDistinctKmv _),
    // Count-Min point-frequency estimates: fully deterministic — both
    // engines compute identical md5-slice buckets, so even collision
    // inflation matches; error bounds/additivity pinned in CountMinSpec
    "approx_count_min" -> (graft.functions.Profiling.approxCountMin _),
    "column_profile"   -> (graft.functions.Profiling.columnProfile _),
    // integer-exact equi-width histograms (scaled-cent buckets — no
    // float division, so boundary values bucket identically cross-engine)
    "column_histogram" -> (graft.functions.Profiling.columnHistogram _),
    // equi-depth sibling: quantile-boundary buckets via a row-position
    // integer formula (no cross-engine ntile dependence)
    "column_histogram_depth" -> (graft.functions.Profiling.columnHistogramDepth _),
    // the sort-free giant-column escape: ceil(n·j/B)-rank boundary values
    // via band refinement, then range bucketing — no per-column full sort
    "column_histogram_depth_band" -> (graft.functions.Profiling.columnHistogramDepthBand _),
    // the sketch-NDV default for 100 TB profiling scans: one scan, no
    // countDistinct expand; integer HLL register columns like approx_ndv
    "column_profile_approx" -> (graft.functions.Profiling.columnProfileApprox _),
    "column_winsorize" -> (Relational.columnWinsorize _),
    "multimodal_meta"  -> (Multimodal.mediaMeta _),
    "multimodal_frames" -> (Multimodal.mediaFrames _),
    // END-TO-END CURATION COMPOSITION (PipelineDemo.curated): quality →
    // language → exact dedup → near-dup → decontaminate → sample →
    // budget → fingerprint, intersected — the cross-operator
    // interaction gate; every stage has its own oracle above, this one
    // pins the composition a real user actually runs
    "curation_pipeline" -> ((s: SparkSession, dir: String) =>
      graft.examples.PipelineDemo.curated(s, dir)
        .select("doc_id", "lang", "source", "fingerprint")
        .orderBy("doc_id")),
    // the pipeline's TERMINAL stage: training sequences packed over the
    // SURVIVORS (second-order composition — offsets depend on exactly
    // which docs survived upstream)
    "curation_packed" -> ((s: SparkSession, dir: String) =>
      TextAnalysis.packSequencesOf(graft.examples.PipelineDemo.curated(s, dir))),
    // the per-source DATA CARD: doc/token mass + every gate's rejection
    // count + survivors — the QA report published next to a corpus
    "report_source_card" -> (graft.examples.PipelineDemo.sourceCard _),
    // cross-source shared-shingle matrix + containment ppm — the
    // contamination diagnostic that triggers cross-source dedup
    "report_source_overlap" -> (Dedup.sourceOverlap _),
  )
}
