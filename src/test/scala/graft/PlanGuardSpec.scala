package graft

/** Plan-shape guard over EVERY registered gate query: no accidental
  * cartesian products, and broadcast nested-loop joins only where the
  * operator's design calls for one (brute-force ANN baselines and the
  * K-bounded IVF centroid-assignment cross join — a constant-size
  * broadcast side by construction). Construction-only for every audited
  * query, so the sweep costs seconds (construction is not strictly
  * job-free: the sign-LSH-width queries run one column-pruned count()
  * to size their bucket space — see Similarity.dimsOf). The two
  * iterative CC queries are excluded: building them EXECUTES the
  * fixpoint loop and the returned plan is only the post-loop label
  * join — their round-body join shape is pinned by PLANS.md and the
  * componentsStar specs instead.
  */
class PlanGuardSpec extends SparkTestBase {

  /** Queries whose design REQUIRES an unconditioned broadcast join:
    * ann_cosine_topk / ann_recall_at_k are the documented brute-force
    * exactness baselines; ann_ivf* cross-join each vector against the
    * broadcast centroid codebook (K = const) to pick its cell; ann_pq
    * is the PQ-compressed exhaustive ADC scan — each candidate against
    * the broadcast query set, reading M code ints per candidate (the
    * scan IS the design; IVF cells bound it when composed); bm25_score
    * cross-joins every document against the broadcast ONE-ROW corpus
    * statistics aggregate (N, avg length, per-term df); q43_zorder the
    * same against its ONE-ROW dimension min/max row; q42_upsert the
    * same against its ONE-ROW max-key row (derived insert offset);
    * ann_pq_recall composes the two by-design scans above (brute
    * baseline + trained-codebook ADC scan); ann_ivf_recall is the same
    * K-bounded centroid-assignment cross join as ann_ivf (over the
    * planted-dup corpus); dedup_semantic assigns every vector its top-2
    * cells through that same K-bounded codebook cross join (the
    * within-cell pair join itself is a plain equi-join on cell);
    * sample_temperature and token_budget_temperature cross-join the
    * |strata|-row weight table against its ONE-ROW weight-total
    * aggregate to derive targets; mix_epochs the same against its two
    * ONE-ROW totals (grand token mass, weight sum); q52_idle_capital
    * the same against its ONE-ROW positive-balance average row;
    * q55_triangles assembles its single output row from three ONE-ROW
    * aggregates (edge count, wedge sum, triangle count);
    * approx_distinct_kmv attaches its ONE-ROW shared-count aggregate
    * to the three per-set summary rows; dq_checks pairs each rule's
    * ONE-ROW violation count with its ONE-ROW checked count. (decontaminate_bloom_bitmap needs no
    * entry: its 128 KB bitmap embeds as a plan literal, so the probe is
    * a plain codegen'd filter — no join of any kind.) */
  private val bnljByDesign = Set(
    "ann_cosine_topk", "ann_recall_at_k", "ann_ivf", "ann_ivf_probe2", "ann_pq",
    "ann_ivf_pq",
    // ann_sq8 is ann_pq's exhaustive compressed scan with one-byte
    // levels instead of PQ codes: each candidate's q8 codes against the
    // broadcast query set, the float column read only for the bounded
    // shortlist re-rank
    "ann_sq8",
    // the deploy-path gate is ann_sq8 with a store round-trip: same
    // broadcast-query compressed scan, by design
    "ann_sq8_deploy",
    // ann_pq with a store round-trip: same ADC scan, by design
    "ann_pq_deploy",
    // ann_ivf_sq8 composes ann_ivf's K-bounded centroid-assignment
    // cross join with the SQ8 scoring stage
    "ann_ivf_sq8",
    // the deploy-path gate is ann_ivf with a store round-trip: same
    // K-bounded centroid-assignment cross join, by design
    "ann_ivf_deploy",
    "bm25_score",
    // retrieval_qlm rides bm25's chain: every document against the
    // broadcast ONE-ROW corpus statistics row (Σlen + per-term cf)
    "retrieval_qlm",
    "q43_zorder", "q42_upsert", "ann_pq_recall", "ann_ivf_recall",
    "dedup_semantic", "mix_epochs", "q52_idle_capital", "q55_triangles",
    "approx_distinct_kmv", "dq_checks",
    "sample_temperature", "token_budget_temperature",
    // q66 attaches its ONE-ROW basket-total aggregate to the 20
    // surviving pair rows
    "q66_assoc_rules",
    // q65's band machinery attaches three ONE-ROW broadcast frames
    // (sketch bounds, before-counts, boundary tuples) to the
    // customer frame — the documented by-design cross joins
    "q65_rfm",
    // q70 attaches its ONE-ROW core-stats aggregate to the 50 top rows
    "q70_kcore",
    // q74 attaches the ONE-ROW calendar-bounds aggregate to the
    // sampled user set before the spine explode
    "q74_gap_fill",
    // column_winsorize: the band machinery's one-row bound frames
    // (the q65/q41 pattern)
    "column_winsorize",
    // q77 attaches its ONE-ROW global-prior aggregate to the fact
    // before the scan-speed encode projection
    "q77_target_encode",
    // q79 attaches its ONE-ROW midpoint aggregate to the fact to
    // split reference/live halves
    "q79_drift_chisq",
    // q83 uses q79's midpoint split (the same one-row broadcast)
    "q83_ks_test",
    // q84 uses the same one-row midpoint split as q79/q83
    "q84_mann_whitney",
    // the composed panel carries q79's midpoint split in its chi branch
    "report_drift_panel",
    // waterfill attaches its ONE-ROW (budget, n_src) aggregate to the
    // |sources|-row frame
    "token_budget_waterfill",
    // rrf composes ann_cosine_topk + bm25_score (both whitelisted) and
    // crosses the 8-row qid set with the 5-row lexical head
    "retrieval_rrf")

  /** Iterative queries whose construction runs the loop (see scaladoc). */
  private val iterative =
    Set("dedup_components", "dedup_components_minlabel", "dedup_canonical",
      // runs the same CC fixpoint at construction; its two ONE-ROW
      // aggregates attach by design (the q55_triangles pattern)
      "report_split_contamination")

  test("no gate query plans a cartesian product or an unexpected nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => iterative(name) }
      .flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljByDesign(name)
      if (cartesian || bnlj)
        Some(s"$name: ${if (cartesian) "CartesianProduct " else ""}${if (bnlj) "BroadcastNestedLoopJoin" else ""}")
      else None
    }
    assert(offenders.isEmpty, s"scale-hostile joins crept in:\n${offenders.mkString("\n")}")
  }

  test("global (single-partition) windows appear only at the documented tiny-frame sites") {
    // r20 (VERDICT r19 item 8): WindowExec's single-partition WARN is
    // silenced in Verify, so THIS guard is what catches a real
    // unbounded-window regression — any gate whose optimized plan
    // carries a Window with an EMPTY partitionSpec must be one of the
    // documented ≤|keys|-row frames (rationale in each scaladoc).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val globalWindowByDesign = Set(
      // survival tail: ≤ |distinct lifetimes| rows
      "q82_survival",
      // rrf lexical head: the TopK survivors only
      "retrieval_rrf",
      // waterfill prefix scan: |sources| rows
      "token_budget_waterfill")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => iterative(name) }
      .flatMap { case (name, fn) =>
        val global = fn(spark, sf0001).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty && !globalWindowByDesign(name)) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"undocumented single-partition window in: ${offenders.mkString(", ")}")
  }

  test("scan-speed encode family: the fact itself never hash-shuffles") {
    // q77's documented scale claim: encoding is a map stage — the only
    // hashpartitioning exchange carries the |categories|-row stats
    // aggregate, never the fact. feature_hash collapses map-side onto
    // <= 1024 buckets, so its single hashpartitioning exchange moves
    // bucket rows. q80/q81 fold the fact in ONE user exchange. Pin the
    // counts so a refactor that sneaks in a fact shuffle fails loudly.
    Seq("q77_target_encode" -> 1, "feature_hash" -> 1,
        "q80_sequence_motifs" -> 1, "q81_ab_chisq" -> 1).foreach {
      case (q, expected) =>
        val plan = SparkEntry.queries(q)(spark, sf0001)
          .queryExecution.executedPlan.toString
        val n = "Exchange hashpartitioning\\(".r.findAllIn(plan).size
        assert(n == expected,
          s"$q: expected $expected hashpartitioning exchanges, found $n")
    }
  }

  test("one-exchange product-analytics family shuffles the fact exactly once on user_id") {
    // q58/q62/q63's documented scale claim is structural: ONE
    // hashpartitioning exchange on user_id carries the whole analysis
    // (windows and the session sub-partitioning reuse it); the final
    // tiny aggregate/orderBy exchanges move ≤ cohort-count rows, never
    // the fact. Pin it so a refactor that sneaks in a second fact
    // shuffle (e.g. a window keyed before the exchange-compatible
    // prefix) fails loudly.
    Seq("q58_transitions", "q62_attribution", "q63_session_funnel",
        "q69_path_topk").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.executedPlan.toString
      val userExchanges = "Exchange hashpartitioning\\(user_id".r
        .findAllIn(plan).size
      assert(userExchanges == 1,
        s"$q: expected exactly one user_id exchange, found $userExchanges")
    }
  }
}
