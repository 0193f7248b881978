package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.expressions.QuantileSketchAgg

/** Data-profiling aggregates for the curation pipeline: distribution
  * statistics computed with bounded-state mergeable sketches rather
  * than per-group value buffers. The quantile sketch is the
  * order-statistics sibling of the SpaceSaving heavy-hitter sketch —
  * together they are the two profiling summaries a 100 TB corpus scan
  * ships back per column/group.
  */
object Profiling {

  /** Gate regime: capacity above the largest l_returnflag group at any
    * test SF, so the sketch never compacts and the nearest-rank outputs
    * are exact (the oracle is plain ranked SQL). The genuinely
    * compacting regime is pinned in QuantileSketchSpec. */
  val QuantileGateCapacity: Int = 1 << 19
  val GateFractions: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95)

  /** Per-group nearest-rank quantiles of l_quantity via the mergeable
    * sketch aggregate: one shuffle of O(capacity) partials per group —
    * map-side combine, no per-group global sort (contrast q28's exact
    * interpolated path, which must sort the group). */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
      .groupBy("l_returnflag")
      .agg(QuantileSketchAgg(col("v"), QuantileGateCapacity, GateFractions).as("qs"))
      .select(col("l_returnflag"),
        element_at(col("qs"), 1).as("q25"),
        element_at(col("qs"), 2).as("q50"),
        element_at(col("qs"), 3).as("q75"),
        element_at(col("qs"), 4).as("q95"))
      .orderBy("l_returnflag")

  /** Numeric columns profiled by [[columnProfile]]. */
  val ProfileColumns: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** ANALYZE-style COLUMN PROFILE — the statistics pass that feeds a
    * cost-based optimizer and a data-quality dashboard: per column, row
    * count, null count, exact distinct count, min, max, and exact sum
    * (decimal-exact, emitted as double at the boundary like every money
    * column). One `stack` pivots the columns into (column_name, value)
    * rows so the whole profile is ONE scan + ONE 4-group aggregate, not
    * a scan per column; the long output shape is also what a stats
    * catalog stores.
    *
    * Scale: stack multiplies rows × columns BEFORE the combiner, but
    * the partial aggregate collapses each map task to #columns rows —
    * the exchange carries columns, not data. countDistinct expands per
    * column (q31's expand shape); swap in the HLL register summary
    * ([[hllSummary]]) when exactness is not required. */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val stackArgs = ProfileColumns
      .map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")
    // spread BEFORE the stack (r19): the stack ×4 row expansion and the
    // countDistinct expand otherwise run inside the single scan task
    Tables.spread(s, Tables.lineitem(s, dir).select(ProfileColumns.map(col): _*))
      .select(expr(s"stack(${ProfileColumns.size}, $stackArgs) AS (column_name, v)"))
      .groupBy("column_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        sum(col("v").cast("decimal(28,2)")).cast("double").as("sum_v"))
      .orderBy("column_name")
  }

  /** Equi-width histogram bucket count for [[columnHistogram]]. */
  val HistogramBuckets = 8

  /** EQUI-WIDTH HISTOGRAMS — the per-column bucket counts an optimizer's
    * selectivity estimation and a data-quality dashboard consume,
    * completing the ANALYZE family ([[columnProfile]] scalar stats,
    * [[columnProfileApprox]] sketched NDV, this → distribution shape).
    *
    * Bucket assignment is INTEGER-exact so the gate is cross-engine
    * deterministic: values are ≤2-decimal numerics, scaled to BIGINT
    * cents (`round(v·100)` — the scaled-integer discipline of
    * [[columnProfileApprox]]); with R = maxi−mini+1,
    * `bucket = (vi−mini)·B div R` ∈ [0,B) and bucket i spans cents
    * [mini+⌈iR/B⌉, mini+⌈(i+1)R/B⌉−1] — no float division anywhere (a
    * float `(v−min)/width` puts boundary values in engine-dependent
    * buckets at ulp differences). Edges are emitted as integer cents;
    * empty buckets emit no row (identically in both engines).
    *
    * Scale shape: one stats pass (per-column min/max → a #columns-row
    * broadcast) and one bucket pass (partial+final aggregate — each map
    * task ships ≤ #columns·B rows). The two-pass broadcast histogram is
    * the standard shape at any corpus size. */
  def columnHistogram(s: SparkSession, dir: String): DataFrame = {
    val B = HistogramBuckets
    val stackArgs = ProfileColumns
      .map(c => s"'$c', CAST(round($c * 100) AS BIGINT)").mkString(", ")
    val vals = Tables.spread(s,
      Tables.lineitem(s, dir).select(ProfileColumns.map(col): _*))
      .select(expr(s"stack(${ProfileColumns.size}, $stackArgs) AS (column_name, vi)"))
      .filter(col("vi").isNotNull)
    val stats = vals.groupBy("column_name")
      .agg(min("vi").as("mini"), max("vi").as("maxi"))
    vals.join(broadcast(stats), Seq("column_name"))
      .withColumn("bucket",
        expr(s"((vi - mini) * CAST($B AS BIGINT)) div (maxi - mini + 1)"))
      .groupBy("column_name", "bucket", "mini", "maxi")
      .agg(count(lit(1)).as("n"))
      .select(col("column_name"), col("bucket"),
        expr(s"mini + ((bucket * (maxi - mini + 1) + ${B - 1}) div $B)").as("lo_cents"),
        expr(s"mini + (((bucket + 1) * (maxi - mini + 1) + ${B - 1}) div $B) - 1").as("hi_cents"),
        col("n"))
      .orderBy("column_name", "bucket")
  }

  /** EQUI-DEPTH HISTOGRAMS — [[columnHistogram]]'s sibling: buckets hold
    * (near-)equal ROW counts and the boundaries are the quantiles, the
    * form selectivity estimators prefer on skewed columns (equi-width
    * collapses skew into one over-full bucket; equi-depth spends its
    * resolution where the data is).
    *
    * Determinism without `ntile`: rows rank by the scaled-cent value per
    * column (`rn = row_number` ordering by vi; ties split arbitrarily,
    * but the VALUE at each sorted position is a multiset property, so
    * per-bucket min/max/count never depend on the tie split), and
    * `bucket = (rn−1)·B div n` — our own integer formula rather than
    * relying on cross-engine `ntile` edge semantics. All outputs are
    * integer cents/counts.
    *
    * Scale shape (r19): a distinct-collapse + cumulative counts over the
    * distinct table replay the rank formula exactly without ever sorting
    * raw rows — see [[depthHistogramExact]]. [[columnHistogramDepthBand]]
    * remains the fully sort-free sibling whose boundaries are
    * VALUE-determined (tie groups kept whole) via the q41
    * band-refinement quantile path. */
  def columnHistogramDepth(s: SparkSession, dir: String): DataFrame =
    depthHistogramExact(stackedCents(s, dir), HistogramBuckets)

  /** The stacked (column_name, vi) scaled-cent rows both equi-depth forms
    * consume — one scan, columns pivoted long, nulls dropped. */
  private def stackedCents(s: SparkSession, dir: String): DataFrame = {
    val stackArgs = ProfileColumns
      .map(c => s"'$c', CAST(round($c * 100) AS BIGINT)").mkString(", ")
    Tables.spread(s, Tables.lineitem(s, dir).select(ProfileColumns.map(col): _*))
      .select(expr(s"stack(${ProfileColumns.size}, $stackArgs) AS (column_name, vi)"))
      .filter(col("vi").isNotNull)
  }

  /** Exact equi-depth core over (column_name, vi) rows — rank semantics
    * of a per-column sort + `bucket = (rn−1)·B div n`, factored so the
    * band form's differential spec can drive both on the same input.
    *
    * r19 rewrite (guide §2.5 giant-group trap): the previous form
    * row_number'd EVERY raw row over a window partitioned by
    * column_name — a per-column single-task sort of the whole column
    * (2.4M rows in 4 tasks at sf0.1; at 100 TB, one task sorts one
    * column — the scale-killer its own scaladoc used to apologize for).
    * Every per-bucket output is a multiset property of rank intervals:
    * bucket b holds ranks [⌈bn/B⌉+1, ⌈(b+1)n/B⌉] (proof: (rn−1)·B div n
    * = b ⟺ rn−1 ∈ [⌈bn/B⌉, ⌈(b+1)n/B⌉−1]), so
    *   n_b  = ⌈(b+1)n/B⌉ − ⌈bn/B⌉           (pure arithmetic),
    *   lo_b = value at rank ⌈bn/B⌉+1, hi_b = value at rank ⌈(b+1)n/B⌉,
    * and the 2B boundary values come from the SAME cell-refinement
    * machinery the band form uses ([[valuesAtRanks]]) — distinct
    * collapse, per-cell running totals, tiny per-(column, target)
    * windows over single cells. No full sort of anything, anywhere;
    * the heaviest pass is the distinct collapse (map-side combined).
    * Tie groups still SPLIT across bucket boundaries by rank exactly
    * as a row_number would (bucket counts stay max−min ≤ 1 — pinned by
    * HistogramSpec's balance test and the band differential; the gate
    * output is hash-identical to the sort form's).
    *
    * Tried and rejected on the way here (r19): count(*) OVER an
    * unbounded frame (buffers whole partitions, +0.8 s task time);
    * cumulative counts over the whole distinct table (l_extendedprice
    * is 97% unique at sf0.1 — 583k of 600k — so the per-column
    * key-capped window stayed a ~1.4 s single task). */
  private[graft] def depthHistogramExact(
      vals: DataFrame, B: Int, refineCells: Int = 1024): DataFrame = {
    val W = refineCells
    val d = vals.groupBy("column_name", "vi").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val stats = d.groupBy("column_name").agg(
      min("vi").as("mini"), max("vi").as("maxi"), sum("cnt").as("n"))
    val dc = d.join(broadcast(stats), Seq("column_name"))
      .withColumn("cell",
        expr(s"((vi - mini) * CAST($W AS BIGINT)) div (maxi - mini + 1)"))
    // 2 rank targets per bucket: j = 2b locates lo_b, j = 2b+1 hi_b;
    // buckets whose rank interval is empty (n < B) drop out here and
    // emit no row, exactly like the rank formula
    val buckets = stats.select(col("column_name"), col("n"),
        explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${B - 1} AS BIGINT))"))
          .as("bucket"))
      .withColumn("r_lo", expr(s"(bucket * n + ${B - 1}) div $B + 1"))
      .withColumn("r_hi", expr(s"((bucket + 1) * n + ${B - 1}) div $B"))
      .filter(col("r_hi") >= col("r_lo"))
    val jtab = buckets.select(col("column_name"),
        (col("bucket") * 2).as("j"), col("r_lo").as("rj"))
      .unionByName(buckets.select(col("column_name"),
        (col("bucket") * 2 + 1).as("j"), col("r_hi").as("rj")))
    val tvals = valuesAtRanks(dc, jtab)
    val lo = tvals.filter(pmod(col("j"), lit(2L)) === 0L)
      .select(col("column_name"), expr("j div 2").as("bucket"),
        col("t").as("lo_cents"))
    val hi = tvals.filter(pmod(col("j"), lit(2L)) === 1L)
      .select(col("column_name"), expr("(j - 1) div 2").as("bucket"),
        col("t").as("hi_cents"))
    buckets
      .select(col("column_name"), col("bucket"),
        (col("r_hi") - col("r_lo") + 1L).as("n"))
      .join(lo, Seq("column_name", "bucket"))
      .join(hi, Seq("column_name", "bucket"))
      .select("column_name", "bucket", "lo_cents", "hi_cents", "n")
      .orderBy("column_name", "bucket")
  }

  /** Value at sorted position rj per (column_name, j) target — the band
    * refinement core, factored (r19) so [[depthHistogramExact]] can
    * locate its 2B bucket-boundary ranks through the same machinery.
    * `dc` = (column_name, vi, cnt, cell) distinct rows with their
    * equi-width refinement cell; `jtab` = (column_name, j, rj) targets,
    * 1 ≤ rj ≤ n. Per-cell count sums + a running total over the
    * ≤ #columns·W cell rows locate each target's covering cell; only
    * that cell's distinct values rank (tiny per-(column, j) windows).
    * Returns (column_name, j, t) — exactly one row per target. */
  private def valuesAtRanks(dc: DataFrame, jtab: DataFrame): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("column_name").orderBy("cell")
    val cells = dc.groupBy("column_name", "cell").agg(sum("cnt").as("cnt_c"))
      .withColumn("cum_hi", sum("cnt_c").over(wCum))
    val located = cells.join(jtab, Seq("column_name"))
      .filter(col("cum_hi") >= col("rj") &&
        col("cum_hi") - col("cnt_c") < col("rj"))
      .select(col("column_name"), col("j"), col("cell"),
        (col("cum_hi") - col("cnt_c")).as("below"), col("rj"))
    val wBand = org.apache.spark.sql.expressions.Window
      .partitionBy("column_name", "j").orderBy("vi")
    dc.join(broadcast(located), Seq("column_name", "cell"))
      .withColumn("cum", sum("cnt").over(wBand))
      .filter(col("below") + col("cum") >= col("rj") &&
        col("below") + col("cum") - col("cnt") < col("rj"))
      .select(col("column_name"), col("j"), col("vi").as("t"))
  }

  /** SORT-FREE equi-depth histogram — the giant-column escape the
    * [[columnHistogramDepth]] Scaladoc promises, now as code: no full
    * sort of the data anywhere in the plan, so a column whose rows don't
    * fit one task's sort still histograms at scan-plus-small-aggregates
    * cost.
    *
    * Shape — ONE raw scan, then everything runs on the DISTINCT table
    * (the [[columnProfileApprox]] collapse discipline; a first cut kept
    * raw rows through a t-digest band pipeline and benched 7.5 s vs the
    * exact sort's 4.2 at sf0.1 — tie groups flooded the bands and the
    * sketch insert alone cost 2.7 s; this form benches ~2 s):
    *  1. collapse to (column, value, cnt) — map-side combine does most
    *     of it before the only exchange that sees data volume;
    *  2. equi-width REFINEMENT CELLS over the distinct values (the
    *     integer [[columnHistogram]] cell rule, W cells): per-cell cnt
    *     sums + a running total over the ≤ #columns·W cell rows locate,
    *     for each target rank r_j = ⌈n·j/B⌉, the cell containing it and
    *     the exact count below that cell;
    *  3. only the located cells' distinct values rank (tiny per-(column,
    *     boundary) windows): boundary t_j = first value whose cumulative
    *     count reaches r_j — exactly the value at sorted position r_j;
    *  4. buckets assign by RANGE comparison against the ≤ B−1 per-column
    *     boundary values (broadcast array; `bucket = #{t_j < v}`) over
    *     the distinct table; min/max/Σcnt per bucket finishes.
    *
    * Semantics vs the exact form: with ⌈n·j/B⌉ boundaries the range rule
    * is IDENTICAL to the exact (rn−1)·B div n rank formula whenever no
    * tie group straddles a boundary (proof: rank rn's exact bucket
    * = #{j: rn−1 ≥ j·n/B} = #{j: rn > ⌈j·n/B⌉}); a straddling tie group
    * lands whole in the lower bucket here (value-determined buckets)
    * where the exact form splits it by arbitrary rank. Both are
    * engine-deterministic; the differential spec pins equality on
    * tie-free data and the tie-group contract on skewed data.
    *
    * 100 TB posture: the distinct table of a unique-ish column is still
    * data-sized, but every pass over it is a hash-aggregate or broadcast-
    * join scan — the only windows run over cell summaries (≤ W rows per
    * column) and single-cell value sets (n_distinct/W expected; a
    * pathological value cluster inside one cell would recurse the same
    * cell split, not fall back to a sort). */
  private[graft] def depthHistogramBand(
      vals: DataFrame, B: Int, refineCells: Int = 1024): DataFrame = {
    val W = refineCells
    // the distinct-collapse is referenced by FOUR downstream paths
    // (stats, cell refinement, boundary ranking, final bucketing) —
    // uncheckpointed, each re-runs the full scan+aggregate (measured
    // 3.99 s → 3.50 s at sf0.1 — the collapse itself is cheap locally,
    // but at 100 TB each re-run is a full corpus scan, which is the
    // difference that matters). Lazy localCheckpoint materializes it
    // once (≤ Σ per-column NDV rows — the natural 100-TB intermediate,
    // which a production profiler would persist anyway); same pattern
    // as the connected-components rounds.
    val d = vals.groupBy("column_name", "vi").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val stats = d.groupBy("column_name").agg(
      min("vi").as("mini"), max("vi").as("maxi"), sum("cnt").as("n"))
    val dc = d.join(broadcast(stats), Seq("column_name"))
      .withColumn("cell",
        expr(s"((vi - mini) * CAST($W AS BIGINT)) div (maxi - mini + 1)"))
    // per-column boundary ranks r_j = ceil(n*j/B), j = 1..B-1; the
    // covering-cell location + single-cell ranking is the shared
    // [[valuesAtRanks]] core (r19 factoring — the exact form locates
    // its bucket-boundary ranks through the same machinery)
    val jtab = stats.select(col("column_name"), col("n"),
        explode(expr(s"sequence(1, ${B - 1})")).as("j"))
      .withColumn("rj", expr(s"(n * j + ${B - 1}) div $B"))
      .select("column_name", "j", "rj")
    val bounds = valuesAtRanks(dc, jtab)
      .select(col("column_name"), col("t"))
    val bmap = bounds.groupBy("column_name")
      .agg(sort_array(collect_list(col("t"))).as("ts"))
    d.join(broadcast(bmap), Seq("column_name"))
      .withColumn("bucket", expr("CAST(size(filter(ts, t -> vi > t)) AS BIGINT)"))
      .groupBy("column_name", "bucket")
      .agg(min(col("vi")).as("lo_cents"), max(col("vi")).as("hi_cents"),
        sum(col("cnt")).as("n"))
      .orderBy("column_name", "bucket")
  }

  /** Gate form of [[depthHistogramBand]] on the profile columns. */
  def columnHistogramDepthBand(s: SparkSession, dir: String): DataFrame =
    depthHistogramBand(stackedCents(s, dir), HistogramBuckets)

  /** [[columnProfile]] with SKETCHED NDV — the form a 100 TB profiling
    * scan should default to (the exact `countDistinct` above plans a
    * #columns-way expand of the full scan; it stays registered as the
    * exact-oracle gate). NDV is carried as the integer HLL register
    * summary (n_buckets_hit, sum_rank, z_scaled — same columns as
    * [[approxNdv]], estimate derived via [[hllEstimate]]; accuracy
    * spec-pinned in HllSketchSpec).
    *
    * ONE scan, no expand, three stacked aggregates: level 0 collapses
    * to DISTINCT (column, value) with a count (map-side combine does
    * most of it before the first exchange — and it is what bounds the
    * digest cost: each distinct value is hashed ONCE, not once per
    * row); level 1 groups by (column, register-bucket) carrying the
    * count-weighted stats partials AND the register max-rank; level 2
    * folds ≤ #columns·(2^p+1) rows into one row per column.
    *
    * Hash key: values are ≤ 2-decimal numerics, hashed as the scaled
    * INTEGER string `CAST(round(v·100) AS BIGINT)` — double→string
    * formatting is NOT engine-stable (scientific-notation cutoffs
    * differ), while the scaled-integer string is identical in both
    * engines (v·100 is the same IEEE double; round-half-up equals
    * DuckDB's round-half-away for the positive values here, and the
    * ≤ 2-decimal inputs keep fp error orders of magnitude below 0.5).
    * h52 is the first 13 hex chars of ONE md5 — the h32·2^20+h32b
    * construction [[hllSummary]] keeps (for its text-token gate parity)
    * digests the same key twice; this variant halves that. */
  def columnProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val stackArgs = ProfileColumns
      .map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")
    // Hash cost discipline (the reason this beats the exact expand):
    //  1. hash once per DISTINCT (column, value) — the level-0 aggregate
    //     collapses the stacked rows map-side before any digest runs
    //     (2.4M stacked rows → ~600k distinct at sf0.1; a price column
    //     is the worst case, every other column collapses 10-10^5×);
    //  2. ONE md5 per key, h52 = its first 13 hex chars (52 bits) —
    //     the h32/h32b construction [[hllSummary]] uses costs a second
    //     digest of the same key for its low 20 bits (measured 2×).
    // Stats ride the same pre-aggregate weighted by the distinct count,
    // so the whole profile is still one scan.
    val key = round(col("v") * 100).cast("long").cast("string")
    val h52 = expr("CAST(conv(substring(md5(k), 1, 13), 16, 10) AS BIGINT)")
    val w = shiftrightunsigned(col("h52"), HllP)
    val rank = when(w === 0L, lit(HllMaxRank.toLong))
      .otherwise(lit(HllMaxRank.toLong) - length(bin(w)).cast("long"))
    Tables.spread(s, Tables.lineitem(s, dir).select(ProfileColumns.map(col): _*))
      .select(expr(s"stack(${ProfileColumns.size}, $stackArgs) AS (column_name, v)"))
      .groupBy("column_name", "v")
      .agg(count(lit(1)).as("n"))
      .withColumn("k", key)
      .withColumn("h52", h52)
      .select(col("column_name"), col("v"), col("n"),
        pmod(col("h52"), lit(HllM.toLong)).as("bucket"), rank.as("rank"))
      .groupBy("column_name", "bucket")
      .agg(
        sum(col("n")).as("c_rows"),
        sum(when(col("v").isNull, col("n")).otherwise(0L)).as("c_null"),
        min(col("v")).as("min_p"),
        max(col("v")).as("max_p"),
        sum(col("v").cast("decimal(28,2)") * col("n")).as("sum_p"),
        max(col("rank")).as("r"))
      .groupBy("column_name")
      .agg(
        sum(col("c_rows")).as("n_rows"),
        sum(col("c_null")).as("n_null"),
        min(col("min_p")).as("min_v"),
        max(col("max_p")).as("max_v"),
        sum(col("sum_p")).cast("double").as("sum_v"),
        // NULL values hash to a NULL bucket: that partial row carries
        // null counts but is no register hit
        count(when(col("bucket").isNotNull, lit(1))).as("n_buckets_hit"),
        sum(when(col("bucket").isNotNull, col("r"))).as("sum_rank"),
        sum(when(col("bucket").isNotNull,
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllMaxRank - r AS INT))")))
          .as("z_scaled"))
      .orderBy("column_name")
  }

  /** HyperLogLog register geometry (Flajolet et al. 2007): 2^p registers
    * over a 52-bit md5-derived hash (bits 52-p feed the rank). 52 bits
    * keeps every intermediate — h52, the scaled harmonic denominator
    * Σ 2^(44-M_j) ≤ m·2^44 — inside exact BIGINT/double-53-bit range in
    * BOTH engines; the 32-bit-hash ceiling (~10^8 distinct) that a
    * production 64-bit variant lifts does not apply. */
  val HllP = 9
  val HllM: Int = 1 << HllP
  val HllHashBits = 52
  /** Max rank: rank of w = 0, i.e. hashBits - p zero bits + 1. */
  val HllMaxRank: Int = HllHashBits - HllP + 1

  /** Per-source distinct-token ESTIMATION sketch (`approx_ndv`): HLL
    * registers as a two-level aggregate. The gate output is integer-only
    * — register-hit count, rank sum, and the 2^44-scaled harmonic
    * denominator — because those are exact in both engines, while the
    * float estimate divides through `ln` whose libm/JVM ulp is NOT
    * pinned cross-engine; [[hllEstimate]] derives the estimate from the
    * gate columns and its accuracy is spec-pinned (HllSketchSpec).
    *
    * Scale shape: no distinct-shuffle of the token set (that is q31's
    * exact path). The first aggregate keys on (source, bucket) — each
    * map task emits at most groups × 2^p partial rows regardless of
    * input size — and the second folds 2^p rows per group. An exact
    * `n_exact` column rides along for the gate's fidelity display at
    * test SF; a production profiling scan drops it (it IS the expensive
    * exact path the sketch replaces). */
  /** HLL register summary of a (group, tok) frame: one row per group
    * with the integer register aggregates [[hllEstimate]] consumes.
    * Two-level aggregate: (group, bucket) max-rank — each map task
    * emits at most groups × 2^p partial rows regardless of input size —
    * then a 2^p-row fold per group.
    *
    * Σ 2^(-M_j) over HIT registers is scaled by 2^maxRank so it stays
    * exact integer math: each register contributes 2^(maxRank - M_j),
    * with M_j ∈ [1, maxRank] ⇒ exponent ∈ [0, maxRank-1]; the total is
    * ≤ m·2^43 < 2^53, inside exact BIGINT (and double) range in both
    * engines. */
  def hllSummary(toks: DataFrame, group: String, tok: String): DataFrame =
    hllSummarize(hllRegisters(toks, group, tok), group)

  /** HLL REGISTER TABLE of a (group, tok) frame: one row per (group,
    * bucket) with the max rank — the MERGEABLE form of the sketch.
    * Registers of disjoint scans (shards, days, tables) union by
    * per-bucket max without touching the underlying data again; see
    * [[approxNdvOverlap]] for the set-algebra consumer. */
  def hllRegisters(toks: DataFrame, group: String, tok: String): DataFrame = {
    import graft.functions.Portable.{h32, h32b}
    val h52 = h32(col(tok)) * lit(1L << 20) + pmod(h32b(col(tok)), lit(1L << 20))
    val w = shiftrightunsigned(col("h52"), HllP)
    val rank = when(w === 0L, lit(HllMaxRank.toLong))
      .otherwise(lit(HllMaxRank.toLong) - length(bin(w)).cast("long"))
    toks
      .select(col(group), h52.as("h52"))
      .select(col(group), pmod(col("h52"), lit(HllM.toLong)).as("bucket"),
        rank.as("rank"))
      .groupBy(group, "bucket")
      .agg(max(col("rank")).as("r"))
  }

  /** Fold a register table ([[hllRegisters]] shape: group, bucket, r)
    * into the per-group integer summary the gates emit. */
  def hllSummarize(regs: DataFrame, group: String): DataFrame =
    regs
      .groupBy(group)
      .agg(
        count(lit(1)).as("n_buckets_hit"),
        sum(col("r")).as("sum_rank"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllMaxRank - r AS INT))"))
          .as("z_scaled"))

  def approxNdv(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.tokens
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val exact = toks
      .groupBy("source")
      .agg(countDistinct(col("tok")).as("n_exact"))
    hllSummary(toks, "source", "tok").join(exact, Seq("source"))
      .select("source", "n_buckets_hit", "sum_rank", "z_scaled", "n_exact")
      .orderBy("source")
  }

  /** HLL SET ALGEBRA (`approx_ndv_overlap`): distinct-customer sketches
    * of two order years, UNIONED BY MERGING REGISTERS — per-bucket max
    * over a full-outer bucket join of the two 2^p-row register tables,
    * never rescanning the fact — with the intersection estimate derived
    * by inclusion-exclusion (est(A) + est(B) − est(A∪B), the standard
    * HLL intersection rule; accuracy spec-pinned in HllSketchSpec).
    * This is the property that makes sketches infrastructure rather
    * than one-shot aggregates: per-shard/day register tables are stored
    * small (2^p rows) and any union of shards is answerable later by
    * max-merge alone.
    *
    * Scale shape: one fact scan builds both sets' registers (map tasks
    * emit ≤ sets·2^p partial rows), the merge join touches ≤ 2·2^p
    * rows, and the exact n_exact fidelity columns are the gate-SF
    * display only (a production profile drops them — they ARE the
    * distinct-shuffle the sketch replaces). The gate emits the merged
    * register summaries as exact integers; rank ≥ 1 makes −1 a safe
    * absent-bucket sentinel under greatest(). */
  def approxNdvOverlap(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(
        when(year(col("o_orderdate")) === 1996, "a").otherwise("b").as("set_id"),
        col("o_custkey").cast("string").as("ck"))
    val regs = hllRegisters(base, "set_id", "ck")
    val merged = regs.filter(col("set_id") === "a")
      .select(col("bucket"), col("r").as("ra"))
      .join(
        regs.filter(col("set_id") === "b")
          .select(col("bucket").as("bucket_b"), col("r").as("rb")),
        col("bucket") === col("bucket_b"), "full_outer")
      .select(
        lit("union").as("set_id"),
        coalesce(col("bucket"), col("bucket_b")).as("bucket"),
        greatest(coalesce(col("ra"), lit(-1L)), coalesce(col("rb"), lit(-1L)))
          .as("r"))
    val exact = base
      .groupBy("set_id")
      .agg(countDistinct(col("ck")).as("n_exact"))
      .unionByName(base
        .agg(countDistinct(col("ck")).as("n_exact"))
        .select(lit("union").as("set_id"), col("n_exact")))
    hllSummarize(regs.unionByName(merged), "set_id")
      .join(exact, Seq("set_id"))
      .select("set_id", "n_buckets_hit", "sum_rank", "z_scaled", "n_exact")
      .orderBy("set_id")
  }

  /** KMV sketch size: estimate standard error ≈ 1/√(k−2) ≈ 6.3%. */
  val KmvK = 256

  /** KMV / THETA-style distinct sketch (`approx_distinct_kmv` — Bar-
    * Yossef et al. 2002; the Apache DataSketches theta family): each
    * set keeps its k SMALLEST distinct hash values. Where HLL registers
    * only union cleanly, KMV supports INTERSECTION natively: the k-min
    * set of A∪B is the k smallest of kA ∪ kB (never re-touching the
    * data), and |kU ∩ kA ∩ kB| / k estimates Jaccard directly — times
    * the union estimate, an intersection cardinality with bounded
    * relative error where inclusion-exclusion's error explodes for
    * small overlaps. The sketch is a SET OF EXACT BIGINTs, so the gate
    * hash-checks the entire sketch state cross-engine (stronger than a
    * summary check), and the estimate is derived driver-side
    * ([[kmvEstimate]], accuracy spec-pinned).
    *
    * Scale shape: the per-set k-min is a rank-≤-k window filter —
    * Spark's InferWindowGroupLimit turns it into a map-side per-
    * partition top-k BEFORE the exchange (the q10 WindowGroupLimit
    * machinery), so each map task ships ≤ sets·k values; the union
    * merge then ranks ≤ 2k rows. Output: one row per set (a, b,
    * union) with the sketch size, the k-th smallest value (the theta
    * threshold), an exact-NDV fidelity column, and on the union row
    * the shared-value count that numerates the Jaccard estimate. */
  def approxDistinctKmv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(
        when(year(col("o_orderdate")) === 1996, "a").otherwise("b").as("set_id"),
        col("o_custkey").cast("string").as("ck"))
    // r19 (guide §2.4 "do fewer shuffles"): ONE fact-wide distinct feeds
    // the sketch AND all three exact-NDV fidelity columns — previously
    // the fact was distinct-shuffled three times (hashed distinct +
    // grouped countDistinct + global countDistinct, each its own expand
    // over the scan). localCheckpoint: d has four consumers.
    val d = base.distinct().localCheckpoint(eager = false)
    // (set_id, h) re-distincts AFTER hashing: two ck values colliding in
    // h52 within a set must collapse exactly as before
    val hashed = d.select(col("set_id"), h52Of(col("ck")).as("h")).distinct()
    val w = Window.partitionBy("set_id").orderBy("h")
    val kmins = hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .select("set_id", "h")
    // K smallest union hashes via sort+limit, NOT a global window: this
    // plans as TakeOrderedAndProject (map-side partial top-K per
    // partition, K-row final merge) — the union input is already ≤ 2K
    // rows here, but the form stays scale-safe and never single-tasks
    val unionK = kmins.select(col("h")).distinct()
      .orderBy("h").limit(KmvK)
      .select(lit("union").as("set_id"), col("h"))
    val inBoth = kmins.filter(col("set_id") === "a").select(col("h").as("ha"))
      .join(kmins.filter(col("set_id") === "b").select(col("h").as("hb")),
        col("ha") === col("hb"))
      .select(col("ha").as("h"))
    val shared = unionK.join(inBoth, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_shared"))
    val exact = d
      .groupBy("set_id")
      .agg(count(lit(1)).as("n_exact"))
      .unionByName(d
        .select("ck").distinct()
        .agg(count(lit(1)).as("n_exact"))
        .select(lit("union").as("set_id"), col("n_exact")))
    kmins.unionByName(unionK)
      .groupBy("set_id")
      .agg(count(lit(1)).as("n_vals"), max(col("h")).as("kth_val"))
      .join(exact, Seq("set_id"))
      .crossJoin(broadcast(shared))
      .select(col("set_id"), col("n_vals"), col("kth_val"), col("n_exact"),
        when(col("set_id") === "union", col("n_shared")).otherwise(0L)
          .as("n_shared"))
      .orderBy("set_id")
  }

  /** Driver-side KMV estimate from the gate columns: (k−1)·2^52 / kth
    * when the sketch is full, else the exact count it holds. */
  def kmvEstimate(nVals: Long, kthVal: Long): Double =
    kmvEstimate(nVals, kthVal, KmvK)

  /** [[kmvEstimate]] for a sketch built at a non-default k. */
  def kmvEstimate(nVals: Long, kthVal: Long, k: Int): Double =
    if (nVals < k) nVals.toDouble
    else (nVals - 1).toDouble * (1L << 52).toDouble / kthVal.toDouble

  /** Count-Min sketch geometry (Cormode & Muthukrishnan 2005): d rows ×
    * 2^wBits buckets over the same 52-bit md5-derived hash as the HLL
    * family. Row i's bucket is the i-th wBits-bit slice of h52
    * (d·wBits ≤ 52), so one md5 per occurrence feeds every row — the
    * rows use disjoint, well-mixed digest bits in place of independent
    * hash functions, which keeps the construction exactly replicable in
    * the DuckDB oracle. d=4 × 2^11 gives ε = e/2048 ≈ 0.13% of stream
    * length at δ = e^-4. */
  val CmsD = 4
  val CmsWBits = 11
  val CmsW: Int = 1 << CmsWBits

  private[graft] def h52Of(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.Portable.{h32, h32b}
    h32(c) * lit(1L << 20) + pmod(h32b(c), lit(1L << 20))
  }

  /** (row, bucket) pairs of one token under the slice scheme. */
  private def cmsRowBuckets(h52: org.apache.spark.sql.Column, wBits: Int, d: Int) =
    array((0 until d).map { i =>
      struct(lit(i).as("row"),
        pmod(shiftrightunsigned(h52, wBits * i), lit(1L << wBits)).as("bucket"))
    }: _*)

  /** COUNT-MIN COUNTER TABLE of a token frame: one row per (row, bucket)
    * with its occurrence count — the relational form of the d×w counter
    * array, completing the sketch family (HLL distincts, MRL quantiles,
    * SpaceSaving heavy hitters, CMS point frequencies).
    *
    * Scale shape: the explode multiplies occurrences × d BEFORE the
    * combiner, but the partial aggregate collapses every map task to at
    * most d·2^wBits rows (32 KB of longs at the default geometry)
    * regardless of input size — the exchange carries the sketch, not the
    * stream. Counters are additive, so shard sketches merge by summing
    * aligned cells (spec-pinned), the property that lets a 100 TB scan
    * build per-partition sketches and fold them. */
  private[graft] def cmsCounters(
      toks: DataFrame, tok: String,
      wBits: Int = CmsWBits, d: Int = CmsD): DataFrame =
    toks
      // hoist h52 behind a projection boundary: the Generate below
      // references it d×2 times, and inlined it would cost that many
      // md5 evaluations per occurrence
      .select(h52Of(col(tok)).as("h52"))
      .select(explode(cmsRowBuckets(col("h52"), wBits, d)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for a probe-term frame: each probe looks
    * up its d cells and takes the min — the CMS estimate, which never
    * undercounts and overcounts only by colliding mass. The counter
    * table (≤ d·2^wBits rows) broadcasts; probe terms never shuffle.
    * The lookup LEFT-joins the counter table with absent cells coalesced
    * to 0: a sparse counter table omits zero-count cells, and an inner
    * join would take the min over only the non-empty cells — silently
    * over-estimating (or dropping) a probe the stream never saw, where a
    * true CMS (and the JVM [[graft.functions.sketch.CountMin]].estimate)
    * returns 0. Spec-pinned by the unseen-probe case in CountMinSpec. */
  private[graft] def cmsEstimates(
      counters: DataFrame, probes: DataFrame, tok: String,
      wBits: Int = CmsWBits, d: Int = CmsD): DataFrame =
    probes
      .withColumn("h52", h52Of(col(tok)))
      .withColumn("rb", explode(cmsRowBuckets(col("h52"), wBits, d)))
      .withColumn("row", col("rb.row"))
      .withColumn("bucket", col("rb.bucket"))
      .join(broadcast(counters), Seq("row", "bucket"), "left")
      .drop("h52", "rb", "row", "bucket")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))

  /** `approx_count_min` gate: CMS point-frequency estimates for the
    * exact top-20 terms, exact counts alongside for fidelity. At gate
    * vocabulary (~31 tokens) collisions are rare but NOT impossible —
    * both engines compute identical buckets, so any collision inflates
    * both sides identically; the genuinely-approximate regime (forced
    * collisions, error bounds, additivity) is pinned in CountMinSpec. */
  def approxCountMin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Portable.tokens
    val toks = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc).limit(20)
    cmsEstimates(cmsCounters(toks, "tok"), top, "tok")
      .select("tok", "n_exact", "n_est")
      .orderBy("tok")
  }

  /** Flajolet HLL estimate from the gate's integer register summary:
    * α_m·m²/Z with the small-range linear-counting correction. Driver-
    * side arithmetic for specs/consumers — see [[approxNdv]] for why the
    * gate doesn't emit it. */
  def hllEstimate(nBucketsHit: Long, zScaledHit: Double): Double = {
    val m = HllM.toDouble
    val zeros = HllM - nBucketsHit
    // registers never hit have M_j = 0 and contribute 2^0 = 1 each to
    // Σ 2^-M_j; hit ones arrive scaled by 2^maxRank
    val z = zScaledHit / math.pow(2.0, HllMaxRank.toDouble) + zeros.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / z
    if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble) else e
  }
}
