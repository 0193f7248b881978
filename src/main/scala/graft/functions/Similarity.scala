package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding similarity search (builder mandate; SURVEY §7.4): brute-force
  * cosine top-k as the exactness baseline, and a sign-bucketed LSH variant
  * as the scale path.
  *
  * The dot product is a `zip_with` + `aggregate` left fold over doubles —
  * codegen'd Catalyst higher-order functions, and the identical fold order
  * DuckDB's `list_reduce` uses, so similarities match bit-for-bit and the
  * rank order (round 6, then vec_id tiebreak) is deterministic across
  * engines.
  *
  * Scale design (100 TB): the query set is broadcast (`broadcast(queries)`)
  * so the candidate side streams scan-speed with no shuffle; top-k is a
  * per-query window over the joined block. The LSH variant cuts the
  * candidate block by bucket equality — at a billion vectors the
  * brute-force path is a deliberate non-starter and buckets (or an IVF
  * coarse quantizer) bound the join fan-out.
  */
object Similarity {

  val TopK = 5
  val NQueryVectors = 8

  /** Sign-LSH bucket-space sizing (the round-3 scale fix): the number of
    * hyperplanes GROWS with the corpus so expected bucket occupancy
    * n / 2^dims stays ≤ [[BucketOccupancyTarget]]. A fixed 8-bit space
    * made the [[dedupEmbedding]] self-join quadratic — expected pairs
    * per bucket grow as (n/256)². With bounded occupancy the candidate
    * pair count is ≤ n·target — linear at any corpus size. */
  val BucketOccupancyTarget = 4L
  val MinSignBucketDims = 8

  /** Smallest dims ≥ [[MinSignBucketDims]] with 2^dims · target ≥ n —
    * pure integer arithmetic, so DuckDB derives the identical value from
    * the same count (no float log2 whose ulp could straddle an integer).
    * Upper bound 40 covers 4·2^40 ≈ 4.4e12 vectors without overflow;
    * beyond it this THROWS rather than silently diverge from the
    * oracle's dims CTE (which would yield NULL there). */
  def signBucketDimsFor(n: Long): Int =
    (MinSignBucketDims to 40).find(d => (1L << d) * BucketOccupancyTarget >= n)
      .getOrElse(throw new IllegalArgumentException(
        s"corpus size $n exceeds the 2^40-bucket sign-LSH range"))

  /** Left-fold dot product of two float arrays in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  private def ranked(joined: DataFrame): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    joined
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("qid", "cid", "rank", "sim")
      .orderBy("qid", "rank")
  }

  /** Cosine via the native codegen expression — bit-identical to the
    * dot/norm higher-order-function fold (same accumulation order), one
    * fused loop per pair (see CosineSimilarity). */
  private def sim(q: Column, c: Column): Column =
    round(expressions.CosineSimilarity(q, c), 6)

  /** Brute-force cosine top-k: every query against every other vector. */
  def annBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val queries = emb
      .filter(col("vec_id") < NQueryVectors)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val cands = emb
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val joined = cands
      .join(broadcast(queries), col("qid") =!= col("cid"))
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(joined)
  }

  /** Sign bucket over the first `dims` dimensions:
    * Σ 2^i · [v[i] > 0] — a degenerate-but-deterministic random-hyperplane
    * LSH (axis-aligned planes); `dims` comes from [[signBucketDimsFor]]
    * on the corpus size, so occupancy stays bounded as the corpus grows. */
  def signBucket(v: Column, dims: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(dims - 1)), i =>
        when(element_at(v, i + 1) > 0.0f,
          pow(lit(2.0), i.cast("double")).cast("long")).otherwise(0L)),
      lit(0L),
      (acc, x) => acc + x)

  /** [[signBucket]] at the minimum width — fixed-width helper for specs. */
  def signBucket(v: Column): Column = signBucket(v, MinSignBucketDims)

  /** Corpus-size-derived bucket width: one count() job at
    * query-construction time picks the hyperplane count. Catalyst
    * prunes every column out of the count (for the near-dup corpus the
    * embedding perturbation is pruned too), so the job reads parquet
    * metadata/id footprints, not vectors — but it IS a job per
    * construction; a production index reads the catalog's table stats
    * instead and gets the identical value without a scan. */
  private def dimsOf(corpus: DataFrame): Int = signBucketDimsFor(corpus.count())

  /** LSH-bucketed cosine top-k: candidates restricted to the query's
    * bucket — the scale path (approximate; recall measured in the spec
    * against [[annBrute]]). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val emb = base.select(
      col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dimsOf(base)).as("bucket"))
    val queries = emb.filter(col("vec_id") < NQueryVectors)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket").as("qbucket"))
    val cands = emb
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("bucket"))
    val joined = cands
      .join(broadcast(queries),
        col("qbucket") === col("bucket") && col("qid") =!= col("cid"))
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(joined)
  }

  /** Cosine threshold for embedding near-duplicate detection: the corpus
    * vectors are unit-normalized, the planted perturbation (+0.1 on dim 0)
    * keeps cosine ≥ 0.995, and random 64-dim pairs stay below ~0.5 — so
    * 0.99 separates exactly. */
  val EmbDupThreshold = 0.99

  /** Planted-copy id offset for [[corpusWithNearDupVectors]] —
    * collision-proof against real ids at any realistic corpus size. */
  val PlantOffset = 3000000000000000L

  /** embeddings ∪ perturbed copies of every 9th vector (id
    * +[[PlantOffset]], dim 0 shifted by +0.1 in double then narrowed to
    * float — an IEEE sequence DuckDB reproduces bit-for-bit). The
    * synthetic table has no natural near-dups, so the corpus plants
    * deterministic ones, exactly like the text near-dup corpus. */
  def corpusWithNearDupVectors(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    e.unionByName(
      e.filter(col("vec_id") % 9 === 0)
        .select(
          (col("vec_id") + PlantOffset).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === 0, (x.cast("double") + lit(0.1)).cast("float")).otherwise(x))
            .as("embedding")))
  }

  /** Embedding-cosine near-dup pairs (the vector-space member of the
    * dedup family): LSH sign-bucket candidate join — never all-pairs —
    * then exact cosine ≥ [[EmbDupThreshold]] verification. Same
    * candidate-generation/verification shape as MinHash-LSH text dedup;
    * at 100 TB the bucket join bounds the fan-out exactly like the band
    * join does. (A perturbed copy whose dim-0 sign flips lands in a
    * different bucket and is missed — standard LSH recall behavior, seen
    * identically by the oracle.) */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDupVectors(s, dir)
    val emb = corpus.select(
      col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dimsOf(corpus)).as("bucket"))
    emb.as("a")
      .join(emb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", sim(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= EmbDupThreshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * duplicates are found within LEARNED k-means clusters instead of
    * [[dedupEmbedding]]'s sign-hash buckets — the candidate space aligns
    * with the embedding geometry, which is what lets the paper prune
    * semantically-redundant (not just near-identical) documents.
    *
    * Shape: trained coarse codebook ([[ivfCodebookTrained]] — bounded
    * deterministic sample, sequential Lloyd), every vector assigned to
    * its TOP-2 cells (the nprobe=2 boundary repair from [[annIvfProbe2]],
    * here applied to BOTH sides: a pair straddling one cell boundary
    * still meets in the other's cell), candidate pairs only within a
    * shared cell, exact cosine ≥ [[EmbDupThreshold]] verification, and
    * keep-lowest-vec_id as the deterministic stand-in for the paper's
    * keep-one-per-ε-ball rule.
    *
    * Scale design (100 TB): within-cluster pairwise work is Σ occ² — the
    * production form picks k ∝ n/occ (SemDeDup used 50k clusters for
    * LAION) so candidate pairs stay ≤ 2·occ·n (linear), training on the
    * same bounded sample via minibatch k-means; assignment stays one
    * O(k·dim) broadcast + map-side argmax regardless of k. This gate
    * keeps the corpus-independent [[IvfCodebookK]] codebook so the
    * locality contract is the one `ann_ivf_recall` already proves.
    * K-means is deliberately not mirrored in SQL, so the gate is the
    * planted-pair assertion form: every planted cosine-0.995 copy must
    * be dropped (the oracle asserts 1 per copy); `SemanticDedupSpec`
    * pins soundness (every drop has a genuine ≥-threshold lower-id
    * partner) and exactness vs the brute-force drop set. */
  def dedupSemanticDrops(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDupVectors(s, dir)
    // localCheckpoint: the cells frame feeds BOTH sides of the pair
    // self-join — without it the corpus scan + top-2 codebook assignment
    // runs twice (the q55 multi-consumer lineage rule).
    val cells =
      assignCellsTop2(corpus, ivfCodebookTrained(s, corpus)).localCheckpoint()
    cells.as("a")
      .join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id"))
      .withColumn("sim", sim(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= EmbDupThreshold)
      .select(col("a.vec_id").as("dup_id"))
      .distinct()
  }

  /** Planted-pair assertion gate over [[dedupSemanticDrops]]: one row per
    * planted copy, `dropped` = 1 iff semantic dedup dropped it (its
    * source has the lower id and cosine ≥ 0.995, so a correct
    * cluster-bounded dedup must). */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val planted = corpusWithNearDupVectors(s, dir)
      .filter(col("vec_id") >= PlantOffset)
      .select(col("vec_id"))
    planted
      .join(dedupSemanticDrops(s, dir), col("vec_id") === col("dup_id"), "left")
      .select((col("vec_id") - PlantOffset).as("src_id"),
        col("dup_id").isNotNull.cast("long").as("dropped"))
      .orderBy("src_id")
  }

  /** Top-2 cell assignment ([[assignCells]]'s argmax widened to the two
    * nearest centroids): same broadcast join, the per-vector top-2 picked
    * by sorting the k candidate rows map-side (collect_list collapses
    * before any exchange — one 2-row-per-vector output, the raw k-fan
    * never shuffles). Ties break to the lowest cent_id, as everywhere. */
  private[graft] def assignCellsTop2(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.join(broadcast(cents))
      .withColumn("csim", sim(col("embedding"), col("cv")))
      .groupBy("vec_id")
      .agg(
        first(col("embedding")).as("embedding"),
        slice(
          sort_array(collect_list(struct(
            (-col("csim")).as("nsim"), col("cent_id").as("cent_id")))),
          1, 2).as("top2"))
      .select(col("vec_id"), col("embedding"),
        explode(col("top2.cent_id")).as("cell"))

  /** Selection count for [[sampleKcenter]]. */
  val KcenterK = 8

  /** GREEDY K-CENTER diversity selection (Gonzalez 1985, the 2-approx
    * farthest-point heuristic; the coreset-style "pick maximally
    * diverse exemplars" selection data-curation pipelines use to seed
    * labeling sets and balance mixtures): start from the lowest
    * vec_id, then k−1 times pick the vector FARTHEST (max over
    * candidates of the min cosine distance to the selected set). Every
    * pairwise distance goes through the rounded-to-6 cosine, so the
    * argmax compares values on a 1e-6 grid with a vec_id tiebreak —
    * fully deterministic, and the DuckDB oracle replays the ENTIRE
    * greedy iteration as a k-step CTE chain (this gate is the one
    * place the oracle mirrors an iterative algorithm end to end).
    *
    * Scale shape: k passes, each one broadcast of ≤ k vectors + a
    * scan-speed min-of-k distance projection + TakeOrdered(1) — no
    * shuffle at all; at corpus scale the per-pass scan is the cost and
    * production k-center accelerates it with the ANN index family
    * above (probe only vectors near the current selection's cells). */
  def sampleKcenter(s: SparkSession, dir: String, k: Int = KcenterK): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val first = emb.orderBy("vec_id").limit(1).collect().head
    // distance to the empty selection is capped at the cosine-distance
    // maximum 2.0 — the documented rank-1 sentinel (both engines emit it)
    var sel = Vector((first.getLong(0), first.getSeq[Float](1), 2.0))
    while (sel.size < k) {
      val minD = sel
        .map { case (_, v, _) =>
          lit(1.0) - round(expressions.CosineSimilarity(
            col("embedding"), typedlit(v)), 6)
        }
        .reduce(least(_, _))
      val selIds = sel.map(_._1)
      val next = emb.filter(!col("vec_id").isin(selIds: _*))
        .select(col("vec_id"), col("embedding"), minD.as("d"))
        .orderBy(col("d").desc, col("vec_id").asc)
        .limit(1).collect().head
      sel = sel :+ ((next.getLong(0), next.getSeq[Float](1), next.getDouble(2)))
    }
    import s.implicits._
    sel.zipWithIndex
      .map { case ((id, _, d), i) => (i + 1L, id, d) }
      .toDF("rank", "vec_id", "sel_dist")
  }

  /** Safety margin for the [[kcenterGreedyCellPruned]] prune bound: the
    * gate distance is `1 − round(cos, 6)` (≤ 5e-7 off the true value)
    * and the driver-side centroid angles are recomputed in a different
    * fold order than the executor expression (~1e-15 relative); 2e-6
    * dominates both, so a pruned cell provably contains no vector whose
    * rounded distance to the new center beats its current minimum. */
  private val KcenterPruneMargin = 2e-6

  /** IVF-ACCELERATED greedy k-center — the production form of
    * [[sampleKcenter]], bit-identical output (the `sample_kcenter_ivf`
    * gate replays the SAME k-step CTE oracle), with two structural wins
    * over the textbook loop:
    *
    *  1. INCREMENTAL min-distance (the classic Gonzalez optimization):
    *     a per-vector running `d` column folds `least(d, dist-to-newest)`
    *     each pass, so every pass computes ONE cosine per probed vector
    *     instead of |selected| — O(n·k·dim) total instead of O(n·k²·dim).
    *     `min` over identical rounded operands is order-insensitive, so
    *     the accumulated `d` equals the exact recompute double-for-double.
    *  2. CELL PRUNING (triangle inequality on ANGLES — cosine distance
    *     itself violates it, angles on the sphere don't): vectors sit in
    *     trained IVF cells ([[ivfCodebookTrained]]) with a precomputed
    *     angular radius rθ(c) = max member↔centroid angle. Adding center
    *     z can only shrink some member's `d` if
    *     `1 − cos(θ(μc, z) − rθ(c)) − margin < max_d(c)`; cells failing
    *     that test are skipped outright — no cosine is evaluated for any
    *     of their members that pass (cells "near the current selection"
    *     are exactly the ones that keep probing). The per-cell `max_d`
    *     ledger also bounds the argmax: only cells holding the exact
    *     global maximum are scanned for the next pick.
    *
    * Pruning power is geometry-dependent: on a CLUSTERED corpus (real
    * embedding spaces; the spec's synthetic clusters) later passes probe
    * a small fraction of n, while on an isotropic corpus (this repo's
    * uniform test vectors — cell radii ≈ typical pairwise angle, see
    * [[annIvfRecall]]'s scaladoc for the same phenomenon) the bound
    * rarely fires and the loop degrades gracefully to the incremental
    * exact scan. Either way the output is EXACT — pruning is a sufficient
    * condition for "no change", never an approximation.
    *
    * Driver traffic stays bounded: the codebook collect (≤ 2048-row
    * train sample, k·dim centroids), one 32-row cell-stats aggregate,
    * and per pass one ≤|cells|-row `max_d` refresh + the 1-row argmax —
    * the [[sampleKcenter]] discipline. Per-pass `localCheckpoint` cuts
    * the k-deep `when(...)` lineage (the CC fixpoint rule). */
  private[graft] def kcenterGreedyCellPruned(
      s: SparkSession, emb0: DataFrame, k: Int): (DataFrame, Seq[Long]) = {
    val emb = emb0.select(col("vec_id"), col("embedding"))
    val cents = ivfCodebookTrained(s, emb)
    val centVecs: Map[Long, Array[Double]] = cents.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).iterator.map(_.toDouble).toArray).toMap
    val assigned = assignCells(emb, cents).localCheckpoint()
    // Per-cell angular radius + population: ONE aggregate over the
    // UNROUNDED cosine (the bound lives on true angles; the margin
    // absorbs float noise). clamp before acos — norm-one products can
    // graze ±1 by an ulp.
    val cellStats = assigned
      .join(broadcast(cents), col("cell") === col("cent_id"))
      .withColumn("ctheta", acos(greatest(lit(-1.0),
        least(lit(1.0), expressions.CosineSimilarity(col("embedding"), col("cv"))))))
      .groupBy("cell")
      .agg(max(col("ctheta")).as("rtheta"), count(lit(1)).as("sz"))
      .collect()
    val rTheta: Map[Long, Double] =
      cellStats.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cellSize: Map[Long, Long] =
      cellStats.map(r => r.getLong(0) -> r.getLong(2)).toMap
    def driverAngle(a: Array[Double], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val bi = b(i).toDouble
        dot += a(i) * bi; na += a(i) * a(i); nb += bi * bi; i += 1
      }
      math.acos(math.max(-1.0, math.min(1.0, dot / math.sqrt(na * nb))))
    }

    val firstRow = emb.orderBy("vec_id").limit(1).collect().head
    var selIds = Vector(firstRow.getLong(0))
    var sel = Vector((1L, firstRow.getLong(0), 2.0))
    var zVec: Seq[Float] = firstRow.getSeq[Float](1)
    // d starts at the 2.0 cosine-distance ceiling (the rank-1 sentinel
    // both engines emit), so pass 1's least() fold lands exactly on
    // dist-to-first — same as the exact loop's first iteration.
    var frame = assigned.withColumn("d", lit(2.0)).localCheckpoint()
    var maxD: Map[Long, Double] = cellSize.keys.map(_ -> 2.0).toMap
    val probed = Seq.newBuilder[Long]
    while (sel.size < k) {
      // Load-bearing init invariant: with maxD = 2.0 sentinel the update
      // test (1 − cos(lb) − margin < maxD) is ALWAYS true (LHS ≤ 2 − ε),
      // so pass 1 probes every cell — d transitions off the sentinel and
      // every maxD entry is exact before pruning can ever fire.
      val updateCells = cellSize.keys.filter { c =>
        val lb = driverAngle(centVecs(c), zVec) - rTheta(c)
        lb <= 0 || (1.0 - math.cos(lb)) - KcenterPruneMargin < maxD(c)
      }.toSeq.sorted
      probed += updateCells.iterator.map(cellSize).sum
      val inUpdate = col("cell").isin(updateCells.map(Long.box): _*)
      val newD = lit(1.0) -
        round(expressions.CosineSimilarity(col("embedding"), typedlit(zVec)), 6)
      frame = frame
        .withColumn("d", when(inUpdate, least(col("d"), newD)).otherwise(col("d")))
        .localCheckpoint()
      maxD = maxD ++ frame.filter(inUpdate)
        .groupBy("cell").agg(max(col("d")).as("md")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1))
      val gm = maxD.values.max
      val candCells = maxD.collect { case (c, m) if m == gm => Long.box(c) }.toSeq
      val next = frame
        .filter(col("cell").isin(candCells: _*) &&
          !col("vec_id").isin(selIds.map(Long.box): _*))
        .orderBy(col("d").desc, col("vec_id").asc)
        .limit(1).collect().head
      selIds = selIds :+ next.getLong(0)
      sel = sel :+ ((sel.size + 1L, next.getLong(0),
        next.getDouble(next.fieldIndex("d"))))
      zVec = next.getSeq[Float](next.fieldIndex("embedding"))
    }
    import s.implicits._
    (sel.toDF("rank", "vec_id", "sel_dist"), probed.result())
  }

  /** Gate wrapper over [[kcenterGreedyCellPruned]] on the embeddings
    * table — same schema and (provably) same rows as [[sampleKcenter]];
    * the oracle is the identical k-step MATERIALIZED CTE replay. */
  def sampleKcenterIvf(s: SparkSession, dir: String, k: Int = KcenterK): DataFrame =
    kcenterGreedyCellPruned(
      s, Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")), k)._1

  /** Fixed-point scale for [[embedCentroids]]: float components scaled
    * to integer millionths before summing. */
  val CentroidScale = 1000000L

  /** Per-label embedding CENTROIDS (class prototypes — the aggregate
    * behind IVF-style codebook seeding, nearest-class-mean classifiers,
    * and per-source embedding drift monitoring). Output is one row per
    * (label, dim) so the gate compares scalars, with the mean at 6
    * decimals.
    *
    * Float sums are order-sensitive in the last ulp, and Spark's
    * partial-aggregation order is nondeterministic — a naive
    * sum-of-doubles centroid can flip its own hash run to run, let
    * alone cross-engine. Components are therefore scaled to integer
    * millionths per row (deterministic double→long rounding in both
    * engines) and summed EXACTLY as BIGINTs; one final division
    * produces the mean. Scale shape: posexplode emits n·dim rows, but
    * the (label, dim) partial aggregate collapses each map task to at
    * most labels·dim rows before the exchange — the raw vectors never
    * shuffle. */
  def embedCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * CentroidScale).cast("long").as("sv"))
      .groupBy("label", "dim")
      .agg(count(lit(1)).as("n_vectors"), sum(col("sv")).as("ssum"))
      .select(col("label"), col("dim"), col("n_vectors"),
        round(col("ssum").cast("double")
          / (col("n_vectors") * lit(CentroidScale.toDouble)), 6).as("c"))
      .orderBy("label", "dim")

  /** Neighbors per vector in the kNN graph. */
  val KnnK = 3

  /** ALL-PAIRS kNN graph: for EVERY corpus vector, its top-k cosine
    * neighbors among the vectors sharing its sign-LSH bucket — the
    * whole-corpus join that powers near-dup clustering and
    * embedding-based curation, as opposed to the per-query ANN search
    * above (8 broadcast queries). Brute force here is O(n²) BY
    * DEFINITION — there is no small side to broadcast — so the bucket
    * bound is not an optimization but the thing that makes the operator
    * exist at scale: occupancy ≤ [[BucketOccupancyTarget]] keeps
    * candidate pairs ≤ n·target (linear), and the per-vector top-k is a
    * window over each vector's own bucket block. Approximate (bucket
    * recall measured for the shared machinery in `ExtensionsSpec`),
    * deterministic: sims rounded to 6, ties break on nbr_id. */
  def knnJoin(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val emb = base.select(
      col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dimsOf(base)).as("bucket"))
    // top-k INSIDE the bucket block: each vector's full candidate set
    // lives in its own bucket, so ranking over (bucket, vec_id) equals
    // ranking over vec_id (bucket is functionally determined by the
    // vector) — and a window clustered on (bucket, vec_id) is satisfied
    // by the join's own hashpartitioning(bucket), so in the sort-merge
    // regime (large corpus, no broadcast) the candidate pairs are
    // ranked WITHOUT a second exchange (spec-pinned in ExtensionsSpec;
    // the round-5 window on vec_id alone re-shuffled all pairs). */
    val w = Window.partitionBy("bucket", "vec_id")
      .orderBy(col("sim").desc, col("nbr_id").asc)
    emb.as("a")
      .join(emb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .withColumn("sim", sim(col("a.embedding"), col("b.embedding")))
      .select(col("a.bucket").as("bucket"),
        col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"), col("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= KnnK)
      .select("vec_id", "nbr_id", "rank", "sim")
      .orderBy("vec_id", "rank")
  }

  /** Recall@k of the bucketed LSH search against the brute-force ground
    * truth, per query — the measurement every approximate index ships
    * with. n_found ∈ 0..k; recall = n_found/k (both engines compute the
    * identical double division of exact ints). */
  def annRecallAtK(s: SparkSession, dir: String): DataFrame = {
    val brute = annBrute(s, dir).select(col("qid"), col("cid"))
    val lsh = annLsh(s, dir).select(col("qid").as("lq"), col("cid").as("lc"))
    brute
      .join(lsh, col("qid") === col("lq") && col("cid") === col("lc"), "left")
      .groupBy("qid")
      .agg(count(col("lc")).as("n_found"))
      .withColumn("recall", col("n_found").cast("double") / lit(TopK))
      .orderBy("qid")
  }

  /** FIXED IVF codebook size — corpus-INDEPENDENT (the round-3 scale
    * fix): the codebook broadcast is O(k·dim) and assignment is O(n·k)
    * at any corpus size. The previous stride-derived codebook
    * (`vec_id % 53`) grew linearly with the corpus, making assignment
    * O(n²/53) — a scale-killer at 100×. */
  val IvfCodebookK = 32

  /** Deterministic fixed-k coarse codebook: the k corpus vectors with
    * the smallest (h32(vec_id), vec_id) — a uniform pseudo-random but
    * engine-reproducible pick (k-means is not cross-engine-
    * reproducible; this keeps the operator oracle-checkable while the
    * assign/probe/rank skeleton is exactly FAISS-style IVF). The
    * orderBy+limit plans as TakeOrderedAndProject: a per-partition
    * top-k then a driver merge of k·partitions ids — no global sort. */
  private[graft] def ivfCodebook(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"),
        Portable.h32(col("vec_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("cent_id"))
      .limit(IvfCodebookK)
      .select("cent_id", "cv")

  /** Assign every vector to its nearest centroid by cosine (ties to the
    * lowest cent_id): one unconditioned broadcast join against the
    * k-row codebook (O(n·k) similarity evaluations — by design, see
    * PlanGuardSpec) followed by a map-side-combining argmax groupBy.
    * The groupBy shuffles ONE row per vector (each vector's k candidate
    * rows are co-partitioned with it out of the broadcast join, so the
    * partial aggregate collapses them before the exchange) — unlike a
    * window-rank formulation, which would shuffle all n·k rows. */
  private def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.join(broadcast(cents))
      .withColumn("csim", sim(col("embedding"), col("cv")))
      .groupBy("vec_id")
      .agg(
        first(col("embedding")).as("embedding"),
        max_by(col("cent_id"), struct(col("csim"), -col("cent_id"))).as("cell"))

  /** The query set's `nprobe` nearest centroid cells (rank 1 = its own
    * assignment cell, identical tiebreak as [[assignCells]]). Queries
    * are a tiny fixed set, so the window rank here is over
    * |queries|·k rows — negligible at any corpus size. */
  private def probeCells(emb: DataFrame, cents: DataFrame, nprobe: Int,
      queryPred: Column = col("vec_id") < NQueryVectors): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("csim").desc, col("cent_id").asc)
    emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .join(broadcast(cents))
      .withColumn("csim", sim(col("qv"), col("cv")))
      .withColumn("arn", row_number().over(w))
      .filter(col("arn") <= nprobe)
      .select(col("qid"), col("qv"), col("cent_id").as("probe_cell"))
  }

  private def ivfSearch(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    ivfSearchWith(emb, ivfCodebook(emb), nprobe)
  }

  private def ivfSearchWith(emb: DataFrame, cents: DataFrame, nprobe: Int,
      queryPred: Column = col("vec_id") < NQueryVectors): DataFrame = {
    val assigned = assignCells(emb, cents)
    val probes = probeCells(emb, cents, nprobe, queryPred)
    val joined = assigned
      .join(broadcast(probes), col("probe_cell") === col("cell") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"), col("qv"), col("embedding").as("cv"))
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(joined)
  }

  /** IVF-style ANN (the mandate's alternative to LSH bucketing): a
    * fixed-k coarse codebook partitions the corpus into cells; queries
    * probe only their own cell (nprobe=1). At a billion vectors the
    * assignment is one O(k·dim) broadcast pass and search fan-out is
    * bounded by cell population — the same shape FAISS-style IVF gives. */
  def annIvf(s: SparkSession, dir: String): DataFrame = ivfSearch(s, dir, 1)

  /** Train the IVF coarse codebook on `dir` and persist it (the
    * train-once half of the deploy contract — see [[annIvfFromArtifact]]). */
  def saveIvfArtifact(s: SparkSession, dir: String, path: String): Unit = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    graft.artifacts.Artifacts.saveIvfCodebook(
      ivfCodebook(emb).select(col("cent_id"), col("cv")), path)
  }

  /** [[annIvf]] running from a LOADED codebook artifact — the
    * deploy-time path a production job uses instead of retraining per
    * session. Bit-equal to [[annIvf]] when the artifact was trained on
    * `dir` (ArtifactsSpec pins it); the loaded k-row frame broadcasts
    * exactly like the trained one. */
  def annIvfFromArtifact(s: SparkSession, dir: String, path: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    ivfSearchWith(emb, graft.artifacts.Artifacts.loadIvfCodebook(s, path), nprobe = 1)
  }

  /** GATE `ann_ivf_deploy` — the train-once/deploy-many contract END TO
    * END inside one hash-checked query: train the codebook, persist it
    * through the artifact store, load it back, and search from the
    * LOADED copy. Must hash-equal plain [[annIvf]] (the oracle IS
    * ann_ivf's SQL), so a store round-trip can never silently perturb
    * the ranking. The store path is a per-JVM temp dir — at scale it's
    * any shared filesystem URI; the measured cost IS the deploy
    * round-trip plus the search. */
  def annIvfDeploy(s: SparkSession, dir: String): DataFrame =
    graft.util.TempArtifacts.withTempDir("graft-ivf-deploy-") { path =>
      saveIvfArtifact(s, dir, path)
      // localCheckpoint materializes the k-row codebook off the artifact
      // files so the temp dir can be deleted eagerly — repeated gate and
      // bench invocations must not accumulate artifact dirs (ADVICE r17)
      val cb = graft.artifacts.Artifacts.loadIvfCodebook(s, path).localCheckpoint()
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      ivfSearchWith(emb, cb, nprobe = 1)
    }

  /** IVF with nprobe=2: each query searches its own cell AND its
    * second-nearest centroid's cell — the standard IVF recall repair
    * (a query near a cell boundary finds neighbors assigned to the
    * adjacent cell). Candidates stay bounded to two cell populations. */
  def annIvfProbe2(s: SparkSession, dir: String): DataFrame = ivfSearch(s, dir, 2)

  /** IVF-PQ — the production composition (FAISS IVF-PQ) shipped as one
    * operator: the coarse codebook bounds each query's candidate set to
    * its nprobe=2 probed cells, PQ ADC scores those candidates reading
    * M code ints per candidate (the float column is never read at score
    * time), and the constant [[PqRefine]] re-rank is exact. At a
    * billion vectors this is what makes ANN both bounded (candidates
    * ≈ nprobe·n/K per query) and cheap per candidate (M bytes instead
    * of dim floats). Hash-picked codebooks for BOTH stages keep the
    * full composition exact-oracle-checkable; the trained-codebook
    * variants of each stage are gated separately (ann_pq_recall,
    * ann_ivf_recall). */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cents = ivfCodebook(emb)
    val centLit = typedLit(pqCodebook(emb))
    val coded = assignCells(emb, cents).select(
      col("vec_id").as("cid"), col("embedding").as("cv"), col("cell"),
      expressions.PqCodes(col("embedding"), centLit, PqM).as("codes"))
    val probes = probeCells(emb, cents, nprobe = 2)
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("cid").asc)
    val refined = coded
      .join(broadcast(probes),
        col("probe_cell") === col("cell") && col("qid") =!= col("cid"))
      .withColumn("adc", expressions.PqAdcScore(col("qv"), col("codes"), centLit, PqM))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= PqRefine)
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(refined.select("qid", "cid", "qv", "cv", "sim"))
  }

  /** Product-quantization parameters: M sub-spaces × K centroids per
    * sub-space. 64-dim embeddings → 8-dim slices; 8 one-byte-ish codes
    * replace 256 bytes of floats (32× compression). Fixed and
    * corpus-independent, like [[IvfCodebookK]]. */
  val PqM = 8
  val PqK = 32
  /** ADC is approximate — re-rank this many ADC candidates per query
    * with exact cosine before emitting top-[[TopK]]. Sized generously
    * because the hash-picked codebook is untrained (a k-means codebook
    * would need fewer); still a constant, so the refine cost per query
    * is bounded at any corpus size. */
  val PqRefine = 40

  /** Deterministic PQ codebook, collected driver-side: the K corpus
    * vectors with the smallest (h32(vec_id), vec_id) — K·dim floats
    * (tiny, like [[ivfCodebook]]'s pick but materialized as a literal so
    * encoding/scoring are zero-shuffle per-row expressions). A real
    * deployment would train per-sub-space k-means; the hash pick keeps
    * the operator oracle-reproducible while the encode/score/refine
    * skeleton is exactly FAISS-style PQ. */
  private[graft] def pqCodebook(emb: DataFrame): Seq[Seq[Float]] =
    emb
      .select(col("embedding"), Portable.h32(col("vec_id").cast("string")).as("hk"),
        col("vec_id"))
      .orderBy(col("hk"), col("vec_id"))
      .limit(PqK)
      .select("embedding")
      .collect()
      .toSeq.map(_.getSeq[Float](0).toSeq)

  /** PQ-compressed ANN (the 100 TB scoring path): encode the corpus to
    * M codebook indices per vector, score candidates with the
    * asymmetric-distance approximation (query full-precision, candidate
    * codes only), keep the top-[[PqRefine]] per query, then re-rank that
    * bounded set with exact cosine. At a billion vectors the scan reads
    * M ints per candidate instead of the embedding column — compressed
    * storage and table-lookup scoring are what make the exhaustive scan
    * affordable; composing it under IVF cells ([[annIvf]]) bounds the
    * candidate set too. Recall vs [[annBrute]] is measured in
    * SimilaritySpec. */
  def annPq(s: SparkSession, dir: String): DataFrame =
    annPqWith(s, dir, pqCodebook(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))))

  /** Deploy-path twin of [[annPq]] (the ann_ivf_deploy contract,
    * completing the deploy family: IVF, SQ8, PQ, quality, LM head,
    * ANN top-k, drift references): the codebook round-trips through
    * the artifact store — float centroids this time, so the gate also
    * proves the store preserves float32 arrays bit-exactly — and the
    * encode/ADC/refine search runs from the LOADED copy. Same oracle
    * as ann_pq; loadPqCodebook collects the K·M-row codebook eagerly,
    * so the temp dir is deleted before the search plan executes. */
  def annPqDeploy(s: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")))
    graft.util.TempArtifacts.withTempDir("graft-pq-deploy-") { path =>
      graft.artifacts.Artifacts.savePqCodebook(s, cb, path)
      annPqWith(s, dir, graft.artifacts.Artifacts.loadPqCodebook(s, path))
    }
  }

  /** Trained-path codebook size: 256 centroids per sub-space — one-byte
    * codes, the standard production PQ geometry (FAISS default). The
    * hash-picked path keeps K=32 because its oracle SQL evaluates all
    * K·M sub-distances per row in DuckDB. */
  val PqKTrained = 256

  /** [[annPq]] with the TRAINED codebook — the recommended PQ path
    * (the hash-picked [[annPq]] stays as the exact-oracle gate for the
    * encode/ADC/refine machinery). Quality gated by [[annPqRecall]]. */
  def annPqTrained(s: SparkSession, dir: String): DataFrame =
    annPqWith(s, dir, pqCodebookTrained(
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))),
      PqRefineTrained)

  /** Refine depth for the trained path: deeper than the hash path's
    * [[PqRefine]] because the recall gate holds it to ≥ 0.8 per query —
    * still a constant, so per-query refine cost is bounded at any
    * corpus size (ADC pre-ranking is what keeps the exact re-rank off
    * the full corpus). */
  val PqRefineTrained = 128

  private def annPqWith(
      s: SparkSession, dir: String, codebook: Seq[Seq[Float]],
      refine: Int = PqRefine): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val centLit = typedLit(codebook)
    val coded = emb.select(
      col("vec_id").as("cid"), col("embedding").as("cv"),
      expressions.PqCodes(col("embedding"), centLit, PqM).as("codes"))
    val queries = emb.filter(col("vec_id") < NQueryVectors)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val wAdc = Window.partitionBy("qid").orderBy(col("adc").desc, col("cid").asc)
    val refined = coded
      .join(broadcast(queries), col("qid") =!= col("cid"))
      .withColumn("adc", expressions.PqAdcScore(col("qv"), col("codes"), centLit, PqM))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= refine)
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(refined.select("qid", "cid", "qv", "cv", "sim"))
  }

  // ---------------------------------------------------------------------
  // Scalar 8-bit quantization (SQ8) ANN — the OTHER production
  // compression path beside PQ (FAISS ScalarQuantizer QT_8bit): each
  // dimension is affinely mapped to a level in [0, Sq8Levels] using
  // per-dimension trained corpus bounds, candidates are pre-ranked by
  // the symmetric quantized dot product, and a constant-depth exact
  // re-rank emits the final top-k (the PQ refine discipline).
  //
  // Unlike PQ (whose ADC scores are float arithmetic, oracle-mirrored
  // in doubles), the whole SQ8 train/encode/score path is BIGINT — the
  // trained bounds, the codes, and the pre-rank scores are hash-exact
  // cross-engine, so the gate gets a FULL value oracle with no
  // recall-style adjudication anywhere.
  //
  // Scale shape (100 TB): training is ONE scan collapsing map-side into
  // a single 2·dim-sum min/max row (the PCA all-reduce shape); the
  // codebook is 2·dim longs of driver state re-broadcast as literals;
  // encoding is a per-row codegen projection (no shuffle); scoring
  // reads dim one-byte levels per candidate instead of dim floats
  // (4× the compression story of the float column, same exhaustive-
  // scan-affordability argument as annPq), and composes under IVF
  // cells exactly like PQ when the corpus outgrows the flat scan.
  // ---------------------------------------------------------------------

  /** Quantization levels: 8-bit, 0..255. */
  val Sq8Levels = 255L

  /** Exact re-rank depth ([[PqRefine]]'s discipline): a constant, so
    * the per-query exact-cosine cost is bounded at any corpus size. */
  val Sq8Refine = 40

  /** Trained per-dimension (min, width) over the quantized frame `e`
    * (array<bigint>, [[PcaEScale]] fixed-point): ONE scan collapsing
    * map-side into a single 2·dim-sum row. Width clamps to ≥ 1 so a
    * constant dimension encodes to level 0 instead of dividing by
    * zero — the clamp is mirrored verbatim in the oracle's greatest(). */
  private[graft] def sq8Bounds(e: DataFrame, dim: Int): (Array[Long], Array[Long]) = {
    val aggs = (1 to dim).map(j => min(element_at(col("e"), j)).as(s"mn$j")) ++
      (1 to dim).map(j => max(element_at(col("e"), j)).as(s"mx$j"))
    val row = e.agg(aggs.head, aggs.tail: _*).head()
    val mn = Array.tabulate(dim)(j => row.getLong(j))
    val w = Array.tabulate(dim)(j => math.max(row.getLong(dim + j) - mn(j), 1L))
    (mn, w)
  }

  /** Per-row SQ8 encode against the broadcast literal bounds:
    * level_j = (e_j − mn_j)·[[Sq8Levels]] div w_j. The numerator is
    * non-negative by construction (mn is the corpus minimum), so
    * Spark's truncating `div` and DuckDB's flooring `//` agree. */
  private def sq8Code(mn: Array[Long], w: Array[Long], dim: Int): Column =
    expr(s"array(${(1 to dim).map(j =>
      s"(element_at(e, $j) - ${mn(j - 1)}L) * $Sq8Levels div ${w(j - 1)}L")
      .mkString(", ")})")

  /** Symmetric quantized dot product over RECONSTRUCTIONS — the
    * dequantize-and-dot every scalar quantizer scores with, kept in
    * integers: rec_j = mn_j·[[Sq8Levels]] + level_j·w_j ≈ Levels·e_j
    * (error ≤ w_j per element), so Σ rec·rec tracks the true dot to
    * quantization error. The mn·Levels and w factors are literals; the
    * sum is an explicit dim-term codegen expression (integer adds are
    * order-exact; no HOF in the scoring path). Raw Σ level·level would
    * NOT work: dropping the per-dimension offset terms scrambles the
    * ordering (measured: recall 0.23 vs 1.0 reconstructed).
    *
    * Long headroom (ADVICE r17): Spark's BIGINT multiply wraps
    * silently on overflow where DuckDB raises, so the cross-engine
    * hash equality rests on each reconstruction term staying within
    * Long range. rec_j ≈ Levels·e_j and |e_j| ≤ PcaEScale·|emb_j| with
    * unit-scale embeddings, so |rec_j| ≲ 255·PcaEScale·max|emb| ≈
    * 2.6e5·max|emb| and a term |rec·rec| ≲ 6.5e10·max|emb|² — the
    * 64-term sum stays ~4e12·max|emb|², eight orders under 2^63 for
    * any |emb| the corpus contract allows (≲ 10). The loud require
    * below turns a future corpus that breaks the |e| ≲ PcaEScale·10
    * assumption into an error instead of a silent Spark/DuckDB
    * divergence. */
  private[graft] def sq8RequireHeadroom(mn: Array[Long], w: Array[Long]): Unit = {
    // |rec_j| ≤ |mn_j|·Levels + Levels·w_j; keep each term's product
    // under 2^62 / dim so the dim-term sum cannot reach Long overflow
    val maxRec = mn.zip(w).map { case (m, wj) =>
      math.abs(m) * Sq8Levels + Sq8Levels * wj }.max
    require(maxRec < 3000000000L, // (3e9)² · 64 < 2^62: safe sum bound
      s"sq8 reconstruction magnitude $maxRec breaks the integer-dot " +
        "Long-headroom contract (|e| ≲ PcaEScale·10); re-scale PcaEScale")
  }

  /** r19: the former 64-term `(off + a_j·w_j)(off + b_j·w_j)` reduce tree
    * codegen'd into one >8 KB method HotSpot never JIT-compiled — the SQ8
    * pre-rank ran interpreted (measured 1.06 s/16k rows). The native loop
    * expression is bit-identical (same fold order, same element_at NULL
    * semantics — pinned in CustomExpressionsSpec) and JIT-compiled. */
  private def sq8Dot(a: String, b: String, mn: Array[Long], w: Array[Long],
      dim: Int): Column =
    expressions.Sq8ReconDot(col(a), col(b),
      mn.take(dim).map(_ * Sq8Levels).toSeq, w.take(dim).toSeq)

  /** SQ8-compressed ANN: integer-exact train/encode/score, bounded
    * exact re-rank. Output schema matches the other ann gates. */
  def annSq8(s: SparkSession, dir: String): DataFrame = {
    val e = pcaFrame(s, dir).select(col("vec_id"), col("e"))
    val (mn, w) = sq8Bounds(e, PcaDim)
    annSq8With(s, dir, mn, w)
  }

  /** Deploy-path twin of [[annSq8]] (the ann_ivf_deploy contract): the
    * trained per-dim bounds round-trip through the artifact store and
    * the search runs from the LOADED copy — same oracle as ann_sq8, so
    * a store round-trip can never silently perturb the ranking. */
  def annSq8Deploy(s: SparkSession, dir: String): DataFrame = {
    val e = pcaFrame(s, dir).select(col("vec_id"), col("e"))
    val (mn, w) = sq8Bounds(e, PcaDim)
    // loadSq8Bounds collects the bounds eagerly, so the temp dir can be
    // deleted as soon as the search plan is built (ADVICE r17: repeated
    // gate/bench runs must not leak artifact dirs)
    graft.util.TempArtifacts.withTempDir("graft-sq8-deploy-") { path =>
      graft.artifacts.Artifacts.saveSq8Bounds(s, mn, w, path)
      annSq8FromArtifact(s, dir, path)
    }
  }

  /** Search with bounds LOADED from the artifact store. */
  def annSq8FromArtifact(s: SparkSession, dir: String, path: String): DataFrame = {
    val (mn, w) = graft.artifacts.Artifacts.loadSq8Bounds(s, path)
    annSq8With(s, dir, mn, w)
  }

  private def annSq8With(
      s: SparkSession, dir: String, mn: Array[Long], w: Array[Long]): DataFrame = {
    sq8RequireHeadroom(mn, w)
    val e = pcaFrame(s, dir).select(col("vec_id"), col("e"))
    val coded = e.select(col("vec_id"), sq8Code(mn, w, PcaDim).as("q8"))
    val queries = coded.filter(col("vec_id") < NQueryVectors)
      .select(col("vec_id").as("qid"), col("q8").as("qq"))
    val wS8 = Window.partitionBy("qid").orderBy(col("s8").desc, col("cid").asc)
    val short = coded
      .select(col("vec_id").as("cid"), col("q8").as("cq"))
      .join(broadcast(queries), col("qid") =!= col("cid"))
      .withColumn("s8", sq8Dot("qq", "cq", mn, w, PcaDim))
      .withColumn("srn", row_number().over(wS8))
      .filter(col("srn") <= Sq8Refine)
      .select("qid", "cid")
    // the float column is read ONLY here, for the ≤ NQueryVectors ·
    // Sq8Refine shortlist (broadcast) and the NQueryVectors query rows
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val refined = emb
      .join(broadcast(short), emb("vec_id") === col("cid"))
      .select(col("qid"), col("cid"), col("embedding").as("cv"))
      .join(broadcast(emb.filter(col("vec_id") < NQueryVectors)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))), "qid")
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(refined.select("qid", "cid", "sim"))
  }

  /** IVF-SQ8 — the coarse-cells × scalar-quantizer composition (FAISS
    * "IVF32,SQ8" index-factory shape): the coarse codebook bounds each
    * query's candidates to its nprobe=2 probed cells, the SQ8
    * reconstruction dot pre-ranks those candidates reading dim
    * one-byte levels, and the constant [[Sq8Refine]] re-rank is exact.
    * Where IVF-PQ's ADC stage is float arithmetic, every trained stage
    * here (hash-picked cells + integer bounds) is plain SQL — the
    * whole composition is value-hashed end to end. */
  def annIvfSq8(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cents = ivfCodebook(emb)
    val e = pcaFrame(s, dir).select(col("vec_id"), col("e"))
    val (mn, w) = sq8Bounds(e, PcaDim)
    sq8RequireHeadroom(mn, w)
    val coded = assignCells(emb, cents)
      .join(e, Seq("vec_id"))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"),
        col("cell"), sq8Code(mn, w, PcaDim).as("cq"))
    val qcodes = e.filter(col("vec_id") < NQueryVectors)
      .select(col("vec_id").as("qid"), sq8Code(mn, w, PcaDim).as("qq"))
    val probes = probeCells(emb, cents, nprobe = 2)
      .join(broadcast(qcodes), "qid")
    val wS8 = Window.partitionBy("qid").orderBy(col("s8").desc, col("cid").asc)
    val refined = coded
      .join(broadcast(probes),
        col("probe_cell") === col("cell") && col("qid") =!= col("cid"))
      .withColumn("s8", sq8Dot("qq", "cq", mn, w, PcaDim))
      .withColumn("srn", row_number().over(wS8))
      .filter(col("srn") <= Sq8Refine)
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(refined.select("qid", "cid", "sim"))
  }

  /** Training-sample bound and Lloyd iteration count for the trained
    * codebooks. The sample is the [[PqTrainSample]] corpus vectors with
    * the smallest (h32(vec_id), vec_id) — the same deterministic pick
    * the hash codebooks use, just wider — so training cost is a
    * TakeOrderedAndProject plus a driver-side loop over a CONSTANT
    * ≤ sample·dim floats (~0.5 MB), independent of corpus size. This is
    * how production quantizers train too (FAISS trains on a bounded
    * sample, not the corpus). */
  val PqTrainSample = 2048
  val PqTrainIters = 10

  /** Bounded deterministic training sample, hash order. */
  private def trainSample(emb: DataFrame): Array[Array[Float]] =
    emb
      .select(col("embedding"), Portable.h32(col("vec_id").cast("string")).as("hk"),
        col("vec_id"))
      .orderBy(col("hk"), col("vec_id"))
      .limit(PqTrainSample)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray)

  /** Sequential driver-side Lloyd k-means over `sample`, restricted to
    * dimensions [off, off+sub): returns k × sub double centroids.
    * Deterministic by construction — fixed sample and iteration count,
    * init = first k sample vectors in hash order, ties to the lowest
    * centroid id, empty cells keep their previous centroid, and the
    * accumulation is single-threaded left-to-right (no float
    * reduction-order nondeterminism). */
  private def lloyd(
      sample: Array[Array[Float]], k: Int, off: Int, sub: Int): Array[Array[Double]] = {
    val cents = Array.tabulate(k, sub)((ci, j) => sample(ci)(off + j).toDouble)
    var it = 0
    while (it < PqTrainIters) {
      val sums = Array.ofDim[Double](k, sub)
      val counts = new Array[Long](k)
      var vi = 0
      while (vi < sample.length) {
        val v = sample(vi)
        var best = 0
        var bestD = Double.MaxValue
        var ci = 0
        while (ci < k) {
          var d = 0.0
          var j = 0
          while (j < sub) {
            val diff = v(off + j).toDouble - cents(ci)(j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = ci }
          ci += 1
        }
        var j = 0
        while (j < sub) { sums(best)(j) += v(off + j).toDouble; j += 1 }
        counts(best) += 1
        vi += 1
      }
      var ci = 0
      while (ci < k) {
        if (counts(ci) > 0) {
          var j = 0
          while (j < sub) { cents(ci)(j) = sums(ci)(j) / counts(ci); j += 1 }
        }
        ci += 1
      }
      it += 1
    }
    cents
  }

  /** TRAINED PQ codebook: per-sub-space Lloyd k-means on the bounded
    * sample, assembled back into the K full-dim vectors [[PqCodes]] /
    * [[PqAdcScore]] slice (entry ci's slice m = sub-space-m centroid
    * ci). Same shape as [[pqCodebook]], so the encode/score path is
    * untouched — only the centroids move. Training k-means is not
    * reproducible in the DuckDB oracle's SQL, so the trained path is
    * gated in recall-threshold form ([[annPqRecall]]) against the
    * fully-oracle-checked [[annBrute]] instead of value-hashed. */
  private[graft] def pqCodebookTrained(emb: DataFrame): Seq[Seq[Float]] = {
    val sample = trainSample(emb)
    val dim = sample.head.length
    val sub = dim / PqM
    // k-means needs k distinct seeds: cap K at the sample size (tiny
    // corpora — the codebook can never be larger than the data)
    val k = math.min(PqKTrained, sample.length)
    val books = Array.tabulate(PqM)(m => lloyd(sample, k, m * sub, sub))
    (0 until k).map(ci =>
      (0 until PqM).flatMap(m => books(m)(ci).map(_.toFloat)).toSeq)
  }

  /** TRAINED IVF coarse codebook: full-dimension Lloyd k-means
    * ([[lloyd]]) over the bounded sample — better-shaped cells than the
    * hash pick, same O(k·dim) broadcast and O(n·k) assignment. Gated in
    * recall-threshold form ([[annIvfRecall]]), like the trained PQ path. */
  private[graft] def ivfCodebookTrained(s: SparkSession, emb: DataFrame): DataFrame = {
    val sample = trainSample(emb)
    // k-means needs k distinct seeds: cap k at the sample size (tiny
    // corpora — the codebook can never be larger than the data), same
    // guard as pqCodebookTrained
    val k = math.min(IvfCodebookK, sample.length)
    val cents = lloyd(sample, k, 0, sample.head.length)
    import s.implicits._
    cents.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq.map(_.toFloat)) }
      .toDF("cent_id", "cv")
  }

  /** Minimum per-query hits (of [[TopK]]) for the trained-path recall
    * gates: 4/5 = recall@5 ≥ 0.8 per query. */
  val TrainedRecallMinHits = 4

  /** Recall-threshold CORRECTNESS gate: per query, whether the
    * approximate search found ≥ [[TrainedRecallMinHits]] of the
    * brute-force top-[[TopK]]. The DuckDB oracle asserts `true` for
    * every query — k-means itself is not reproducible in SQL, but
    * [[annBrute]] is fully value-hashed by its own gate, so thresholded
    * recall against it is an engine-checkable quality contract (the
    * same shape a production index's acceptance test uses). */
  private def recallGate(brute: DataFrame, approx: DataFrame): DataFrame =
    brute.select(col("qid"), col("cid"))
      .join(approx.select(col("qid").as("aq"), col("cid").as("ac")),
        col("qid") === col("aq") && col("cid") === col("ac"), "left")
      .groupBy("qid")
      .agg(count(col("ac")).as("n_found"))
      .select(col("qid"),
        // BIGINT 1/0 rather than boolean: every gate column type stays
        // within the representation surface the driver compare has
        // already proven out (BIGINT/DOUBLE/VARCHAR)
        (col("n_found") >= TrainedRecallMinHits).cast("long").as("recall_ok"))
      .orderBy("qid")

  /** recall@5 ≥ 0.8 per query for the trained PQ path. */
  def annPqRecall(s: SparkSession, dir: String): DataFrame =
    recallGate(annBrute(s, dir), annPqTrained(s, dir))

  /** PLANTED-NEAR-DUP recall gate for the trained IVF path. Brute-force
    * recall@k is the wrong contract for a cell-restricted index on this
    * corpus: the synthetic vectors are isotropic, so a query's true
    * top-5 are essentially uniform over the corpus and recall is bound
    * by probed-cell mass (~nprobe/k ≈ 0.06 — measured 0–4 hits of 5),
    * no matter how good the codebook is. What a coarse quantizer MUST
    * deliver is locality: a vector and its near-duplicate (planted
    * cosine ≥ 0.995 pairs, [[corpusWithNearDupVectors]]) land in the
    * same cell, so searching from the planted copy finds its source —
    * the acceptance test a production near-dup/ANN index ships with.
    * Each planted copy queries the trained nprobe=2 index; `dup_found`
    * asserts its source is in the top-[[TopK]]. The DuckDB oracle
    * asserts 1 for every planted query (k-means itself is deliberately
    * NOT mirrored in SQL — same strategy as [[annPqRecall]]). */
  def annIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDupVectors(s, dir)
    val planted = ivfSearchWith(
      corpus, ivfCodebookTrained(s, corpus), nprobe = 2,
      queryPred = col("vec_id") >= PlantOffset &&
        col("vec_id") < PlantOffset + 9L * NQueryVectors)
    planted
      .groupBy("qid")
      .agg(max(when(col("cid") === col("qid") - PlantOffset, 1L).otherwise(0L))
        .as("dup_found"))
      .select((col("qid") - PlantOffset).as("src_id"), col("dup_found"))
      .orderBy("src_id")
  }

  /** Multi-probe LSH: each query also probes every Hamming-1 neighbor of
    * its sign bucket (dims+1 probes) — the standard recall repair for
    * bucketed ANN, still bounding the candidate set to probed buckets
    * ((dims+1)/2^dims of the corpus in expectation) instead of
    * everything. */
  def annLshMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val dims = dimsOf(base)
    val emb = base.select(
      col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dims).as("bucket"))
    val probes = emb.filter(col("vec_id") < NQueryVectors)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket").as("qbucket"))
      .withColumn("probe_i", explode(sequence(lit(0), lit(dims))))
      .withColumn("probe_bucket",
        when(col("probe_i") === dims, col("qbucket"))
          .otherwise(expr(s"qbucket ^ shiftleft(1L, probe_i)")))
    val cands = emb
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("bucket"))
    val joined = cands
      .join(broadcast(probes),
        col("probe_bucket") === col("bucket") && col("qid") =!= col("cid"))
      .withColumn("sim", sim(col("qv"), col("cv")))
    ranked(joined)
  }

  /** Standard RRF discount constant (Cormack et al.'s 60). */
  val RrfK = 60L

  /** HYBRID RETRIEVAL — reciprocal-rank fusion of the lexical and
    * vector rankings (the standard hybrid-search combiner): per query,
    * fuse its ANN cosine top-k with the corpus's BM25 head over the
    * UNION of both lists; `rrf_ppm = Σ 1e6 div (60 + rank)` over the
    * lists the document appears in — integer algebra, so the fused
    * ordering is hash-exact where a float RRF would be ulp-fragile.
    * doc_id and vec_id share the id space in the testdata (one
    * embedding per document).
    *
    * Scale shape: both inputs arrive PRE-BOUNDED (top-k per query /
    * top-k lexical head), so the fusion works on ≤ |queries|·2k rows —
    * broadcast joins only; the corpus-sized work lives in the upstream
    * gates, which is exactly where a production hybrid stack puts it. */
  def retrievalRrf(s: SparkSession, dir: String): DataFrame = {
    val ann = annBrute(s, dir)
      .select(col("qid"), col("cid"), col("rank").as("r_v"))
    // head extraction is a distributed top-k (TakeOrderedAndProject),
    // NOT a global row_number window — that would single-partition-sort
    // the whole corpus; only the k survivors see a window
    val wB = Window.orderBy(col("score").desc, col("cid").asc)
    val bt = TextAnalysis.bm25Score(s, dir)
      .select(col("doc_id").as("cid"), col("score"))
      .orderBy(col("score").desc, col("cid").asc)
      .limit(TopK)
      .select(col("cid"), row_number().over(wB).cast("long").as("r_b"))
    val union = ann.select(col("qid"), col("cid"))
      .unionByName(
        ann.select("qid").distinct().crossJoin(broadcast(bt.select("cid"))))
      .distinct()
    union
      .join(ann, Seq("qid", "cid"), "left")
      .join(broadcast(bt), Seq("cid"), "left")
      .select(col("qid"), col("cid"),
        (coalesce(expr(s"1000000 div ($RrfK + r_v)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + r_b)"), lit(0L))).as("rrf_ppm"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf_ppm").desc, col("cid")))
        .cast("long"))
      .orderBy("qid", "fused_rank")
  }

  // ---------------------------------------------------------------------
  // Top principal component via fixed-point power iteration — the
  // spectral diagnostic a training-data pipeline runs over its embedding
  // column (dominant direction + per-class projection separability).
  //
  // All arithmetic is BIGINT fixed-point so the iteration is
  // order-independent and hash-exact cross-engine (the q61 PageRank
  // recipe): embeddings quantize at [[PcaEScale]], the iterate is
  // renormalized to max-abs [[PcaXScale]] each round, and every division
  // runs as sign * (abs div d) so Spark's truncating `div` and DuckDB's
  // flooring `//` agree on negatives.
  //
  // Scale shape (100 TB): each iteration is ONE scan of the quantized
  // frame collapsing map-side into a single 64-sum row (classic
  // all-reduce — no shuffle wider than the 1-row aggregate); the
  // iterate itself is a 64-long driver vector re-broadcast as literals.
  // The per-row contribution is bounded by |sdot·e| ≤ (64·EScale·XScale
  // / PcaDotShift)·EScale ≈ 3.9e9, so the BIGINT sums hold to ~2.4e9
  // rows per partition-tree leaf — beyond that, raise PcaDotShift.
  // ---------------------------------------------------------------------

  val PcaDim = 64
  val PcaIters = 6
  val PcaEScale = 1000L
  val PcaXScale = 1000000L
  val PcaDotShift = 4096L

  /** Quantized embedding frame: `e` = round(embedding · EScale) as
    * array<bigint>. localCheckpointed — each of the [[PcaIters]]
    * iteration jobs re-reads the materialized integers, not the
    * parquet + HOF transform. */
  private def pcaFrame(s: SparkSession, dir: String): DataFrame =
    pcaFrameMemo.getOrElseUpdate(
      (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s), dir)) {
        val emb = Tables.embeddings(s, dir)
        val Array(dLo, d) = emb
          .agg(min(size(col("embedding"))), max(size(col("embedding"))))
          .head().toSeq.map(_.asInstanceOf[Int]).toArray
        require(d == PcaDim,
          s"embedding dim $d != PcaDim $PcaDim — update PcaDim AND the oracle's range(1, ${PcaDim + 1})")
        // a shorter row would NULL element_at → NULL dot → the row
        // silently vanishes from every PCA/k-means statistic; ragged
        // embeddings must fail loudly instead
        require(dLo == PcaDim,
          s"ragged embeddings: min dim $dLo != $PcaDim — short rows would be silently dropped")
        emb.select(
          col("vec_id"), col("label"),
          expr(s"transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * $PcaEScale) AS BIGINT))")
            .as("e"))
          .localCheckpoint()
      }

  /** Bounded LRU — dropping an evicted reference lets the
    * ContextCleaner reclaim its localCheckpoint blocks (a caller that
    * already holds the frame keeps its blocks alive while in use; only
    * the cache slot is released). A long-lived session cycling many
    * dirs otherwise pins one materialized frame per (session, dir)
    * forever (the Dedup pipeline-cache lesson). */
  private val pcaFrameMemo =
    new graft.util.BoundedMemo[(String, String), DataFrame](8)

  /** Σ_j e_j·x_j as a native loop expression (no HOF in the
    * per-iteration hot path; r19: the former dim-term reduce tree
    * generated a >8 KB method HotSpot never JIT-compiled — see
    * [[expressions.LitDotLong]]). */
  private def pcaDot(x: Array[BigInt], dim: Int = PcaDim): Column =
    expressions.LitDotLong(col("e"), x.take(dim).map(_.toLong).toSeq)

  /** One power-iteration train over an ARBITRARY quantized frame
    * (column `e`: array<bigint> of length `dim`) — the dim/iteration-
    * parameterized core both the PC1 gate and the top-m deflation
    * chain call (the BPE-constants lesson applied to the embed family:
    * corpus geometry is a parameter, not a baked constant — a 768-dim
    * corpus changes [[PcaDim]] and the oracle generator follows).
    * x₀ = [XScale]^dim; per round dot → scaled sign-safe shift →
    * per-dim sums (one 1-row aggregate) → driver-side BigInt
    * renormalization. Returns (final iterate, final gain) where gain =
    * max|y| of the last round — the un-normalized growth of a
    * max-abs-XScale input, a deterministic eigenvalue proxy. */
  private[graft] def pcaPowerIterateFrame(
      e: DataFrame, dim: Int, iters: Int): (Array[BigInt], BigInt) = {
    var x = Array.fill(dim)(BigInt(PcaXScale))
    var gain = BigInt(1)
    for (_ <- 1 to iters) {
      val withDot = e.select(col("e"), pcaDot(x, dim).as("dot"))
        .select(col("e"), expr(
          s"CASE WHEN dot < 0 THEN -((-dot) DIV $PcaDotShift) ELSE dot DIV $PcaDotShift END")
          .as("sdot"))
      // r20 (VERDICT r19 item 5): ONE array-summing native aggregate —
      // the dim independent sum(element_at·sdot) accumulators fused into
      // a HashAggregate update method past HotSpot's JIT ceiling, so
      // every training row accumulated interpreted (the Sq8ReconDot
      // pathology in the aggregate path). Bit-equal totals
      // (CustomExpressionsSpec differential pin).
      val row = withDot.agg(
        graft.functions.expressions.VecSumAgg(col("e"), col("sdot"), dim)
          .as("y")).head()
      val ys = row.getSeq[Long](0)
      val y = (0 until dim).map(i => BigInt(ys(i))).toArray
      gain = y.map(_.abs).max.max(BigInt(1))
      x = y.map(v => BigInt(v.signum) * (v.abs * PcaXScale / gain))
    }
    (x, gain)
  }

  /** The PC1 trainer over `dir`'s embedding corpus (memoized). */
  private[graft] def pcaPowerTrain(s: SparkSession, dir: String): (Array[BigInt], BigInt) =
    pcaMemo.getOrElseUpdate(
      (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s), dir)) {
        pcaPowerIterateFrame(pcaFrame(s, dir), PcaDim, PcaIters)
      }

  private val pcaMemo =
    new graft.util.BoundedMemo[(String, String), (Array[BigInt], BigInt)](64)

  /** EMBED — TOP PRINCIPAL COMPONENT: the dominant direction of the
    * embedding corpus as [[PcaDim]] fixed-point loadings (max-abs =
    * [[PcaXScale]]) plus the final-round gain. The frame is driver-built
    * from the trained iterate (the codebook precedent: training state is
    * bounded, 64 longs — never corpus-sized). */
  def embedPcaPower(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val (x, gain) = pcaPowerTrain(s, dir)
    x.zipWithIndex
      .map { case (v, i) => (i + 1L, v.toLong, gain.toLong) }.toSeq
      .toDF("dim", "loading", "gain")
      .orderBy("dim")
  }

  /** How many principal components the top-m gates extract. */
  val PcaTopM = 4

  /** Integer deflation — the residual frame component c+1 trains on:
    * e′_j = e_j − sdiv(p·x_j, Σx²) where p = eᵀx (exact integer form of
    * e − (eᵀx)x/(xᵀx), with ONE sign-safe truncating division per
    * element so DuckDB replays it bit-for-bit). Magnitude check:
    * |p·x_j| ≤ dim·EScale·XScale² ≈ 6.4e16 and Σx² ≤ dim·XScale² ≈
    * 6.4e13 — both inside BIGINT; the residual stays at e-magnitude so
    * the next power iteration keeps the PC1 headroom analysis. */
  private[graft] def deflateFrame(e: DataFrame, x: Array[BigInt], dim: Int): DataFrame = {
    val nn = x.map(v => v * v).sum
    require(nn > 0 && nn <= BigInt(Long.MaxValue),
      s"axis norm $nn outside (0, Long.MaxValue] — raise scales carefully")
    val nnL = nn.toLong
    e.select(col("vec_id"), col("label"), col("e"), pcaDot(x, dim).as("p"))
      .withColumn("xl", typedLit(x.map(_.toLong).toSeq))
      .select(col("vec_id"), col("label"),
        expr(s"""zip_with(e, xl, (v, xv) -> v -
                |  (CASE WHEN p * xv < 0 THEN -((-(p * xv)) DIV $nnL)
                |        ELSE (p * xv) DIV $nnL END))""".stripMargin).as("e"))
  }

  /** Top-m components via deflation: train PC1 on the quantized frame,
    * subtract its projection in integer algebra ([[deflateFrame]]),
    * train PC2 on the residual, and so on. Each deflated frame is
    * localCheckpointed (it feeds [[PcaIters]] + 1 jobs); total work is
    * m·(iters+1) one-scan all-reduces, driver state m·dim longs. */
  private[graft] def pcaTopMTrain(
      s: SparkSession, dir: String, m: Int = PcaTopM): Seq[(Array[BigInt], BigInt)] =
    pcaTopmMemo.getOrElseUpdate(
      (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s), dir, m)) {
        var e = pcaFrame(s, dir)
        val out = Seq.newBuilder[(Array[BigInt], BigInt)]
        for (c <- 1 to m) {
          val (x, gain) = pcaPowerIterateFrame(e, PcaDim, PcaIters)
          out += ((x, gain))
          if (c < m) e = deflateFrame(e, x, PcaDim).localCheckpoint()
        }
        out.result()
      }

  private val pcaTopmMemo = new graft.util
    .BoundedMemo[(String, String, Int), Seq[(Array[BigInt], BigInt)]](64)

  /** EMBED — TOP-M PRINCIPAL COMPONENTS (VERDICT r16 item 3): the
    * [[PcaTopM]] dominant directions with their gains — what a real
    * separability card reads instead of PC1 alone. Component 1 is
    * bit-identical to [[embedPcaPower]] (same core, same frame). */
  def embedPcaTopm(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    pcaTopMTrain(s, dir).zipWithIndex.flatMap { case ((x, gain), c) =>
      x.zipWithIndex.map { case (v, i) =>
        (c + 1L, i + 1L, v.toLong, gain.toLong)
      }
    }.toDF("component", "dim", "loading", "gain")
      .orderBy("component", "dim")
  }

  /** EMBED — PER-CLASS PROJECTION BANDS OVER PC1..PCm: the projection
    * separability card across all [[PcaTopM]] trained axes. ONE corpus
    * scan computes every component's projection (m explicit dot
    * expressions side by side, then a generator `stack` to long form),
    * so adding components costs expression width, not extra scans —
    * the 100 TB shape. Projections are of the ORIGINAL quantized frame
    * onto each axis (the statistic a card reports), not of the
    * deflated residuals (a training detail). */
  def embedPcaProjectTopm(s: SparkSession, dir: String): DataFrame = {
    val axes = pcaTopMTrain(s, dir).map(_._1)
    val projCols = axes.zipWithIndex.map { case (x, c) =>
      pcaDot(x).as(s"p${c + 1}")
    }
    val stackExpr = axes.indices
      .map(c => s"CAST(${c + 1} AS BIGINT), p${c + 1}")
      .mkString(s"stack(${axes.length}, ", ", ", ") AS (component, proj)")
    pcaFrame(s, dir)
      .select(col("label") +: projCols: _*)
      .selectExpr("label", stackExpr)
      .groupBy(col("component"), col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("proj")).as("sum_proj"),
        min(col("proj")).as("min_proj"),
        max(col("proj")).as("max_proj"))
      .select(
        col("component"), col("label"), col("n"),
        expr("CASE WHEN sum_proj < 0 THEN -((-sum_proj) DIV n) ELSE sum_proj DIV n END")
          .as("mean_proj"),
        col("min_proj"), col("max_proj"))
      .orderBy("component", "label")
  }

  // ---------------------------------------------------------------------
  // Distributed fixed-point Lloyd k-means — the clustering operator a
  // curation pipeline uses for topic bucketing / mixture design. Same
  // determinism recipe as the PCA above: quantized BIGINT vectors, all
  // distances integer, argmin tie-break packed into the distance word,
  // centroid updates via sign-safe truncating means — so the whole
  // iteration replays exactly in DuckDB and the gate is hash-checkable
  // (unlike the PQ/IVF trainers, whose float Lloyd is spec-pinned only).
  //
  // Scale shape (100 TB): per round ONE scan of the quantized frame —
  // assignment is a per-row codegen expression against k broadcast
  // literal centroids (no join), and the update collapses map-side into
  // k·(dim+1) sums (a k-row all-reduce). Driver state is k·dim longs.
  // ---------------------------------------------------------------------

  val KmeansK = 8
  val KmeansIters = 4

  /** Packed assignment word: dist · 16 + cluster (dist ≤ dim·(2·EScale)²
    * = 2.56e8 ≪ 2^59), so min() picks smallest distance THEN smallest
    * cluster id — the deterministic tie-break both engines share. The
    * centroid table enters as a non-primitive literal through the
    * native [[expressions.KmeansPackedMin]] loop, so every Lloyd round
    * reuses ONE compiled codegen class (an unrolled literal tree
    * recompiles ~2-3 s per round — measured; see the expression's
    * scaladoc). */
  private def kmeansPacked(cents: Array[Array[Long]]): Column =
    expressions.KmeansPackedMin(
      col("e"), typedLit(cents.map(_.toSeq).toSeq))

  /** The Lloyd loop over an ARBITRARY quantized frame (column `e`:
    * array<bigint> of length `dim` plus a `vec_id`) — the (dim, k,
    * iters)-parameterized core (the BPE-constants lesson; k is bounded
    * by the pack factor, [[expressions.KmeansPackedMin.MaxCentroids]]).
    * Init = the quantized vectors with vec_id 0..k-1 (hash-anchored,
    * corpus-order-independent); per round one scan assigns via
    * [[kmeansPacked]] and aggregates per-cluster count + dim sums; the
    * driver computes sign-safe truncating means (an emptied cluster
    * keeps its previous centroid). Returns the final centroids and the
    * final assignment's cluster sizes. */
  private[graft] def kmeansTrainFrame(
      e: DataFrame, dim: Int, k: Int, iters: Int): (Array[Array[Long]], Array[Long]) = {
    require(k >= 1 && k <= expressions.KmeansPackedMin.MaxCentroids,
      s"k=$k outside the packed-assignment bound " +
        s"[1, ${expressions.KmeansPackedMin.MaxCentroids}]")
    val init = e.filter(col("vec_id") < k)
      .select(col("vec_id"), col("e")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toArray)
    require(init.length == k,
      s"need vec_id 0..${k - 1} as k-means anchors, found ${init.length}")
    var cents = init
    var sizes = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val assigned = e.select(col("e"),
        (kmeansPacked(cents) % 16L).cast("int").as("cluster"))
      // r20: one array-summing aggregate per cluster instead of dim
      // independent sum(element_at) columns — see VecSumAgg (bit-equal
      // totals, JIT-able update loop)
      val rows = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          graft.functions.expressions.VecSumAgg(col("e"), lit(1L), dim).as("s"))
        .collect()
      sizes = Array.fill(k)(0L)
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val c = r.getInt(0)
        val n = r.getLong(1)
        sizes(c) = n
        val ss = r.getSeq[Long](2)
        var j = 0
        while (j < dim) {
          val sum = ss(j)
          next(c)(j) = if (sum < 0) -((-sum) / n) else sum / n
          j += 1
        }
      }
      cents = next
    }
    (cents, sizes)
  }

  /** The gate-corpus trainer (memoized): [[kmeansTrainFrame]] at the
    * [[PcaDim]]/[[KmeansK]]/[[KmeansIters]] config the oracle generator
    * reads. */
  private[graft] def kmeansTrain(s: SparkSession, dir: String)
      : (Array[Array[Long]], Array[Long]) =
    kmeansMemo.getOrElseUpdate(
      (org.apache.spark.sql.graft.ColumnShim.sessionUuid(s), dir)) {
        kmeansTrainFrame(pcaFrame(s, dir), PcaDim, KmeansK, KmeansIters)
      }

  private val kmeansMemo = new graft.util
    .BoundedMemo[(String, String), (Array[Array[Long]], Array[Long])](64)

  /** EMBED — K-MEANS CLUSTERS: the trained centroid table (cluster,
    * dim, c in EScale units) plus the final assignment's cluster size —
    * k·dim rows of driver-built output (the codebook precedent). */
  def embedKmeans(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val (cents, sizes) = kmeansTrain(s, dir)
    (for {
      c <- 0 until KmeansK
      j <- 0 until PcaDim
    } yield (c.toLong, j + 1L, cents(c)(j), sizes(c)))
      .toDF("cluster", "dim", "c", "n_vectors")
      .orderBy("cluster", "dim")
  }

  /** EMBED — CLUSTER COMPOSITION: the (cluster, label) contingency of
    * the FINAL MODEL's assignment (one more assignment against the
    * trained centroids — what a deployed pipeline does with the model;
    * training-time sizes live in embed_kmeans.n_vectors) — the
    * purity/confusion card a curation pipeline reads before using
    * clusters as mixture buckets. One scan (the same per-row
    * literal-centroid assignment, no join) + one ≤ k·|labels|-row
    * exchange. */
  def embedKmeansProfile(s: SparkSession, dir: String): DataFrame = {
    val (cents, _) = kmeansTrain(s, dir)
    pcaFrame(s, dir)
      .select(col("label"), (kmeansPacked(cents) % 16L).as("cluster"))
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster", "label")
  }

  /** EMBED — PER-CLASS PC1 PROJECTION: every vector's projection onto
    * the trained component, aggregated per label (count, sign-safe mean,
    * min, max) — the separability/drift card: classes whose projection
    * bands separate are linearly distinguishable along the corpus's own
    * dominant axis. One scan of the quantized frame, one |labels|-row
    * exchange. */
  def embedPcaProject(s: SparkSession, dir: String): DataFrame = {
    val (x, _) = pcaPowerTrain(s, dir)
    pcaFrame(s, dir)
      .select(col("label"), pcaDot(x).as("proj"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("proj")).as("sum_proj"),
        min(col("proj")).as("min_proj"),
        max(col("proj")).as("max_proj"))
      .select(
        col("label"), col("n"),
        expr("CASE WHEN sum_proj < 0 THEN -((-sum_proj) DIV n) ELSE sum_proj DIV n END")
          .as("mean_proj"),
        col("min_proj"), col("max_proj"))
      .orderBy("label")
  }
}
