package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Deduplication operators for a training-data pipeline (builder mandate;
  * SURVEY §7.4): exact, MinHash+LSH banded, n-gram Jaccard ground truth,
  * and SimHash signatures.
  *
  * The synthetic corpus has no duplicates, so the dedup queries union the
  * table with deterministic exact/near copies (high doc_id offsets) —
  * guaranteed positives at every scale factor, and the oracle constructs
  * the identical corpus in SQL.
  *
  * Scale design (100 TB): everything is expressed as shuffle-friendly
  * joins/aggregations on hashed keys.
  *  - exact: one hash-partitioned groupBy on md5(text) — no text shuffling
  *    needed beyond the digest if projected early.
  *  - MinHash-LSH: candidate generation joins on (band, band_hash) buckets,
  *    never all-pairs; the brute-force Jaccard join exists only as the
  *    small-scale ground truth (its shingle-equality join explodes
  *    quadratically inside hot buckets at scale — that's the point of LSH).
  *  - All hashes are md5-derived (Portable.h32) so DuckDB reproduces every
  *    stage bit-for-bit.
  */
object Dedup {

  val MinhashPerms = 64
  val BandRows = 4 // 16 bands x 4 rows
  val JaccardThreshold = 0.5

  /** Planted-duplicate id offsets. 10^15-scale so real ids can never
    * collide with planted ones even for ~10^11-document corpora (a
    * million-range offset would overlap real ids at sf≥20, silently
    * corrupting keep/drop decisions while the oracle — which constructs
    * the identical corpus — kept passing). */
  val ExactDupOffset = 1000000000000000L
  val NearDupOffset = 2000000000000000L
  val NoisyDupOffset = 3000000000000000L

  /** documents ∪ exact copies of every 10th doc (id +ExactDupOffset). */
  def corpusWithExactDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + ExactDupOffset).as("doc_id"), col("text")))
  }

  /** documents ∪ near copies of every 7th doc (id +NearDupOffset, text with
    * an appended marker tail ⇒ shingle Jaccard ≈ 0.9). */
  def corpusWithNearDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select(
          (col("doc_id") + NearDupOffset).as("doc_id"),
          concat(col("text"), lit(" graft near dup tail marker")).as("text")))
  }

  /** documents ∪ case/whitespace-perturbed copies of every 11th doc
    * (first 12 chars uppercased, two trailing spaces) — byte-level
    * duplicates these are NOT, so plain [[dedupExact]] misses them;
    * [[dedupExactNormalized]] must catch every one (differential
    * spec-pinned). */
  def corpusWithNoisyDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 11 === 0)
        .select(
          (col("doc_id") + NoisyDupOffset).as("doc_id"),
          concat(upper(expr("substring(text, 1, 12)")),
            expr("substring(text, 13)"), lit("  ")).as("text")))
  }

  /** Canonical text form every serious pipeline hashes INSTEAD of raw
    * bytes: lowercase, non-alphanumerics → space, whitespace runs
    * collapsed, trimmed. Conservative RE2-portable classes so DuckDB
    * normalizes identically byte-for-byte. Pure per-row expression —
    * scan speed, no shuffle. */
  def normalizeText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), "\\s+", " "))

  /** Exact dedup over the NORMALIZED digest — catches the
    * case/punctuation/whitespace variants byte-exact dedup misses, at
    * identical cost (the normalize is a per-row expression fused into
    * the digest projection; the aggregate shape is [[dedupExact]]'s). */
  def dedupExactNormalized(s: SparkSession, dir: String): DataFrame =
    corpusWithNoisyDupes(s, dir)
      .groupBy(md5(normalizeText(col("text"))).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Exact dedup: group by content digest, keep the smallest doc_id. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    corpusWithExactDupes(s, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** (doc_id, shingles) with the per-document DISTINCT shingle array —
    * the one map-side pass every downstream consumer (sizes, signatures,
    * hash pairs) derives from without re-tokenizing. */
  private[functions] def withShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_distinct(shingles3(tokens(col("text")))).as("shingles"))

  /** Per-document distinct-shingle count — `size` of the array, no
    * explode+groupBy shuffle. */
  private def shingleSizes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))

  /** Exploded (doc_id, h1, h2) md5 hash pairs — the 16-byte keys the
    * pairwise-intersection join shuffles instead of full shingle strings
    * (~2× less shuffle bytes; the oracle joins the identical keys, so any
    * 128-bit collision — probability ~2^-64 per pair — is seen the same
    * way by both engines and cannot cause a gate divergence). */
  private def hashPairs(docs: DataFrame): DataFrame = {
    import graft.functions.expressions.ShingleHashPairs
    docs.select(col("doc_id"), explode(ShingleHashPairs(col("shingles"))).as("hp"))
      .select(col("doc_id"), col("hp.h1").as("h1"), col("hp.h2").as("h2"))
  }

  /** Pairwise true-Jaccard of candidate (or all) document pairs from the
    * shared shingle pass: intersection via the hash-pair equality join,
    * sizes via array length. */
  private def jaccardOfPairs(docs: DataFrame, inter: DataFrame): DataFrame = {
    val sizes = shingleSizes(docs)
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jacc", round(
        col("inter").cast("double")
          / (col("sa.n") + col("sb.n") - col("inter")).cast("double"), 6))
      .filter(col("jacc") >= JaccardThreshold)
      .select("doc_a", "doc_b", "jacc")
  }

  private def intersections(hp: DataFrame): DataFrame =
    hp.as("p")
      .join(hp.as("q"),
        col("p.h1") === col("q.h1") && col("p.h2") === col("q.h2")
          && col("p.doc_id") < col("q.doc_id"))
      .groupBy(col("p.doc_id").as("doc_a"), col("q.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))

  /** Pairwise Jaccard ≥ threshold via the hash-pair equality join — the
    * exact ground truth (quadratic in hot shingles; small-scale oracle
    * only — LSH below is the scale path). */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    // shares the memoized cached corpus with the LSH pipeline, so
    // evictSharedPipeline releases this query's intermediate too (a
    // privately-cached copy here had no release path at all)
    val docs = entryFor(s, dir).docs
    jaccardOfPairs(docs, intersections(hashPairs(docs)))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures as a per-row native expression over the distinct
    * shingle array — signatures are a pure per-document function, so no
    * explode+groupBy shuffle exists in this path at all (see MinHash64;
    * the DuckDB oracle keeps the explode formulation — identical values). */
  private def minhashSigs(docs: DataFrame): DataFrame = {
    import graft.functions.expressions.MinHash64
    docs.select(col("doc_id"), MinHash64(col("shingles")).as("sig"))
  }

  /** LSH band buckets from a signature array: 16 bands of 4 rows; the band
    * hash is a positional weighted sum of the 4 minima. */
  private def toBands(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(MinhashPerms / BandRows - 1))).as("band"))
      .withColumn("band_hash", expr(
        // positional 31^k weighted sum of the band's BandRows minima —
        // derived from BandRows so the constants cannot silently drift
        (0 until BandRows)
          .map(k => s"element_at(sig, band*$BandRows + ${k + 1}) * ${math.pow(31, k).toLong}")
          .mkString(" + ")))
      .select("doc_id", "band", "band_hash")

  /** LSH band buckets (exposed for inspection/tests). */
  def minhashBands(s: SparkSession, dir: String): DataFrame =
    toBands(minhashSigs(withShingles(corpusWithNearDupes(s, dir))))
      .orderBy("doc_id", "band")

  /** Memoized shared intermediates per (session, dir): the cached
    * shingled corpus plus the lazily-built verified-pairs result —
    * shared by `dedupJaccard`, `dedupMinhash`, and `dedupDropList`
    * (the materialize-shared-intermediates pattern a production
    * pipeline uses instead of re-deriving per query). */
  private final class PipelineCache(val docs: DataFrame) {
    @volatile var pairs: Option[DataFrame] = None
    /** Set (under [[cacheLock]]) when this entry is dropped: a builder
      * that was mid-[[buildVerifiedPairs]] during eviction must
      * unpersist its freshly-cached result instead of stranding it in
      * an entry no eviction path can reach any more. */
    @volatile var evicted = false
  }

  /** Keyed by `sessionUUID`, NOT the session object: the cached
    * DataFrame values strongly reference their SparkSession, so a
    * weak-keyed map could never reclaim anything (values kept keys
    * reachable — ADVICE r2). Lifecycle is explicit via
    * [[evictSharedPipeline]]; two backstops bound the cache without it
    * (ADVICE r3 — a session discarded without stop() must not leave its
    * blocks cached for the whole app lifetime):
    *  - at most [[MaxCachedSessions]] sessions stay cached — beyond
    *    that the LEAST-RECENTLY-USED session's entries are unpersisted
    *    (newSession-per-request churn keeps creating, never closing;
    *    access re-ranks, so the hot long-lived session is never the
    *    victim);
    *  - ONE app-lifetime listener per SparkContext (not one per session
    *    — churned sessions would each leave a dead listener on the
    *    shared context's bus) clears everything at application end.
    * All mutation happens under [[cacheLock]]: this path runs once per
    * QUERY CONSTRUCTION (never per row), so a plain lock is free, and
    * it keeps eviction out of any ConcurrentHashMap mapping function
    * (computeIfAbsent forbids reentrant modification) and makes the
    * queue and map move atomically. */
  private val sessionCaches =
    scala.collection.mutable.LinkedHashMap.empty[String,
      scala.collection.mutable.LinkedHashMap[String, PipelineCache]]

  private val cacheLock = new Object

  private val appEndHooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Cap on concurrently-cached sessions (see [[sessionCaches]] doc). */
  val MaxCachedSessions = 8

  /** Cap on concurrently-cached dirs WITHIN a session — one session
    * cycling many corpus dirs (a ScaleGen sweep) otherwise pins a
    * cached shingled corpus per dir forever (VERDICT r16 item 7). LRU:
    * a hit re-ranks the dir, so the hot corpus is never the victim. */
  val MaxCachedDirsPerSession = 8

  private def dropOne(e: PipelineCache): Unit = {
    e.evicted = true
    e.docs.unpersist(blocking = false)
    e.pairs.foreach(_.unpersist(blocking = false))
  }

  private def uuidOf(s: SparkSession): String =
    org.apache.spark.sql.graft.ColumnShim.sessionUuid(s)

  private def dropAll(m: scala.collection.mutable.LinkedHashMap[String, PipelineCache]): Unit =
    m.values.foreach(dropOne)

  private def entryFor(s: SparkSession, dir: String): PipelineCache = {
    if (appEndHooked.compareAndSet(false, true)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cacheLock.synchronized(sessionCaches.clear())
          appEndHooked.set(false) // a later fresh context re-registers
        }
      })
    }
    val uuid = uuidOf(s)
    cacheLock.synchronized {
      // LRU touch: remove + re-append moves this session to the back
      val m = sessionCaches.remove(uuid).getOrElse {
        while (sessionCaches.size >= MaxCachedSessions) {
          // eldest = least recently used (insertion order + touch)
          val (victim, vm) = sessionCaches.head
          sessionCaches.remove(victim)
          dropAll(vm)
        }
        scala.collection.mutable.LinkedHashMap.empty[String, PipelineCache]
      }
      sessionCaches.put(uuid, m)
      // repartition BEFORE the cache: document text is byte-tiny but
      // the downstream per-doc work (shingle/minhash/signature) is
      // CPU-heavy, and Spark's byte-targeted file-split planning gives
      // a few-MB corpus only 1-2 scan tasks (targetSize floors at the
      // 4 MB open cost) — every cached consumer would then compute
      // signatures near-serially. Measured at ScaleGen ×10 (a 6.8 MB
      // file): 20 s → 7 s for the edit-distance line. At real scale
      // the exchange moves text bytes once and buys full parallelism.
      // per-dir LRU touch + bound, mirroring the session-level policy
      val entry = m.remove(dir).getOrElse {
        while (m.size >= MaxCachedDirsPerSession) {
          val (vk, victim) = m.head
          m.remove(vk)
          dropOne(victim)
        }
        new PipelineCache(
          withShingles(corpusWithNearDupes(s, dir)
            .repartition(s.sparkContext.defaultParallelism)).cache())
      }
      m.put(dir, entry)
      entry
    }
  }

  /** Unpersist and forget the memoized pipeline for (s, dir). Returns true
    * if an entry existed. Long-lived sessions (and Bench, which wants a
    * cold-build line item) use this to bound the cache. */
  def evictSharedPipeline(s: SparkSession, dir: String): Boolean =
    cacheLock.synchronized {
      sessionCaches.get(uuidOf(s)).flatMap(_.remove(dir)) match {
        case Some(e) =>
          e.evicted = true
          e.docs.unpersist(blocking = false)
          e.pairs.foreach(_.unpersist(blocking = false))
          true
        case None => false
      }
    }

  private[graft] def verifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val entry = entryFor(s, dir)
    entry.synchronized {
      entry.pairs.getOrElse {
        val pairs = buildVerifiedPairs(entry.docs)
        entry.pairs = Some(pairs)
        // the entry may have been LRU-evicted while the build ran
        // (entryFor released cacheLock long ago): its blocks would then
        // be unreachable by every eviction path — release them now.
        // Either order is safe: pairs is published before the check, so
        // a concurrent dropAll sees and unpersists it, and a pre-publish
        // dropAll is caught here (double-unpersist is idempotent). The
        // returned frame stays correct either way — it just recomputes.
        if (entry.evicted) pairs.unpersist(blocking = false)
        pairs
      }
    }
  }

  /** LSH band self-join → distinct candidate (doc_a < doc_b) pairs. The
    * ONE construction of the candidate join, shared by the production
    * build ([[buildVerifiedPairs]]) and the diagnostic stage probe
    * ([[coldStageProbe]]) so the probe can never drift from the plan it
    * claims to measure (ADVICE r8/r9). */
  private def candidatePairs(bands: DataFrame): DataFrame =
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  private def buildVerifiedPairs(docs: DataFrame): DataFrame = {
      val candidates = candidatePairs(toBands(minhashSigs(docs)))
      // size the CACHED pair set independently of the corpus scan: the
      // verify chain is broadcast-join-shaped (no shuffle of its own), so
      // without this the cached sliver of pairs would inherit the full
      // corpus scan's partition count — at 100 TB that's ~1M near-empty
      // cached partitions, and every downstream CC round would schedule
      // a task per partition. repartition-by-column lets AQE coalesce to
      // size (it pins nothing), so the pair set gets pair-set-sized
      // partitions at any scale.
      verifyCandidates(docs, candidates).repartition(col("doc_a")).cache()
  }

  /** Exact-Jaccard verification of an LSH candidate pair list: each pair
    * joins its two cached shingle arrays and scores
    * `size(array_intersect)` per row — verification cost scales with the
    * CANDIDATE set, never the corpus. The band join emits a sliver of
    * the corpus at any scale, so the candidate side is the broadcast-
    * small side of both joins: the shingled corpus never shuffles at
    * all (at extreme candidate volumes the joins degrade to doc_id-keyed
    * shuffles of candidate-doc arrays only — still linear). Replaces the
    * exploded hash-pair self-join (kept for [[dedupJaccard]]'s
    * ground-truth oracle), whose matching inside hot shingles went
    * quadratic ACROSS candidate documents and dominated the cold build
    * (2.1 of 4.4 s at sf0.1); values are identical — the arrays are
    * distinct, so the distinct-intersection count is the same number the
    * hash-pair equality join produced. */
  private def verifyCandidates(docs: DataFrame, candidates: DataFrame): DataFrame =
    candidates
      .join(docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter"),
        size(col("sh_a")).cast("long").as("na"),
        size(col("sh_b")).cast("long").as("nb"))
      .withColumn("jacc", round(
        col("inter").cast("double")
          / (col("na") + col("nb") - col("inter")).cast("double"), 6))
      .filter(col("jacc") >= JaccardThreshold)
      .select("doc_a", "doc_b", "jacc")

  /** Full MinHash-LSH near-dup pipeline: banded candidate pairs, verified
    * by true shingle Jaccard ≥ threshold. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    verifiedPairs(s, dir).orderBy("doc_a", "doc_b")

  /** Relative edit-distance ceiling for [[dedupEditDist]], in ppm of
    * the longer text: pairs within 20% edits are near-duplicates. */
  val EditDupPpm = 200000L

  /** EDIT-DISTANCE near-dup: the same banded LSH candidate generation
    * as [[dedupMinhash]], but verified by CHARACTER-level Levenshtein
    * instead of shingle Jaccard — the verifier of choice when the
    * duplication mode is small in-place edits (typo fixes, template
    * slot fills) that shift every downstream shingle but change few
    * characters. Emits (pair, lev, edit_ppm) for pairs whose relative
    * distance stays within [[EditDupPpm]] of the longer text.
    *
    * Scale shape: the O(|a|·|b|) dynamic program runs ONLY on LSH
    * candidates (never all pairs), and texts join to the bounded
    * candidate frame by id — the corpus never self-joins on content.
    * The shingled corpus comes from the SHARED pipeline cache (one
    * shingle pass serves minhash-, jaccard- and edit-verified dedup in
    * a session). Both engines implement classic Levenshtein over the
    * same ASCII corpus, and the ppm ratio is BIGINT div over
    * non-negatives, so the gate is hash-exact. */
  /** The largest lev satisfying `lev·1e6 div len ≤ ppm` — the TIGHT
    * banded-DP ceiling (Scala mirror of [[bandedLevExpr]]'s SQL; the
    * two must stay in algebraic lockstep — EditDistFuzzSpec pins both
    * to the filter). */
  private[graft] def bandedLevCeil(len: Long, ppm: Long): Long =
    ((ppm + 1L) * len - 1L) / 1000000L

  /** Banded `levenshtein(textA, textB, k)` column with the per-row
    * tight ceiling over `len` — -1 ⟺ the plain form would fail the ppm
    * filter. The caller's Columns are passed through (no hardcoded
    * names to silently mis-bind); `call_function` reaches the 3-arg
    * registry form because the Scala `levenshtein` helper only takes a
    * literal Int threshold, and `div` (IntegralDivide) keeps the
    * ceiling in exact BIGINT arithmetic. */
  private[graft] def bandedLevExpr(
      textA: Column, textB: Column, len: Column, ppm: Long): Column = {
    val ceil = call_function("div",
      (lit(ppm) + lit(1L)) * len - lit(1L), lit(1000000L)).cast("int")
    call_function("levenshtein", textA, textB, ceil).cast("bigint")
  }

  def dedupEditDist(s: SparkSession, dir: String): DataFrame = {
    val cands = candidatePairs(toBands(minhashSigs(entryFor(s, dir).docs)))
    val docs = corpusWithNearDupes(s, dir)
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("text_a")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("text_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("text_a"), col("text_b"),
        greatest(length(col("text_a")), length(col("text_b")))
          .cast("long").as("len"))
      // the scored-pair frame is BYTE-tiny but COMPUTE-heavy to
      // produce (an O(k·len) DP per row): AQE's byte-targeted coalesce
      // folds the post-join read to ONE task and serializes the verify
      // (measured 7.6 s vs 3.1 s for 3× the pairs at ScaleGen ×10/×30,
      // where the ×30 texts happened to outgrow the broadcast
      // threshold and keep their shuffle width). REPARTITION_BY_NUM —
      // explicit count, AFTER the joins, immediately before the DP —
      // is the one exchange AQE never coalesces.
      .repartition(s.sparkContext.defaultParallelism)
      // THRESHOLD-banded DP: `lev·1e6 div len ≤ ppm` ⟺
      // `lev ≤ ((ppm+1)·len − 1) div 1e6` EXACTLY (the contrapositive
      // of the floor-div filter: lev·1e6 < (ppm+1)·len, and
      // ceil(x/y)−1 = (x−1) div y for positive integers — the naive
      // `(len·ppm) div 1e6` ceiling is one short whenever
      // (len·ppm mod 1e6) + len − 1 ≥ 1e6, first at len ≈ 2·10⁵ for
      // ppm = 2·10⁵, dropping pairs the oracle keeps), so handing
      // that ceiling to levenshtein's banded form computes O(k·len)
      // instead of O(len²) per pair and returns -1 for exactly the
      // pairs the ppm filter would drop anyway — identical output,
      // ~3× cheaper verify (the oracle keeps the plain 2-arg form +
      // the same filter)
      .select(col("doc_a"), col("doc_b"),
        bandedLevExpr(col("text_a"), col("text_b"), col("len"), EditDupPpm)
          .as("lev"),
        col("len"))
      // lev feeds 3 consumers (its own column, the ppm, the filter):
      // a barrier keeps CollapseProject from inlining the DP 3× per
      // pair; the checkpointed frame is candidate-bounded (4 longs)
      .localCheckpoint()
      .filter(col("lev") >= 0)
      .select(col("doc_a"), col("doc_b"), col("lev"),
        expr("lev * 1000000 div len").as("edit_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** CROSS-SOURCE OVERLAP MATRIX — the contamination diagnostic a
    * multi-source corpus publishes: for every source pair, the count
    * of shared word-3-shingles and the containment ratio against the
    * smaller source (BIGINT ppm). High containment = one source
    * mirrors another (scraped copies, syndication) — the signal that
    * triggers cross-source dedup before training.
    *
    * Scale shape: ONE distinct exchange on (source, shingle-hash);
    * the shingle-keyed self-join fans out at most (|sources| choose 2)
    * rows per key — bounded by the source count, never the corpus —
    * and collapses map-side onto the |sources|² matrix. Joins carry
    * 16-byte md5 pairs, not shingle strings (the [[hashPairs]]
    * discipline). */
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.ShingleHashPairs
    val sh = Tables.documents(s, dir)
      .select(col("source"),
        explode(ShingleHashPairs(
          array_distinct(shingles3(tokens(col("text")))))).as("hp"))
      .select(col("source"), col("hp.h1").as("h1"), col("hp.h2").as("h2"))
      .distinct()
      .localCheckpoint() // feeds the counts AND both self-join sides
    val counts = sh.groupBy("source").agg(count(lit(1)).as("n"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.h1") === col("b.h1") && col("a.h2") === col("b.h2") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(counts.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(counts.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_shared"),
        expr("(n_shared * 1000000) div least(n_a, n_b)").as("contain_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** DIAGNOSTIC stage-by-stage wall times of the cold LSH build —
    * Bench runs this once, UNTIMED, after the cold line item so a slow
    * driver round is attributable to a stage (shingle+cache, band
    * generation, band self-join, semi-bounded intersections, verify)
    * instead of needing another guessing round (VERDICT r7 item 2).
    *
    * Runs [[buildVerifiedPairs]]'s own building blocks
    * ([[candidatePairs]], [[verifyCandidates]]) stage-for-stage but
    * materializes each intermediate (cache+count / noop write), so stage
    * costs are isolated rather than fused into one job — the stage SUM
    * therefore brackets the real single-job cold time from above. The
    * candidate join is the SHARED [[candidatePairs]], so the probe
    * cannot drift from the production plan; only the final
    * repartition+cache of the pair set is production-only. */
  def coldStageProbe(s: SparkSession, dir: String): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      out += name -> (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    evictSharedPipeline(s, dir)
    val docs = withShingles(corpusWithNearDupes(s, dir)
      .repartition(s.sparkContext.defaultParallelism)).cache() // mirror entryFor
    timed("docs_shingle_cache")(docs.count())
    val bands = toBands(minhashSigs(docs))
    timed("minhash_bands")(noop(bands))
    val candidates = candidatePairs(bands).cache()
    timed("band_join_candidates")(candidates.count())
    // production additionally repartition+caches the verified pair set
    // (buildVerifiedPairs); the probe measures the verify compute itself —
    // the sort stands in for the materialize
    timed("pair_verify_sort")(noop(
      verifyCandidates(docs, candidates).orderBy("doc_a", "doc_b")))
    candidates.unpersist(blocking = false)
    docs.unpersist(blocking = false)
    evictSharedPipeline(s, dir)
    out.toSeq
  }

  /** INCREMENTAL near-dup: dedup an incoming batch against an existing
    * index plus itself, WITHOUT ever joining the indexed corpus against
    * itself — the daily-increment shape that makes near-dup affordable
    * at 100 TB: the index contributes only its (band, band_hash) table
    * (precomputed and stored in production; the index text is never
    * re-shingled, never re-scanned), index×index pairs are never
    * generated, and verification touches candidate shingle arrays only.
    *
    * Gate partition: even doc_ids play the already-deduped index, odd
    * doc_ids the incoming batch. An incoming doc is dropped when it
    * verifies (Jaccard ≥ [[JaccardThreshold]]) against any indexed doc
    * or an earlier (smaller-id) incoming doc — the first-writer-wins
    * rule applied across increments. Differentially pinned against the
    * full oracle-gated pair set in IncrementalDedupSpec. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDupes(s, dir)
    val (idxShingles, idxBands) =
      dedupIndexTables(corpus.filter(col("doc_id") % 2 === 0))
    dedupIncrementalAgainst(idxShingles, idxBands,
      corpus.filter(col("doc_id") % 2 =!= 0))
  }

  /** The two STORABLE index tables the incremental run consumes:
    * (doc_id, shingles) for verification and (doc_id, band, band_hash)
    * for candidate generation. A production pipeline writes both to
    * parquet once and feeds them back to [[dedupIncrementalAgainst]] on
    * every increment — the parquet round-trip is spec-pinned
    * (IncrementalDedupSpec). */
  def dedupIndexTables(rawDocs: DataFrame): (DataFrame, DataFrame) = {
    val sh = withShingles(rawDocs)
    (sh, toBands(minhashSigs(sh)))
  }

  /** Core of [[dedupIncremental]]: incoming raw docs vs an index given
    * as its two (possibly storage-loaded) tables. */
  def dedupIncrementalAgainst(
      idxShingles: DataFrame, idxBands: DataFrame,
      incomingRaw: DataFrame): DataFrame = {
    val newDocs = withShingles(incomingRaw)
    incrementalDecisions(idxShingles, idxBands,
      newDocs, toBands(minhashSigs(newDocs)))
  }

  /** One full daily-increment step: adjudicate the incoming batch
    * against the index AND fold the keepers back into the index tables,
    * computing the incoming shingles/bands exactly once for both uses.
    * Returns (decisions, updated shingle table, updated band table); a
    * production pipeline writes all three to storage and feeds the two
    * tables to the next day's step — successive steps compose: two
    * increments through the update equal one batched increment,
    * byte-identical decisions (IncrementalDedupSpec pins it on the gate
    * corpus). Only keepers enter the index — a dropped doc never has to
    * be carried, so the index grows with the DEDUPED corpus, not the
    * raw feed.
    *
    * Semantic boundary of keepers-only, stated precisely: the batched
    * form drops a doc that verifies against ANY earlier doc, including
    * one that itself drops; sequentially, a dropped doc leaves no index
    * entry. The two coincide whenever every dropped doc's duplicate has
    * a SURVIVING witness (its cluster's first writer) — which holds
    * when near-duplicate clusters are verify-connected to their first
    * writer, the overwhelmingly common case at threshold 0.5 where
    * clusters are mutations of one original. A pipeline that must
    * reproduce batch decisions exactly under adversarial chain-shaped
    * clusters should merge dropped docs' rows into BOTH tables as well
    * (trading index growth for exact batch equivalence) — then later
    * increments see precisely the batched candidate and verify sets. */
  def dedupIncrementalStep(
      idxShingles: DataFrame, idxBands: DataFrame,
      incomingRaw: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val newDocs = withShingles(incomingRaw)
    val newBands = toBands(minhashSigs(newDocs))
    val decisions =
      incrementalDecisions(idxShingles, idxBands, newDocs, newBands)
    val kept = decisions.filter(col("action") === "keep").select("doc_id")
    (decisions,
      idxShingles.unionByName(newDocs.join(kept, Seq("doc_id"), "left_semi")),
      idxBands.unionByName(newBands.join(kept, Seq("doc_id"), "left_semi")))
  }

  /** Index update from a STORED decision frame — the shape for pipelines
    * that adjudicate and update in separate jobs (decisions written to
    * storage between them, so the decision plan is never re-derived).
    * Re-shingles only the kept incoming docs: O(increment), never
    * O(corpus). */
  def dedupIndexUpdate(
      idxShingles: DataFrame, idxBands: DataFrame,
      incomingRaw: DataFrame, decisions: DataFrame): (DataFrame, DataFrame) = {
    val keptRaw = incomingRaw.join(
      decisions.filter(col("action") === "keep").select("doc_id"),
      Seq("doc_id"), "left_semi")
    val (sh, bands) = dedupIndexTables(keptRaw)
    (idxShingles.unionByName(sh), idxBands.unionByName(bands))
  }

  private def incrementalDecisions(
      idxShingles: DataFrame, idxBands: DataFrame,
      newDocs: DataFrame, newBands: DataFrame): DataFrame = {
    val oldDocs = idxShingles
    val oldBands = idxBands
    // index-vs-incoming: every bucket collision (either id order — the
    // drop target is always the incoming side); incoming-vs-incoming:
    // ordered so the earlier doc wins
    val candOldNew = oldBands.as("x")
      .join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val candNewNew = newBands.as("x")
      .join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val candidates = candOldNew.unionByName(candNewNew).distinct()
    val drops = verifyCandidates(oldDocs.unionByName(newDocs), candidates)
      .select(col("doc_b").as("doc_id")).distinct()
    newDocs.select("doc_id")
      .join(drops.withColumn("hit", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("hit").isNotNull, "drop").otherwise("keep").as("action"))
      .orderBy("doc_id")
  }

  /** Keep/drop decision from the MinHash-LSH pipeline: for every verified
    * near-dup pair (a < b), the higher id is dropped — the one-hop
    * representative rule training pipelines apply when full connected
    * components (an iterative computation) aren't warranted. */
  def dedupDropList(s: SparkSession, dir: String): DataFrame = {
    val drops = verifiedPairs(s, dir).select(col("doc_b").as("doc_id")).distinct()
    corpusWithNearDupes(s, dir)
      .select("doc_id")
      .join(drops.withColumn("hit", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("hit").isNotNull, "drop").otherwise("keep").as("action"))
      .orderBy("doc_id")
  }

  /** Undirected connected components over an edge list (doc_a, doc_b)
    * by min-label propagation: every node's label converges to the
    * smallest doc_id in its component. Returns (doc_id, component) for
    * every node that appears in an edge.
    *
    * Scale shape: each round is one hash join (edges ⋈ labels, both
    * sides partitioned by the join key) + one min-aggregation — the
    * classic BSP step. Rounds = component diameter, bounded by
    * `maxIters`; each round is `localCheckpoint`ed, so the logical plan
    * and lineage stay O(1) per round instead of growing with the
    * iteration count (on a real cluster with executor churn, swap for
    * reliable `checkpoint` to a cluster store — same shape). For
    * graphs with giant/high-diameter components the
    * large-star/small-star alternation (Kiveris et al., "Connected
    * components in MapReduce and beyond", SoCC 2014) reaches fixpoint
    * in O(log n) rounds with the same per-round join shape; near-dup
    * graphs are overwhelmingly tiny star components, where plain
    * min-propagation converges in 2-3 rounds and skips the extra
    * per-round edge rewrite. */
  def components(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    // LAZY localCheckpoint: the convergence probe right below is the
    // first action, so it materializes the checkpoint — one job per
    // round instead of an eager-checkpoint job PLUS the probe job
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("component"))
      .localCheckpoint(eager = false)
    // convergence probe: labels only ever DECREASE and the node set is
    // fixed, so the exact DECIMAL(38,0) sum of labels strictly decreases
    // until fixpoint — one cheap aggregate per round instead of a
    // prev-vs-next join (halves the per-round job count)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // coalesce: sum over zero rows is SQL NULL (empty edge set must
      // converge on round one, not NPE in the comparison)
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"))
        .collect()(0).getDecimal(0)
    var iters = 0
    var converged = false
    try {
      // inside the try: the FIRST probe can already fail (bad input
      // path surfaces at the first action) and must still unpersist
      var prevSum = labelSum(labels)
      while (!converged && iters < maxIters) {
        val msgs = edges
          .join(labels.withColumnRenamed("doc_id", "src"), "src")
          .select(col("dst").as("doc_id"), col("component"))
        val next = labels.unionByName(msgs)
          .groupBy("doc_id")
          .agg(min("component").as("component"))
          .localCheckpoint(eager = false)
        val nextSum = labelSum(next) // materializes the lazy checkpoint
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        iters += 1
      }
    } finally {
      // unpersist on ALL exits — a mid-loop failure must not leak the
      // cached edge set for the session's lifetime (prior rounds'
      // localCheckpoint RDDs are reclaimed by ContextCleaner once
      // unreferenced; an explicit cache() is not)
      edges.unpersist(blocking = false)
    }
    // unconverged labels would silently emit WRONG keep/drop decisions
    // downstream (ADVICE r3) — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"components: min-label propagation did not converge in $maxIters rounds " +
        "(component diameter exceeds the cap) — raise maxIters or use componentsStar")
    labels
  }

  /** Undirected connected components by LARGE-STAR / SMALL-STAR
    * alternation (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii —
    * "Connected components in MapReduce and beyond", SoCC 2014):
    * reaches the star-forest fixpoint (every node linked directly to
    * its component minimum) in O(log n) rounds on ANY graph — the
    * scale answer for adversarial high-diameter components, where
    * [[components]]' min-label propagation needs diameter rounds.
    * Same output contract as [[components]]: (doc_id, component) for
    * every node that appears in an edge.
    *
    * Per round (all edge sets kept CANONICAL: src > dst, distinct,
    * no self-loops):
    *  - large-star(u): with m = min(Γ(u) ∪ {u}) over the bidirectional
    *    neighborhood, emit (v, m) for every neighbor v > u — one
    *    groupBy(min) + one hash join + distinct;
    *  - small-star(u): over larger-to-smaller edges grouped by the
    *    larger endpoint u with m = min(Γ<(u)), emit (v, m) for the
    *    non-min smaller neighbors plus (u, m) — same shape.
    * Fixpoint when the edge set stops changing (both sets are distinct
    * canonical, so |next| = |cur| plus an empty next∖cur anti-join is
    * set equality — exact, no hash-probe collision risk). Each round
    * `localCheckpoint`s like [[components]] (reliable `checkpoint` on a
    * real cluster). The per-round edge rewrite roughly doubles round
    * cost vs min-label on star-dominated near-dup graphs, which is why
    * [[dedupComponents]] defaults to min-label; this is the drop-in for
    * graphs with long chains / giant components. */
  def componentsStar(pairs: DataFrame, maxIters: Int = 50): DataFrame =
    componentsStarWithRounds(pairs, maxIters)._1

  private[graft] def componentsStarWithRounds(
      pairs: DataFrame, maxIters: Int = 50): (DataFrame, Int) = {
    // lazy: only consumed by the final label join after the loop — an
    // eager checkpoint would run an extra upfront job over the pairs
    val nodes = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint(eager = false)
    def canonical(df: DataFrame): DataFrame = df
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val b = e.select(col("src").as("u"), col("dst").as("v"))
        .unionByName(e.select(col("dst").as("u"), col("src").as("v")))
      val m = b.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      b.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is canonical (src > dst): group by the larger endpoint
      val m = e.groupBy("src").agg(min("dst").as("m"))
      val relink = e.join(m, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val center = m.select(col("src"), col("m").as("dst"))
      relink.unionByName(center)
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    var e = canonical(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .localCheckpoint(eager = false)
    var rounds = 0
    // the materializing count also carries across rounds: |e| is known
    // when the next round compares against it (no per-round recount)
    var eCount = e.count()
    var converged = eCount == 0L
    while (!converged && rounds < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // ONE probe job per round: a left-outer join against the previous
      // edge set yields |next| and |next \ e| from the same pass (both
      // sides distinct ⇒ novel == 0 && equal counts is exact set
      // equality — same test the old count()+exceptAll pair ran as two
      // jobs). The aggregate is also the lazy checkpoint's
      // materializing action.
      val old = e.select(col("src").as("o_src"), col("dst").as("o_dst"))
      val probe = next.join(old,
          col("src") === col("o_src") && col("dst") === col("o_dst"), "left_outer")
        .agg(count(lit(1)).as("total"),
          count(when(col("o_src").isNull, 1)).as("novel"))
        .collect().head
      val (nextCount, novel) = (probe.getLong(0), probe.getLong(1))
      converged = novel == 0L && nextCount == eCount
      e = next
      eCount = nextCount
      rounds += 1
    }
    // unconverged labels would silently emit WRONG keep/drop decisions
    // downstream (ADVICE r3) — fail loudly instead
    if (!converged) throw new IllegalStateException(
      s"componentsStar: star contraction did not reach fixpoint in $maxIters " +
        "rounds — raise maxIters (expected O(log n) alternations)")
    // star forest: every non-root points straight at its component min
    // (min-agg collapses the root's self-grouping — one edge per non-root
    // at fixpoint makes it a per-node no-op)
    val labels = nodes.join(e.withColumnRenamed("src", "doc_id"), Seq("doc_id"), "left")
      .groupBy("doc_id")
      .agg(min(coalesce(col("dst"), col("doc_id"))).as("component"))
    (labels, rounds)
  }

  /** Keep/drop decision with TRANSITIVE closure: connected components
    * over the verified near-dup pairs, keeping exactly one document
    * (the smallest id) per component — the production drop rule.
    * Closes the one-hop gap of [[dedupDropList]]: with pairs A~B and
    * B~C but not A~C, one-hop drops B yet keeps C; here B and C both
    * collapse into A's component.
    *
    * Default CC engine is [[componentsStar]] (O(log n) rounds on ANY
    * graph shape — the round count a production pipeline can budget
    * for without knowing component diameters in advance); min-label
    * propagation stays available as [[dedupComponentsMinLabel]] for
    * star-dominated graphs where its cheaper per-round shape wins. */
  def dedupComponents(s: SparkSession, dir: String): DataFrame =
    keepDropByComponent(s, dir, componentsStar(verifiedPairs(s, dir)))

  /** [[dedupComponents]] computed through diameter-round min-label
    * propagation ([[components]]) instead of star contraction —
    * identical result by construction, gate-checked against the same
    * recursive-CTE transitive-closure oracle. Cheaper per round (no
    * edge rewrite) but needs diameter-many rounds: the right pick only
    * when components are known-tiny stars. */
  def dedupComponentsMinLabel(s: SparkSession, dir: String): DataFrame =
    keepDropByComponent(s, dir, components(verifiedPairs(s, dir)))

  private def keepDropByComponent(
      s: SparkSession, dir: String, comp: DataFrame): DataFrame =
    corpusWithNearDupes(s, dir)
      .select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("action",
        when(col("component") === col("doc_id"), "keep").otherwise("drop"))
      .orderBy("doc_id")

  /** LEAKAGE-SAFE train/eval split: split assignment hashes the
    * near-dup CLUSTER id, not the document — every member of a
    * duplicate cluster lands in the same split, so a train document
    * can never be a near-copy of an eval document (the contamination
    * a doc-level hash split silently permits). Composes the
    * star-contraction components with the [[sampleByHash]] md5 bucket
    * rule on the cluster label; singleton docs hash their own id.
    * Scale shape: the CC fixpoint's cost (banded-LSH candidates, never
    * all-pairs) + one scan-speed hash projection. */
  /** Eval fraction (percent of the md5 bucket space) shared by the
    * whole hash-split family. The DuckDB oracles for
    * `split_leakage_safe` and `report_split_contamination` derive
    * their `% 100 < EvalPct` literal from THIS constant
    * (ExtensionOracles), so gate and mirror can never desync — which
    * is why the gate functions take no evalPct parameter. */
  val EvalPct = 10

  def splitLeakageSafe(s: SparkSession, dir: String): DataFrame = {
    val comp = componentsStar(verifiedPairs(s, dir))
    corpusWithNearDupes(s, dir)
      .select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
      .select(col("doc_id"), col("cluster"),
        when(pmod(h32(col("cluster").cast("string")), lit(100L)) < EvalPct,
          "eval").otherwise("train").as("split"))
      .orderBy("doc_id")
  }

  /** Split-contamination card — the measurement that justifies
    * [[splitLeakageSafe]]: for BOTH split policies over the near-dup
    * corpus (naive per-DOCUMENT hash, leakage-safe per-CLUSTER hash;
    * same evalPct, same md5 bucket rule), the number of eval documents
    * with a VERIFIED near-duplicate in train. The cluster policy is
    * contamination-free BY CONSTRUCTION — both ends of every verified
    * pair share a star-contraction component, hence a split — and this
    * gate pins that zero; the doc policy's leak is the 2·p·(1−p)
    * cross-assignment mass a pipeline silently eats when it splits per
    * document (eval metrics inflated by train near-copies).
    *
    * Scale shape: the pair set is the banded-LSH verified-pairs build
    * (never all-pairs); the card is one aggregate over 2·|pairs| rows
    * plus one corpus-side aggregate, joined as two ONE-ROW frames
    * (by-design broadcast attach; PlanGuard exclusion is for the CC
    * fixpoint that runs at construction, like dedup_canonical). */
  def reportSplitContamination(s: SparkSession, dir: String): DataFrame = {
    val pairs = verifiedPairs(s, dir)
    val clustered = corpusWithNearDupes(s, dir)
      .select("doc_id")
      .join(componentsStar(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
    def evalOf(key: Column): Column =
      pmod(h32(key.cast("string")), lit(100L)) < EvalPct
    val assign = clustered.select(col("doc_id"),
      evalOf(col("doc_id")).as("ed"), evalOf(col("cluster")).as("ec"))
    val sym = pairs.select(col("doc_a").as("d"), col("doc_b").as("o"))
      .unionByName(pairs.select(col("doc_b").as("d"), col("doc_a").as("o")))
    val leaks = sym
      .join(assign.select(col("doc_id").as("d"),
        col("ed").as("d_ed"), col("ec").as("d_ec")), "d")
      .join(assign.select(col("doc_id").as("o"),
        col("ed").as("o_ed"), col("ec").as("o_ec")), "o")
      .agg(
        countDistinct(when(col("d_ed") && !col("o_ed"), col("d")))
          .as("leak_d"),
        countDistinct(when(col("d_ec") && !col("o_ec"), col("d")))
          .as("leak_c"))
    val totals = assign.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("ed"), 1L).otherwise(0L)).as("n_eval_d"),
      sum(when(col("ec"), 1L).otherwise(0L)).as("n_eval_c"))
    totals.join(broadcast(leaks))
      .select(expr(
        """stack(2,
          |  'cluster_hash', n_docs, n_eval_c, leak_c,
          |  'doc_hash', n_docs, n_eval_d, leak_d)
          |AS (policy, n_docs, n_eval, leaked_eval)""".stripMargin))
      .withColumn("leak_ppm",
        expr("leaked_eval * 1000000 div greatest(n_eval, 1)"))
      .orderBy("policy")
  }

  /** QUALITY-BASED canonical selection per near-dup cluster: production
    * pipelines keep the BEST document of each duplicate cluster, not the
    * smallest id — here "best" = most tokens (the most complete version),
    * ties to the smallest id. Composes the star-contraction components
    * with per-doc token counts; the winner per component is an argmax
    * folded into ONE packed `min()` aggregate — `(1024 − n_toks)·2^51 +
    * doc_id` orders by (longest, then smallest id) — so the plan is a
    * single combiner-friendly groupBy, no window over components and no
    * join-back (doc ids < 2^51 and token counts < 1024 are guarded).
    * On the synthetic corpus the planted near-copies carry an appended
    * tail, so the canonical doc is the COPY, not the min-id original —
    * the gate genuinely distinguishes this rule from min-id keep. */
  def dedupCanonical(s: SparkSession, dir: String): DataFrame = {
    val corpus = corpusWithNearDupes(s, dir)
    val comp = corpus.select("doc_id")
      .join(componentsStar(verifiedPairs(s, dir)), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
    val toks = corpus
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_toks"))
      .withColumn("n_toks",
        when(col("n_toks") < 1024L && col("doc_id") < (1L << 51), col("n_toks"))
          .otherwise(raise_error(concat(lit("dedup_canonical pack overflow: doc "),
            col("doc_id").cast("string")))))
    comp.join(toks, Seq("doc_id"))
      .withColumn("key", (lit(1024L) - col("n_toks")) * lit(1L << 51) + col("doc_id"))
      .groupBy("component")
      .agg(count(lit(1)).as("n_docs"), min(col("key")).as("key"))
      .select(col("component"), col("n_docs"),
        col("key").bitwiseAND(lit((1L << 51) - 1)).as("canonical_doc"),
        (lit(1024L) - shiftright(col("key"), 51)).as("canonical_toks"))
      .orderBy("component")
  }

  /** Deterministic hash-based stratified sampling — the data-selection
    * primitive of training pipelines (reproducible across runs/engines,
    * unlike rand()): keep documents whose content hash lands in the first
    * `pct` of 100 buckets. */
  def sampleByHash(s: SparkSession, dir: String, pct: Int = 10): DataFrame =
    graft.Tables.documents(s, dir)
      .filter(pmod(h32(col("text")), lit(100L)) < pct)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** PER-STRATUM deterministic sampling: each language keeps its own
    * hash-bucket rate (data-mixture control — upsample scarce languages,
    * downsample dominant ones — with rand()-free reproducibility). Same
    * scan-speed filter as [[sampleByHash]]: the per-row rate lookup is a
    * map literal, zero joins, zero shuffles. */
  def sampleStratified(
      s: SparkSession, dir: String,
      rates: Map[String, Int] = Map("en" -> 50, "zh" -> 25),
      defaultPct: Int = 10): DataFrame = {
    val rateOf = coalesce(
      element_at(
        map(rates.toSeq.sortBy(_._1)
          .flatMap { case (l, p) => Seq(lit(l), lit(p.toLong)) }: _*),
        col("lang")),
      lit(defaultPct.toLong))
    graft.Tables.documents(s, dir)
      .filter(pmod(h32(col("text")), lit(100L)) < rateOf)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** EXACT-SIZE deterministic sample per stratum ("reservoir" semantics,
    * rand()-free): the `n` documents with the smallest `(h32(text),
    * doc_id)` per language. Rate-based sampling ([[sampleByHash]] /
    * [[sampleStratified]]) only hits its target size in expectation;
    * mixture construction often needs exactly-n per source.
    *
    * Scale shape (100 TB): a naive `row_number() OVER (PARTITION BY
    * lang)` sorts each WHOLE stratum inside one task — the giant-group
    * trap (a 40 TB `en` stratum in one sort). Instead:
    *   1. one scan aggregates stratum sizes (|langs| rows, broadcast);
    *   2. a per-stratum candidate bound `8n/|stratum|` of the hash range
    *      keeps every row whose uniform hv falls in the bottom slice —
    *      candidates are ~8n per stratum, independent of stratum size
    *      (`P[candidates < n] ≤ exp(-3n)` by Chernoff — never at n=40);
    *   3. the exact window ranking runs on the bounded candidate set
    *      only — same candidate-bound-then-exact design as the band
    *      percentiles (Relational.q41PercentileBand) and the LSH verify.
    * The one-row-per-stratum capture probe makes the (theoretical) bound
    * failure loud instead of silently short: `require` fires before any
    * result is emitted. */
  def sampleReservoir(s: SparkSession, dir: String, n: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hRange = 4294967296L // h32 is uniform on [0, 2^32)
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), h32(col("text")).as("hv"))
    val bounds = docs.groupBy("lang").agg(count(lit(1)).as("n_rows"))
      .withColumn("bound",
        least(lit(hRange), lit(8L * n) * lit(hRange) / col("n_rows") + lit(1L)))
    val cand = docs.join(broadcast(bounds), Seq("lang"))
      .filter(col("hv") < col("bound"))
    // capture probe: every stratum must still hold min(n, |stratum|)
    // candidates — one tiny aggregate over the ~8n-per-stratum candidate
    // set, ONE driver-side row (cf. the CC convergence probe precedent).
    // Anchored on the BOUNDS table (every stratum has a row there), not
    // the candidate set: a stratum with ZERO candidates produces no
    // candidate group, and a candidate-side-only probe would let the
    // exact failure it exists to catch pass silently (ADVICE r6).
    val deficient = bounds.join(
        cand.groupBy("lang").agg(count(lit(1)).as("got")), Seq("lang"), "left")
      .filter(coalesce(col("got"), lit(0L)) < least(lit(n.toLong), col("n_rows")))
      .count()
    require(deficient == 0L,
      s"candidate bound under-captured $deficient strata (P ≤ exp(-3·$n) — investigate hv uniformity)")
    val w = Window.partitionBy("lang").orderBy(col("hv"), col("doc_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select("lang", "rank", "doc_id")
      .orderBy("lang", "rank")
  }

  /** Temperature-weighted mixture sampling (α = 0.5): per-stratum targets
    * proportional to `sqrt(|stratum|)` — the standard LLM data-mixing move
    * that flattens a skewed source distribution (dominant strata are
    * down-weighted relative to their share, scarce ones up-weighted) —
    * then an exact-size deterministic selection per stratum.
    *
    * Cross-engine-exact arithmetic: weights are `floor(sqrt(n))` as
    * BIGINT (IEEE sqrt of an exact integer, identically rounded in both
    * engines), the weight total is an integer sum (order-independent,
    * unlike a double sum), and targets use integer division — so DuckDB
    * reproduces every target exactly. Selection is the [[sampleReservoir]]
    * candidate-bound + exact-window discipline: ~8·target candidates per
    * stratum regardless of stratum size, loud capture probe, never a
    * whole-stratum sort. */
  def sampleTemperature(s: SparkSession, dir: String, budget: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hRange = 4294967296L
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), h32(col("text")).as("hv"))
    val weights = docs.groupBy("lang").agg(count(lit(1)).as("n_rows"))
      .withColumn("w", floor(sqrt(col("n_rows"))).cast("long"))
    val total = weights.agg(sum(col("w")).as("tw"))
    val targets = weights.crossJoin(broadcast(total))
      .withColumn("target",
        least(col("n_rows"), expr(s"w * $budget div tw")))
      .withColumn("bound",
        least(lit(hRange), lit(8L) * col("target") * lit(hRange) / col("n_rows") + lit(1L)))
      .select("lang", "n_rows", "target", "bound")
    val cand = docs.join(broadcast(targets), Seq("lang"))
      .filter(col("hv") < col("bound"))
    // bounds-anchored like sampleReservoir's probe: a zero-candidate
    // stratum must register as deficient, not vanish from the groupBy
    val deficient = targets.join(
        cand.groupBy("lang").agg(count(lit(1)).as("got")), Seq("lang"), "left")
      .filter(coalesce(col("got"), lit(0L)) < col("target"))
      .count()
    require(deficient == 0L,
      s"temperature candidate bound under-captured $deficient strata")
    val w = Window.partitionBy("lang").orderBy(col("hv"), col("doc_id"))
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= col("target"))
      .select("lang", "rank", "doc_id")
      .orderBy("lang", "rank")
  }

  /** Default per-source [[samplePps]] target — the oracle interpolates
    * THIS constant, so gate and SQL cannot desynchronize. */
  val PpsDefaultTarget = 60

  /** SYSTEMATIC PPS (probability-proportional-to-size) sampling: select
    * ~`target` docs per source with inclusion probability proportional
    * to TOKEN COUNT — the weighted document sampler a data-mixing
    * pipeline uses when long documents should be proportionally more
    * likely to be drawn (the token_budget ops CAP admission; this
    * SAMPLES). Classic survey-statistics systematic selection on the
    * doc_id-ordered cumulative token axis: doc i is selected iff its
    * interval (cum−n, cum] contains a selection point — equivalently
    * `cum·target div T > (cum−n)·target div T` — ALL integer
    * arithmetic (cum ≤ T ~ 10^12 tokens at 100 TB per source ×
    * target 10^3 stays inside BIGINT), so DuckDB reproduces every
    * selection bit-for-bit. Docs holding ≥ T/target tokens are
    * selected with certainty — standard PPS behavior, spec-pinned.
    *
    * Scale shape: ONE per-source window cumsum (hash exchange on
    * source + per-partition sort — the token_budget family's shape)
    * plus a broadcast 1-row-per-source total. */
  def samplePps(s: SparkSession, dir: String,
      target: Int = PpsDefaultTarget): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val totals = docs.groupBy("source").agg(sum(col("n_tokens")).as("t"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .join(broadcast(totals), Seq("source"))
      .filter(expr(s"(cum * $target) div t > ((cum - n_tokens) * $target) div t"))
      .select("source", "doc_id", "n_tokens")
      .orderBy("source", "doc_id")
  }

  /** Synthetic "benchmark" (eval-set) items: the first 8 tokens of every
    * 13th document — guaranteed contamination sources at every SF, with
    * the oracle constructing the identical set in SQL. `bench_id` is the
    * source doc's own id (the benchmark never unions with the corpus, so
    * no offset is needed; keep the id so callers can report WHICH item
    * collided). */
  def benchmarkItems(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") % 13 === 0)
      .select(col("doc_id").as("bench_id"),
        concat_ws(" ", slice(tokens(col("text")), 1, 8)).as("text"))

  /** Train/eval DECONTAMINATION — the overlap check every serious
    * training pipeline runs before the benchmark suite does: a corpus
    * document is quarantined when it shares ≥ `minOverlap` distinct word
    * 3-shingles with ANY benchmark item (the GPT-3/Pile-style n-gram
    * collision rule). Returns every document with its overlap count and
    * a keep/quarantine action.
    *
    * Scale shape: the benchmark shingle set is tiny (eval suites are
    * thousands of items) and BROADCASTS; the corpus side never shuffles
    * its text — only the matched (doc_id, shingle) rows reach the
    * per-document count, and the final left join redistributes ids, not
    * documents. A 100 TB corpus decontaminates at scan speed. */
  def decontaminate(
      s: SparkSession, dir: String, minOverlap: Int = 4): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val docSh = withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val benchSh = withShingles(
        benchmarkItems(s, dir).select(col("bench_id").as("doc_id"), col("text")))
      .select(explode(col("shingles")).as("sh"))
      .distinct()
    val overlaps = docSh
      .join(broadcast(benchSh), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap")) // doc shingles distinct ⇒ count = distinct overlap
    docs.select("doc_id")
      .join(overlaps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("action",
        when(col("n_overlap") >= minOverlap, "quarantine").otherwise("keep"))
      .orderBy("doc_id")
  }

  /** Boilerplate thresholds for [[textBoilerplate]]: a 3-shingle in
    * ≥ max(`BoilerplateDocFreq`, 1% of the corpus) DISTINCT documents
    * is corpus boilerplate (nav bars, licence blurbs, templated
    * headers) — the RELATIVE form keeps the rule meaningful as the
    * corpus grows (a fixed absolute df marks ordinary vocabulary as
    * boilerplate at 10× the documents); a document whose boilerplate
    * fraction reaches `BoilerplatePpm` is flagged — the C4-style
    * cross-document repetition filter, complementing
    * `quality_repetition`'s INTRA-document rule. */
  val BoilerplateDocFreq = 5L
  val BoilerplatePpm = 300000L

  /** CROSS-DOCUMENT BOILERPLATE detection: global document frequency of
    * every distinct word 3-shingle, then per document the fraction of
    * its shingles that are corpus-hot, as exact integer ppm.
    *
    * Scale shape: ONE shingle explode feeds both the document-frequency
    * aggregate and the per-doc hot count; both shuffles key on the
    * shingle, so the exchange is reused, and the hot-set semi join is
    * a same-key partitioned join (no broadcast assumption — the hot
    * set is data-dependent). Per-doc totals come from the same
    * exploded frame (shingles are per-doc distinct); documents
    * themselves never shuffle, only (doc_id, shingle) rows. */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val dsh = withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .localCheckpoint() // consumed 3× (df agg, hot probe, totals)
    // corpus-relative hot threshold: a parquet count() is
    // metadata-speed, and the 1-row value folds into the filter
    val hotDf = math.max(BoilerplateDocFreq, docs.count() / 100L)
    val hot = dsh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= hotDf)
      .select("sh")
    val totals = dsh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val nHot = dsh.join(hot, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    docs.select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(nHot, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot"))
      .select(col("doc_id"), col("n_shingles"), col("n_hot"),
        expr(s"CASE WHEN n_shingles = 0 THEN CAST(0 AS BIGINT) " +
          s"ELSE (n_hot * 1000000) div n_shingles END").as("boiler_ppm"))
      .withColumn("action",
        when(col("boiler_ppm") >= BoilerplatePpm, "flag").otherwise("keep"))
      .orderBy("doc_id")
  }

  /** Bloom geometry for [[decontaminateBloom]]: m = 2^20 positions,
    * k = 3 probes via Kirsch–Mitzenmacher double hashing
    * (pos_i = (h32 + i·h32b) mod m) — both 32-bit halves of one md5, so
    * the DuckDB oracle replicates every position (and therefore every
    * false positive) bit-for-bit. */
  val BloomMBits = 20
  val BloomM: Int = 1 << BloomMBits
  val BloomK = 3

  /** (item, exploded position) rows of a shingle column under the
    * double-hashing scheme. h1/h2 are hoisted behind a projection so the
    * k-way array references bound attributes, not k·2 md5 calls
    * (SCALE.md §Round-10 CSE-hoisting rule). */
  private[graft] def bloomPositions(
      df: DataFrame, keep: Seq[String], sh: String, m: Int, k: Int): DataFrame =
    df
      .select(keep.map(col) ++ Seq(
        h32(col(sh)).as("bl_h1"), h32b(col(sh)).as("bl_h2")): _*)
      .select(keep.map(col) :+ explode(array((0 until k).map(i =>
        pmod(col("bl_h1") + lit(i.toLong) * col("bl_h2"), lit(m.toLong))): _*)).as("pos"): _*)

  /** APPROXIMATE decontamination behind a Bloom filter of the benchmark
    * shingle set — the scale path when the eval suite outgrows an exact
    * broadcast: the filter is the distinct-position set, bounded by
    * min(k·|bench shingles|, m) rows ≈ m/8 bytes as bits (2^20 positions
    * ≈ 4 MB as a row set here, 128 KB as a bitmap) no matter how many
    * benchmark items exist. One-sided error: a shingle whose k positions
    * are all set MAY be a false positive, so `n_bloom ≥ n_exact` always
    * — quarantine-by-bloom never misses true contamination, it only
    * over-quarantines by the FP rate (≈ (k·n/m)^k). The exact count
    * rides along for gate fidelity; a production run drops it (it IS the
    * broadcast the bloom replaces). Forced-FP regime pinned in
    * BloomDecontaminationSpec. */
  def decontaminateBloom(
      s: SparkSession, dir: String, minOverlap: Int = 4,
      m: Int = BloomM, k: Int = BloomK): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val docSh = withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val benchSh = withShingles(
        benchmarkItems(s, dir).select(col("bench_id").as("doc_id"), col("text")))
      .select(explode(col("shingles")).as("sh"))
      .distinct()
    val benchPos = bloomPositions(benchSh, Seq.empty, "sh", m, k)
      .select("pos").distinct()
    // a (doc, shingle) is a bloom hit iff ALL k exploded positions match
    // (duplicate positions within one shingle's probe set match
    // consistently, exactly as duplicate probes of one bit would)
    val bloom = bloomPositions(docSh, Seq("doc_id", "sh"), "sh", m, k)
      .join(broadcast(benchPos), Seq("pos"))
      .groupBy("doc_id", "sh")
      .agg(count(lit(1)).as("k_hit"))
      .filter(col("k_hit") === k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bloom"))
    val exact = docSh
      .join(broadcast(benchSh), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_exact"))
    docs.select("doc_id")
      .join(bloom, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bloom"), lit(0L)).as("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .withColumn("action",
        when(col("n_bloom") >= minOverlap, "quarantine").otherwise("keep"))
      .orderBy("doc_id")
  }

  /** PRODUCTION-FORM Bloom decontamination: the position SET of
    * [[decontaminateBloom]] collapsed to an m-BIT BITMAP (128 KB at
    * m = 2^20) via [[expressions.BloomBitmapAgg]], membership via the
    * codegen'd [[expressions.BloomBitTest]] — so the corpus side runs the
    * k probes as a scalar predicate inside its scan: NO position explode,
    * NO membership join, NO shuffle of (doc, shingle, pos) rows at all.
    * The only exchanges left are the benchmark-side bitmap build (k·|
    * bench shingles| rows folding into one 128 KB value, map-side
    * combined) and the per-document hit count.
    *
    * Decision parity: positions are the same deterministic
    * Kirsch–Mitzenmacher probes, set bits are the same set, and the
    * all-k-hit rule is the same — so n_bloom (and every false positive)
    * is BIT-IDENTICAL to the set form's; the differential spec pins it
    * and the gate shares `decontaminate_bloom`'s DuckDB oracle. The
    * exact count rides along for gate fidelity exactly as in the set
    * form; production drops it. */
  /** The benchmark suite's m-bit Bloom bitmap, collected to the driver
    * for embedding as a plan literal — bounded at exactly m/8 bytes
    * (128 KB) by geometry, not data, the same bounded-collect class as
    * the ANN codebooks. Built once per (suite, geometry); a production
    * pipeline persists these bytes and ships them to every consumer —
    * including streaming ones ([[graft.streaming.StreamingDecontamination]]),
    * where the probe being a pure per-row expression is what makes the
    * stage stateless. */
  def benchmarkBitmap(
      s: SparkSession, dir: String, m: Int = BloomM, k: Int = BloomK): Array[Byte] = {
    import graft.functions.expressions.BloomBitmapAgg
    val benchSh = withShingles(
        benchmarkItems(s, dir).select(col("bench_id").as("doc_id"), col("text")))
      .select(explode(col("shingles")).as("sh"))
      .distinct()
    bloomPositions(benchSh, Seq.empty, "sh", m, k)
      .agg(BloomBitmapAgg(col("pos"), m).as("bm"))
      .collect()(0).getAs[Array[Byte]]("bm")
  }

  /** Per-document Bloom overlap as ONE per-row expression: counts the
    * document's distinct shingles whose k bloom bits are all set, via a
    * higher-order `filter` over the shingle array — no explode, no
    * groupBy, NO shuffle at all, which also makes it streaming-safe
    * (stateless). Value-identical to the explode+groupBy formulation
    * (the array is distinct); spec-pinned against the gate form. */
  def bloomOverlapCount(
      text: org.apache.spark.sql.Column, bmBytes: Array[Byte],
      m: Int = BloomM, k: Int = BloomK): org.apache.spark.sql.Column = {
    import graft.functions.expressions.BloomBitTest
    val sh = array_distinct(shingles3(tokens(text)))
    size(filter(sh, x => (0 until k).map(i => BloomBitTest(lit(bmBytes),
      pmod(h32(x) + lit(i.toLong) * h32b(x), lit(m.toLong)))).reduce(_ && _)))
      .cast("long")
  }

  def decontaminateBloomBitmap(
      s: SparkSession, dir: String, minOverlap: Int = 4,
      m: Int = BloomM, k: Int = BloomK): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val docSh = withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val benchSh = withShingles(
        benchmarkItems(s, dir).select(col("bench_id").as("doc_id"), col("text")))
      .select(explode(col("shingles")).as("sh"))
      .distinct()
    import graft.functions.expressions.BloomBitTest
    // the bitmap embeds as a plan LITERAL — a 1-row broadcast cross
    // join was tried first and benched 3.4× SLOWER than the set form:
    // the join's output rows carry the 128 KB bm column, so every hit
    // materializes a 128 KB UnsafeRow copy. As a literal the bit test
    // runs inside the scan's codegen span — no join, no copy.
    val bmBytes = benchmarkBitmap(s, dir, m, k)
    // hit iff ALL k probe bits are set — a pure scalar predicate over
    // (h1, h2), evaluated at scan speed
    val bloom = docSh
      .select(col("doc_id"), h32(col("sh")).as("bl_h1"), h32b(col("sh")).as("bl_h2"))
      .filter((0 until k).map(i => BloomBitTest(lit(bmBytes),
        pmod(col("bl_h1") + lit(i.toLong) * col("bl_h2"), lit(m.toLong)))).reduce(_ && _))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bloom"))
    val exact = docSh
      .join(broadcast(benchSh), "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_exact"))
    docs.select("doc_id")
      .join(bloom, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bloom"), lit(0L)).as("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
      .withColumn("action",
        when(col("n_bloom") >= minOverlap, "quarantine").otherwise("keep"))
      .orderBy("doc_id")
  }

  /** SimHash-64 signatures as (hi, lo) 32-bit halves: per bit, majority
    * vote of the shingle hashes' bits (h32 for the low half, h32b for the
    * high half); ties vote 0. Pure per-row expression (SimHash64): the
    * signature depends only on the document's own shingles, so there is
    * no explode, no aggregation, and no shuffle at all — a 100 TB corpus
    * sketches at scan speed (the DuckDB oracle keeps the explode
    * formulation; results are identical). */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.SimHash64
    withShingles(Tables.documents(s, dir).select("doc_id", "text"))
      .select(col("doc_id"), SimHash64(col("shingles")).as("sh"))
      .select(col("doc_id"), col("sh.simhash_hi").as("simhash_hi"), col("sh.simhash_lo").as("simhash_lo"))
      .orderBy("doc_id")
  }

  /** Line unit for [[dedupLines]]: fixed-width chunks of this many
    * whitespace tokens (the synthetic corpus has no sentence
    * punctuation, so "lines" are word windows rather than `\n` splits —
    * same operator shape either way). */
  val LineChunk = 8

  /** Planted-duplicate id offset for the line-dedup corpus. Smaller than
    * [[ExactDupOffset]] on purpose: winner slots pack `(doc_id << 20) |
    * pos`, so doc_id must stay below 2^43 — fine for any corpus the
    * gates run (and for ~10^12-document corpora), and the packing stays
    * exact integer math in both engines (no double rounding). */
  val LineDupOffset = 1000000000L

  /** Shared header planted on every document so the corpus has real
    * cross-document repeated lines — the boilerplate that line-level
    * dedup exists to strip (exactly [[LineChunk]] tokens, so it occupies
    * chunk 0 of every document and shifts the original text by whole
    * chunks). */
  val BoilerplateLine =
    "graft boilerplate header line repeated across all documents"

  /** LINE-LEVEL exact dedup (CCNet/RefinedWeb-style): split every
    * document into fixed-width word lines, keep each distinct line only
    * at its first occurrence corpus-wide (smallest `(doc_id, pos)`), and
    * reassemble the surviving lines per document in original order.
    * Boilerplate shared across documents — here a planted header on
    * every doc, plus full copies of every 10th doc — survives exactly
    * once (in the lowest-id document) and is stripped everywhere else;
    * full duplicates lose every line and drop out of the corpus.
    *
    * Scale shape: two linear hash shuffles, both with map-side partial
    * aggregation — (1) groupBy(line) computing the min packed slot
    * (the corpus-wide hot line, the boilerplate itself, reduces to one
    * partial per map task before the exchange — the combiner absorbs
    * the skew); (2) groupBy(doc_id) reassembling surviving lines. Line
    * text crosses the wire once, which is irreducible because the
    * output reconstructs text. No join anywhere: the winner IS the
    * surviving row, so keep/drop needs no second pass over the corpus. */
  def dedupLines(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val corpus = d.unionByName(
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + LineDupOffset).as("doc_id"), col("text")))
      .select(col("doc_id"),
        concat(lit(BoilerplateLine + " "), col("text")).as("text"))
    dedupLinesOf(corpus)
  }

  /** [[dedupLines]] core over any (doc_id, text) frame — fuzzable and
    * reusable on an arbitrary corpus. Text is trimmed before tokenizing
    * (Spark's `split` keeps leading/trailing empty tokens that a plain
    * Java `String.split` drops — trimming pins one semantics) and
    * all-whitespace documents chunk to nothing. A document longer than
    * 2^20 lines would corrupt the packed winner slot silently, so the
    * pos bound is ENFORCED with a runtime error, not just documented. */
  def dedupLinesOf(corpus: DataFrame): DataFrame = {
    val lines = corpus
      // filter-empty instead of trim: SQL trim strips SPACES only, so a
      // leading tab/newline would smuggle an empty token into the first
      // chunk; dropping empty tokens handles every whitespace edge the
      // same way in both engines (fuzz-pinned with tab/newline edges)
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => t =!= "").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ceil(size(col("toks")) / lit(LineChunk.toDouble)).cast("int") - 1),
          i => array_join(slice(col("toks"), i * LineChunk + 1, lit(LineChunk)), " ")))
          .as(Seq("pos", "line")))
      .filter(length(col("line")) > 0)
    val slot = when(col("pos") < lit(1L << 20),
        shiftleft(col("doc_id"), 20) + col("pos"))
      .otherwise(raise_error(concat(lit("dedupLines: document "), col("doc_id"),
        lit(" exceeds 2^20 lines — packed slot would corrupt"))).cast("long"))
    val winners = lines
      .groupBy(col("line"))
      .agg(min(slot).as("win"))
    winners
      .select(shiftright(col("win"), 20).as("doc_id"),
        col("win").bitwiseAND(lit((1L << 20) - 1)).as("pos"),
        col("line"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), " ").as("text_dedup"))
      .select(col("doc_id"), col("n_kept"), col("text_dedup"))
      .orderBy("doc_id")
  }

  /** Substring-level duplicate detection (the span-dedup technique of the
    * training-data literature: repeated n-token spans across the corpus,
    * not whole-document similarity): for every document, how many of its
    * 8-token spans also occur elsewhere — first occurrence canonical,
    * everything later is a duplicate span. Output per doc: span count,
    * duplicated-span count, and the duplicated fraction (the usual
    * filter/trim signal).
    *
    * Scale shape (100 TB): occurrences never join raw text — each span is
    * a 16-byte md5 pair `(h1,h2)` plus a PACKED slot
    * `doc_id*2^posBits + pos` (guarded: pos < 2^posBits, doc_id <
    * 2^(63-posBits)). The long packing keeps the winner aggregation a
    * plain HashAggregate with map-side partial_min — a struct-valued min
    * would force sort-based aggregation. The bit split is a parameter
    * because the two budgets trade off: the PRODUCTION default posBits=23
    * covers ~8.4M tokens per document and a trillion doc ids (ADVICE r6
    * widened this from the original 128-position budget, which capped
    * documents at ~135 tokens); the GATE invocation passes
    * [[SpanGatePosBits]] because the planted-copy corpus offsets ids by
    * +2·10^15 (needs 51 doc-id bits) while its documents stay short.
    * Exactly ONE occurrence per span group is
    * canonical, so `n_dup(doc) = n_spans(doc) −
    * #winner slots owned by doc`: one span→min(slot) aggregation (the
    * map-side partial_min absorbs corpus-wide hot boilerplate spans
    * before the shuffle — same discipline as [[dedupLines]]), winner
    * slots decode straight back to `doc_id = slot >> posBits`, and the
    * final
    * join is per-DOC pre-aggregated rows on both sides. The span
    * explosion runs ONCE (`n_spans` comes from token-count arithmetic on
    * the un-exploded corpus, not a second explosion) and no span-keyed
    * join-back exists to outgrow a broadcast. (A first cut aggregated
    * (span, doc) pairs and joined winners back on the span key: Catalyst
    * column-pruning made the two aggregation branches non-identical so
    * ReuseExchange could not dedupe them — the corpus exploded TWICE —
    * and the join-back was a span-keyed hash join that stops
    * broadcasting at scale. The winner-ownership form needs neither.) */
  /** Gate-corpus bit split for [[dedupSpans]]: the planted-copy ids
    * (+2·10^15) need 51 doc-id bits, leaving 2^12 = 4096 positions —
    * ample for the short synthetic docs. Mirrored in the DuckDB oracle's
    * `doc_id * 4096 + pos` slot expression. */
  val SpanGatePosBits = 12

  def dedupSpans(s: SparkSession, dir: String, n: Int = 8,
      posBits: Int = 23): DataFrame =
    dedupSpansOf(corpusWithNearDupes(s, dir), n, posBits)

  /** [[dedupSpans]] core over any (doc_id, text) frame — the seam that
    * lets specs exercise the PRODUCTION posBits=23 packing on documents
    * longer than the gate corpus's (multi-thousand-token docs whose span
    * positions overflow the gate's 2^12 budget). */
  def dedupSpansOf(corpus: DataFrame, n: Int = 8,
      posBits: Int = 23): DataFrame = {
    import graft.functions.expressions.WordNgrams
    val spanCounts = corpus.select(col("doc_id"),
      greatest(size(tokens(col("text"))) - (n - 1), lit(1)).cast("long").as("n_spans"))
    val posCap = 1L << posBits
    val docCap = 1L << (63 - posBits)
    val occ = corpus
      .select(col("doc_id"), posexplode(WordNgrams(tokens(col("text")), n)).as(Seq("pos", "span")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        h32(col("span")).as("h1"), h32b(col("span")).as("h2"))
      // slot packing is exact only inside the (posBits, 63-posBits) budget
      .withColumn("pos",
        when(col("pos") < posCap && col("doc_id") < docCap, col("pos"))
          .otherwise(raise_error(concat(lit("dedup_spans slot overflow: doc "),
            col("doc_id").cast("string")))))
    val owned = occ
      .groupBy("h1", "h2")
      .agg(min(col("doc_id") * posCap + col("pos")).as("w"))
      .groupBy(shiftright(col("w"), posBits).as("doc_id"))
      .agg(count(lit(1)).as("n_canon"))
    spanCounts.join(owned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        (col("n_spans") - coalesce(col("n_canon"), lit(0L))).as("n_dup"))
      .select(col("doc_id"), col("n_spans"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_spans").cast("double"), 6)
          .as("dup_frac"))
      .orderBy("doc_id")
  }
}
