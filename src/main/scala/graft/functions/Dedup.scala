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
  val P31: Long = 2147483647L
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

  /** MinHash signatures: per (doc, permutation j) the min over shingles of
    * (a_j·h32(s) + b_j) mod p, with a_j = 2j+1, b_j = 1000003·j + 12345. */
  private def minhashSigs(sh: DataFrame): DataFrame =
    sh.withColumn("h", h32(col("s")))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(MinhashPerms - 1))).as("j"))
      .groupBy("doc_id", "j")
      .agg(min(
        pmod((lit(2L) * col("j") + 1L) * col("h") + lit(1000003L) * col("j") + 12345L,
          lit(P31))).as("m"))

  /** LSH band buckets: 16 bands of 4 rows; the band hash is a positional
    * weighted sum (commutative, so partial aggregation is safe). */
  def minhashBands(s: SparkSession, dir: String): DataFrame =
    minhashSigs(shingleSet(corpusWithNearDupes(s, dir)))
      .withColumn("band", expr(s"j div $BandRows"))
      .withColumn("coef",
        expr("CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END"))
      .groupBy("doc_id", "band")
      .agg(sum(col("m") * col("coef")).as("band_hash"))
      .orderBy("doc_id", "band")

  /** Full MinHash-LSH near-dup pipeline: banded candidate pairs, verified
    * by true shingle Jaccard ≥ threshold. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleSet(corpusWithNearDupes(s, dir)).cache()
    val bands = minhashSigs(sh)
      .withColumn("band", expr(s"j div $BandRows"))
      .withColumn("coef",
        expr("CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END"))
      .groupBy("doc_id", "band")
      .agg(sum(col("m") * col("coef")).as("band_hash"))
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
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash-64 signatures as (hi, lo) 32-bit halves: per bit, majority
    * vote of the shingle hashes' bits (h32 for the low half, h32b for the
    * high half); ties vote 0. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleSet(Tables.documents(s, dir).select("doc_id", "text"))
      .withColumn("h1", h32(col("s")))
      .withColumn("h2", h32b(col("s")))
    val bits = sh
      .select(col("doc_id"), col("h1"), col("h2"), explode(sequence(lit(0), lit(31))).as("j"))
      .groupBy("doc_id", "j")
      .agg(
        sum(expr("CASE WHEN (h1 div CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END")).as("v1"),
        sum(expr("CASE WHEN (h2 div CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END")).as("v2"))
    bits
      .groupBy("doc_id")
      .agg(
        sum(expr("CASE WHEN v1 > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END")).as("simhash_lo"),
        sum(expr("CASE WHEN v2 > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END")).as("simhash_hi"))
      .orderBy("doc_id")
  }
}
