package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Text-analysis operators for a training-data pipeline (builder mandate;
  * SURVEY §7.4): language ID, quality scoring, token counting, document
  * fingerprinting. All are pure Catalyst expression pipelines (codegen'd,
  * no UDFs) over the `documents` table, shuffle-free per-row transforms —
  * at 100 TB these run scan-speed with full column pruning.
  *
  * Cross-engine rules: counts/lengths are exact BIGINTs; ratios are IEEE
  * divisions of those exact ints in a fixed operation order, so DuckDB
  * reproduces them bit-for-bit.
  */
object TextAnalysis {

  /** Stopword markers per language for the n-gram/stopword language-ID
    * heuristic. Tie-break order is the Map/CASE order: en,de,fr,es,zh. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "que", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "en", "que", "una"),
    "zh" -> Seq("的", "是", "不", "我", "了", "在"))

  private val enStop = langMarkers.head._2

  private def hitCount(toks: Column, words: Seq[String]): Column =
    expressions.MarkerHits(toks, words)

  /** [[textStats]] over ANY frame with (doc_id, text) — stateless
    * per-row transforms, so the live quality monitor
    * ([[graft.streaming.StreamingQuality]]) applies the IDENTICAL
    * expressions to a stream; `keep` columns pass through. */
  private[graft] def textStatsOf(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    // tokens projected ONCE: the MarkerHits consumer is CodegenFallback,
    // so inlining tokens(text) into both size() and hitCount would run
    // the regex split twice per row (CollapseProject keeps a separate
    // projection for non-cheap expressions used more than once)
    docs
      .select(Seq(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        ++ keep.map(col): _*)
      .select(Seq(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        // BPE-ish regex token count: letter runs, digit runs, single punct
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
          .as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast("long").as("n_alpha"),
        hitCount(col("toks"), enStop).as("n_stopwords"))
        ++ keep.map(col): _*)
      .withColumn("avg_token_len",
        round(col("n_chars").cast("double") / col("n_tokens"), 6))
      .withColumn("stopword_ratio",
        round(col("n_stopwords").cast("double") / col("n_tokens"), 6))
      .withColumn("alpha_ratio",
        round(col("n_alpha").cast("double") / col("n_chars"), 6))
      // simple composite quality score in a fixed operation order
      .withColumn("quality_score",
        round(
          col("n_alpha").cast("double") / col("n_chars")
            + col("n_stopwords").cast("double") / col("n_tokens"), 6))
  }

  /** token + quality stats per document: exact counts and deterministic
    * ratio columns. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    textStatsOf(Tables.documents(s, dir)).orderBy("doc_id")

  /** Language ID by stopword-marker hits with fixed tie-break precedence.
    * (The synthetic corpus is English-ish word soup; the operator is the
    * deliverable, and the oracle runs the identical heuristic.) */
  /** Per-language hit columns over a projected `toks` column — one
    * `h_<lang>` per marker set (project these BEFORE consuming them:
    * MarkerHits is CodegenFallback, so inlining a hit count into a
    * multi-reference CASE would re-run it per reference). */
  private[graft] def langHitCols(df: DataFrame): DataFrame =
    langMarkers.foldLeft(df) {
      case (d, (lang, words)) => d.withColumn(s"h_$lang", hitCount(col("toks"), words))
    }

  /** Detected-language CASE over already-projected `h_<lang>` columns —
    * argmax with precedence = declaration order. */
  private[graft] def detectedLangCol: Column = {
    val langs = langMarkers.map(_._1)
    langs.init.foldRight(lit(langs.last): Column) { (lang, rest) =>
      val ge = langs.filter(_ != lang)
        .map(o => col(s"h_$lang") >= col(s"h_$o"))
        .reduce(_ && _)
      when(ge, lit(lang)).otherwise(rest)
    }
  }

  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val withHits = langHitCols(
      Tables.documents(s, dir).select(col("doc_id"), col("lang").as("labeled_lang"), toks.as("toks")))
    val langs = langMarkers.map(_._1)
    val detected = detectedLangCol
    withHits
      .select(
        col("doc_id"), col("labeled_lang"),
        langs.map(l => col(s"h_$l")).reduce(_ + _).as("n_marker_hits"),
        detected.as("detected_lang"))
      .orderBy("doc_id")
  }

  /** Most-distinctive (lowest document-frequency) token per document —
    * rare-term extraction, the inverted-index shape: explode distinct
    * tokens, global df aggregation, join back, per-doc argmin with a
    * deterministic (df, token) tiebreak. Three shuffles: the df groupBy
    * and the join both hash on `tok` (Catalyst reuses that exchange), and
    * the per-doc argmin window re-hashes on `doc_id`; at 100 TB this is
    * the classic posting-list build. */
  def rareTerm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
    val df = toks.groupBy("tok").agg(count(lit(1)).as("doc_freq"))
    val w = Window.partitionBy("doc_id").orderBy("doc_freq", "tok")
    toks.join(df, "tok")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("rare_term"), col("doc_freq"))
      .orderBy("doc_id")
  }

  /** LM-quality proxy with EXACT cross-engine arithmetic: the mean
    * log2-frequency-class of a document's tokens over the corpus
    * unigram vocabulary (the CCNet/perplexity-bucket idea — natural
    * prose is built from frequent words, noise from rare ones — without
    * an external LM). `fc = floor(log2(corpus count))` is computed as
    * `length(bin(cnt)) - 1`: a pure INTEGER log2 both engines evaluate
    * identically, where a float `log()` differs between libm
    * implementations in the last ulp and can flip a rounded hash.
    * The mean is `sum(fc)/count` over exact integers (< 2^53) so the
    * double division is bit-identical too.
    *
    * Scale shape: the vocabulary is one combiner-absorbed groupBy on
    * `tok` (hot tokens collapse map-side); the scoring join is
    * token-keyed with AQE skew handling. At 100 TB the vocabulary is
    * built once, truncated to a top-K head + default tail class, and
    * BROADCAST (like bm25's corpus stats) instead of re-derived inline —
    * that form is [[freqClassQualityHead]]; the inline self-join here is
    * the stateless exact-oracle gate. */
  def freqClassQuality(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val vocab = occ.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(col("tok"), (length(bin(col("cnt"))) - 1).cast("long").as("fc"))
    occ.join(vocab, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("fc")).cast("double") / count(lit(1)), 6).as("fc_mean"))
      .orderBy("doc_id")
  }

  /** Head size for the [[freqClassQualityHead]] gate: below the ~31-token
    * corpus vocabulary, so the gate exercises BOTH the head lookup and
    * the default tail class. */
  val FreqClassHeadK = 16

  /** Default class for tokens outside the head: the rarest class
    * (floor(log2 1) = 0) — by Zipf, tail tokens are the low-count ones. */
  val FreqClassTailFc = 0L

  /** The 100-TB form of [[freqClassQuality]] (VERDICT r6 item 8,
    * promoted from that gate's scaladoc): the vocabulary is truncated to
    * its top-[[FreqClassHeadK]] tokens by corpus frequency (ties to the
    * token — deterministic cross-engine), the head's frequency classes
    * ride to every executor as a MAP LITERAL (k entries — the bm25
    * corpus-stats discipline), and every non-head token scores the
    * default tail class [[FreqClassTailFc]]. Scoring is then a
    * scan-speed per-row lookup: NO token-keyed join, no skew exposure,
    * one combiner-absorbed vocabulary pass + a TakeOrdered(k) to build
    * the head. By Zipf the head covers most occurrences, and tail
    * misclassification is bounded by the head boundary's class — the
    * standard vocabulary-truncation trade every tokenizer makes. Exact
    * agreement with [[freqClassQuality]] when the head covers the whole
    * vocabulary is spec-pinned; the headK < vocab regime is gated
    * against a full DuckDB mirror (the truncation is SQL-expressible —
    * unlike the trained codebooks, nothing here is JVM-private). */
  def freqClassQualityHead(s: SparkSession, dir: String,
      headK: Int = FreqClassHeadK): DataFrame = {
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    // bounded driver-side collect: headK rows (the broadcast head)
    val head = occ.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(headK)
      .select(col("tok"), (length(bin(col("cnt"))) - 1).cast("long").as("fc"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val fcOf = coalesce(
      element_at(
        map(head.sortBy(_._1)
          .flatMap { case (t, fc) => Seq(lit(t), lit(fc)) }.toIndexedSeq: _*),
        col("tok")),
      lit(FreqClassTailFc))
    occ.select(col("doc_id"), fcOf.as("fc"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("fc")).cast("double") / count(lit(1)), 6).as("fc_mean"))
      .orderBy("doc_id")
  }

  /** Bigram-LM quality score — the CCNet perplexity-bucket idea one
    * order up from [[freqClassQuality]]: per document, the mean integer
    * log2-conditional-probability class of its token bigrams over the
    * self-trained corpus bigram model. Per bigram the score is
    * fc2 − fc1 ≈ log2 P(w2|w1) ≤ 0, where fc2 = floor(log2 c(w1,w2)),
    * fc1 = floor(log2 c(w1·)) and c(w1·) = Σ_w2 c(w1,w2) (occurrences
    * of w1 as a bigram head — derived from the model, never a second
    * corpus scan). Both are the pure INTEGER log2
    * `length(bin(cnt)) − 1` (the [[freqClassQuality]] recipe), so the
    * whole trained model is hash-exact cross-engine where a float LM
    * never is. Natural prose rides the corpus's common transitions
    * (mean near 0); shuffled or noisy text pairs frequent heads with
    * rare tails (strongly negative).
    *
    * Scale shape (100 TB): the model is one combiner-absorbed groupBy
    * on (w1, w2) — hot transitions collapse map-side; head counts are
    * a second small aggregate OVER THE MODEL (|bigram vocab| rows, not
    * corpus rows); scoring joins are bigram-keyed with AQE skew
    * handling. The production serving form truncates the model to a
    * top-K head broadcast as a map literal with a default tail class —
    * exactly [[freqClassQualityHead]]'s discipline (that gate already
    * pins the truncation machinery; this gate is the exact inline
    * model). Docs with < 2 tokens have no bigrams and are excluded
    * (mirrored in the oracle's len(toks) >= 2 filter). */
  def lmBigram(s: SparkSession, dir: String): DataFrame =
    lmBigramScored(s, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6).as("lp_mean"))
      .orderBy("doc_id")

  /** Per-occurrence bigram frame (doc_id, source, bg) — the ONE
    * construction of document bigrams, shared by the gate, the model
    * frames, and the live monitor's pin frame. `bg` = "w1 w2" via the
    * NATIVE [[expressions.WordNgrams]] (the WordShingles lesson: the
    * zip_with/struct HOF formulation is interpreted and was measured
    * at ~30 s for the ×10 scale corpus vs seconds native — three
    * Generate subtrees each paying the lambda interpreter). Tokens are
    * whitespace-split so they contain no spaces, making bg ↔ (w1, w2)
    * bijective — the oracle keys on the pair, Spark on the string,
    * and the grouped counts agree exactly. */
  private def lmBigramOcc(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(Portable.shinglesN(col("toks"), 2)).as("bg"))

  /** The trained model frames: (w1, w2, fc2) per bigram and (w1, fc1)
    * per head — what [[graft.artifacts.Artifacts.saveLmBigram]]
    * persists for the live monitor to freeze. The head key is
    * substring_index(bg, ' ', 1) — codegen'd, and exact because
    * whitespace tokens carry no spaces. */
  private[graft] def lmModelFrames(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // localCheckpoint: the model is |bigram vocab| rows (~1k at sf0.1);
    // without it BOTH consumers (f2 and the f1 rollup) re-explode the
    // corpus — a third full Generate subtree for a vocab-sized frame
    val c2 = lmBigramOcc(s, dir)
      .groupBy("bg").agg(count(lit(1)).as("cnt2"))
      .select(col("bg"),
        substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"),
        col("cnt2"))
      .localCheckpoint()
    val c1 = c2.groupBy("w1").agg(sum("cnt2").as("cnt1"))
    (c2.select(col("bg"), col("w1"), col("w2"), col("cnt2"),
        (length(bin(col("cnt2"))) - 1).cast("long").as("fc2")),
      c1.select(col("w1"), col("cnt1"),
        (length(bin(col("cnt1"))) - 1).cast("long").as("fc1")))
  }

  /** Per-occurrence SCORED frame (doc_id, source, lp). */
  private[graft] def lmBigramScored(s: SparkSession, dir: String): DataFrame = {
    val (f2, f1) = lmModelFrames(s, dir)
    lmBigramOcc(s, dir)
      .join(f2.select("bg", "w1", "fc2"), Seq("bg"))
      .join(f1, Seq("w1"))
      .select(col("doc_id"), col("source"),
        (col("fc2") - col("fc1")).as("lp"))
  }

  /** Head sizes for [[lmBigramHead]]: 256 bigrams (corpus bigram vocab
    * is ~931 at sf0.01, so the gate exercises BOTH the head lookup and
    * the tail default) and 16 heads (w1 vocab ~31 — same property). */
  val LmHeadK2 = 256
  val LmHeadK1 = 16

  /** The 100-TB serving form of [[lmBigram]] — the
    * [[freqClassQualityHead]] discipline applied to the bigram model:
    * the trained model truncates to its top-[[LmHeadK2]] bigrams by
    * count (ties to the bigram string — deterministic cross-engine)
    * and top-[[LmHeadK1]] heads by head count, both riding to every
    * executor as MAP LITERALS; scoring is a scan-speed per-row lookup
    * with NO model joins. Out-of-head lookups take the default class 0
    * on both sides — fc2 miss scores 0 (count-1 smoothing), fc1 miss
    * scores 0 — EXACTLY the live monitor's frozen-model rule
    * ([[graft.streaming.StreamingLmBigram.lpOf]]), so the head gate is
    * the batch statement of the serving semantics. With both heads ≥
    * their vocabularies this equals [[lmBigram]] exactly (spec-pinned);
    * the truncated regime is gated against a full DuckDB mirror (the
    * truncation is plain SQL). */
  /** The trained model's frequency-cutoff HEAD — top-headK2 bigrams by
    * count (ties to the bigram string) and top-headK1 heads by head
    * count, as bounded driver-side arrays (headK2 + headK1 rows by
    * construction, whatever the corpus bigram vocabulary). The ONE
    * truncation shared by [[lmBigramHead]], the per-source pin frame,
    * and the serving-head artifact the live monitor deploys from
    * ([[graft.artifacts.Artifacts.saveLmBigramHead]]). */
  private[graft] def lmHeadEntries(s: SparkSession, dir: String,
      headK2: Int = LmHeadK2, headK1: Int = LmHeadK1)
      : (Array[(String, Long)], Array[(String, Long)]) = {
    val (f2, f1) = lmModelFrames(s, dir)
    val h2 = f2.select(col("bg"), col("fc2"), col("cnt2"))
      .orderBy(col("cnt2").desc, col("bg").asc)
      .limit(headK2)
      .select("bg", "fc2")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val h1 = f1
      .orderBy(col("cnt1").desc, col("w1").asc)
      .limit(headK1)
      .select("w1", "fc1")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    (h2, h1)
  }

  /** Per-occurrence head-model score: map-literal lookups with the
    * default class 0 on both sides for out-of-head misses — the live
    * monitor's frozen-model rule, stated as ONE Column both head
    * frames derive from. */
  private def headLp(h2: Array[(String, Long)], h1: Array[(String, Long)]): Column = {
    def mapLit(kv: Array[(String, Long)]): Column =
      map(kv.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
        .toIndexedSeq: _*)
    coalesce(element_at(mapLit(h2), col("bg")), lit(0L)) -
      coalesce(element_at(mapLit(h1),
        substring_index(col("bg"), " ", 1)), lit(0L))
  }

  def lmBigramHead(s: SparkSession, dir: String,
      headK2: Int = LmHeadK2, headK1: Int = LmHeadK1): DataFrame = {
    val (h2, h1) = lmHeadEntries(s, dir, headK2, headK1)
    lmBigramOcc(s, dir)
      .select(col("doc_id"), headLp(h2, h1).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6).as("lp_mean"))
      .orderBy("doc_id")
  }

  /** Per-source exact sums under the HEAD model — the live monitor's
    * head-serving equality pin, the [[lmBigramBySource]] twin of
    * [[lmBigramHead]] (integers, bit-exact before any rounding). */
  private[graft] def lmBigramHeadBySource(s: SparkSession, dir: String,
      headK2: Int = LmHeadK2, headK1: Int = LmHeadK1): DataFrame = {
    val (h2, h1) = lmHeadEntries(s, dir, headK2, headK1)
    lmBigramOcc(s, dir)
      .select(col("source"), headLp(h2, h1).as("lp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("sum_lp"))
  }

  /** Per-source exact sums — the live monitor's equality pin
    * (integers, so the pin is bit-exact before any rounding). */
  private[graft] def lmBigramBySource(s: SparkSession, dir: String): DataFrame =
    lmBigramScored(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("sum_lp"))

  /** Vocabulary head: top-k tokens by global term frequency (ties by
    * token), with document frequency alongside — the vocabulary-building
    * pass of a tokenizer pipeline. One shuffle on `tok` computes both
    * aggregates; the top-k is a TakeOrdered, not a full sort. */
  def topTerms(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    toks.groupBy("tok")
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(k)
  }

  /** Approximate vocabulary head via the SpaceSaving sketch aggregate —
    * O(capacity) state per partial instead of the full-vocabulary
    * shuffle of [[topTerms]]; the 100 TB form.
    *
    * Gate strategy: with `capacity` ≥ the distinct-token count, no
    * eviction ever fires, so every estimate is the true count, every
    * error is 0, and every merge floor is 0 — the sketch is EXACT and
    * the plain top-k SQL is a valid DuckDB oracle (count_lo = count_hi
    * = exact frequency). The gate registers capacity 4096 (corpus vocab
    * is ~31 tokens at every SF); the genuinely-approximate regime
    * (capacity < vocabulary, evictions, error bounds) is pinned against
    * exact counts in TopKSketchSpec. */
  def approxTopTerms(s: SparkSession, dir: String, k: Int = 20,
      capacity: Int = 4096): DataFrame = {
    import graft.functions.expressions.TopKSketchAgg
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .agg(TopKSketchAgg(col("tok"), capacity = capacity, k = k).as("top"))
      .selectExpr("inline(top)")
      .orderBy(col("count_hi").desc, col("item").asc)
  }

  /** Order-sensitive rolling-hash fingerprint per document (equal
    * fingerprint ⇒ equal token sequence modulo hash collisions). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        rollingFingerprint(col("toks")).as("fingerprint"),
        size(col("toks")).cast("long").as("n_tokens"))
      .orderBy("doc_id")

  /** GPT-2-style BPE PRE-tokenizer pattern, engine-portable: no
    * lookarounds (RE2 has none), and whitespace written as the explicit
    * class [ \t\n\f\r] because Java's \s includes vertical tab while
    * RE2's does not — the one place the engines' shorthand classes
    * disagree. Contraction suffixes, space-prefixed letter runs, digit
    * runs, punctuation runs, residual whitespace. The real BPE merge
    * table operates WITHIN these pretokens, so their count is the
    * standard cheap proxy for BPE token cost (always a lower bound).
    * Distinct from textStats' `n_bpe_tokens` (a simpler lowercased
    * single-punct count) — this is the pretokenizer form, emitted as
    * `n_pretokens`. */
  val BpePretokenPattern =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\f\\r]+"

  /** Token-cost estimation per document: whitespace tokens vs GPT-2-ish
    * pretokens (the count a tokenizer-budgeted pipeline bills against).
    * Pure per-row regexp — scan-speed, shuffle-free. */
  def bpeTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePretokenPattern), lit(0)))
          .cast("long").as("n_pretokens"))
      .orderBy("doc_id")

  /** Trained-BPE geometry: merge rounds and the bounded trainer
    * vocabulary (top words by (count desc, word asc) — a deterministic
    * total order both engines replay). */
  val BpeMerges = 24
  val BpeTrainWords = 512

  /** One left-to-right merge pass of pair (l, r) over a token sequence —
    * the EXACT fold both engines replay (`acc.last == l && x == r` →
    * replace tail with l+r, else append), so "aaa" under (a,a) becomes
    * (aa, a): non-overlapping, leftmost-first. */
  private[graft] def mergePass(ts: Vector[String], l: String, r: String): Vector[String] =
    ts.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  /** Deterministic BPE merge trainer over a bounded (word, count)
    * table: each round counts ALL adjacent symbol positions (weighted
    * by word count; overlapping positions both count — simpler than
    * tokenizer-lore non-overlap counting and identical in both
    * engines), picks the (max count, then lexicographically smallest
    * (l, r)) pair, and applies it via [[mergePass]]. The tie rule makes
    * the merge table a pure function of the corpus — cross-engine
    * replayable, which float-frequency or insertion-order trainers are
    * not. */
  /** UTF-8 byte order for the trainer's tie rule — the collation BOTH
    * engines actually sort strings by (DuckDB memcmp, Spark
    * UTF8String.compareTo). Java's String.compareTo is UTF-16
    * code-unit order, which disagrees for supplementary-plane symbols
    * vs U+E000–U+FFFF; a driver-side tie broken that way would train a
    * different merge table than the oracle replays. */
  private[graft] object Utf8Ordering extends Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
  }

  /** Codepoint split (NOT `w.map(_.toString)`, which splits surrogate
    * pairs — both engines' `substring` is codepoint-based). */
  private[graft] def codepointChars(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private[graft] def trainBpe(
      words: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    var tokd = words.map { case (w, n) => (codepointChars(w), n) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < rounds && !exhausted) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      tokd.foreach { case (ts, n) =>
        var i = 0
        while (i < ts.length - 1) {
          val p = (ts(i), ts(i + 1)); pc(p) = pc.getOrElse(p, 0L) + n; i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val (l, r) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, Utf8Ordering, Utf8Ordering))._1
        merges += ((l, r))
        tokd = tokd.map { case (ts, n) => (mergePass(ts, l, r), n) }
        k += 1
      }
    }
    merges.result()
  }

  /** [[mergePass]] as a Catalyst fold over an `array<string>` column —
    * `aggregate` with an array accumulator; the when-chain guards the
    * empty accumulator BEFORE `element_at(acc, -1)` (ANSI mode errors
    * on out-of-bounds, and CaseWhen evaluates branches in order).
    * Merge sides are `lit`s, never SQL-string-interpolated — pretokens
    * can contain quotes. */
  private def mergeFoldCol(toks: Column, l: String, r: String): Column =
    aggregate(toks, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .when(element_at(acc, lit(-1)) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Character split of a pretoken (both engines substring by
    * CHARACTER, so multibyte corpora split identically). */
  private def charsCol: Column =
    expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")

  /** The corpus's (doc_id, pretoken) stream and its trained merge
    * table: vocabulary = top [[BpeTrainWords]] pretokens by
    * (count desc, word asc) — a BOUNDED collect (the codebook
    * precedent) feeding the inherently sequential driver-side merge
    * loop; the corpus itself never leaves the cluster. */
  private def pretokensAndMerges(
      s: SparkSession, dir: String,
      rounds: Int = BpeMerges,
      vocabWords: Int = BpeTrainWords,
      strict: Boolean = true): (DataFrame, Seq[(String, String)]) = {
    val pre = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(BpePretokenPattern), lit(0)))
          .as("w"))
    val top = pre.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(vocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = trainBpe(top, rounds)
    // in strict (gate) mode exhaustion would silently diverge from the
    // oracle's fixed-round unroll (its empty best_k annihilates the
    // encode chain) — refuse; the deep path trains TO exhaustion
    require(!strict || merges.length == rounds,
      s"BPE vocabulary exhausted after ${merges.length} merges — " +
        s"corpus too small for $rounds rounds")
    (pre, merges)
  }

  /** TRAINED-BPE token counts (VERDICT r14 item 2 — the unit real
    * token budgets are denominated in, unlike [[bpeTokenCount]]'s
    * pretoken proxy): train [[BpeMerges]] merges on the bounded
    * vocabulary, then encode every document — each DISTINCT pretoken
    * is folded through the merge table ONCE (vocabulary-bounded
    * compute), lengths broadcast back onto the corpus stream.
    *
    * Scale shape: one vocab-sized aggregate + bounded collect for
    * training; encode = distinct-pretoken fold (tiny) + broadcast
    * join + per-doc partial agg — the 100-TB corpus is touched by
    * exactly one scan and one doc-keyed combine. */
  /** Fold a frame of pretokens (column `w`) through a merge table:
    * adds `toks` (the BPE tokenization). A barrier every 8 rounds
    * bounds the collapsed-Project expression depth (24 nested HOFs
    * otherwise). */
  private[graft] def encodeWithMerges(
      words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.zipWithIndex.foldLeft(words.withColumn("toks", charsCol)) {
      case (df, ((l, r), i)) =>
        val step = df.withColumn("toks", mergeFoldCol(col("toks"), l, r))
        if ((i + 1) % 8 == 0) step.localCheckpoint() else step
    }

  /** Per-doc trained-token counts, unordered — shared by the count
    * gate and the trained-token budget. Pass `frozen` to reuse an
    * already-trained merge table (skips the vocab aggregate + driver
    * training; the pretoken scan still runs — it is the corpus side). */
  private[graft] def bpeTrainedPerDoc(
      s: SparkSession, dir: String,
      frozen: Option[Seq[(String, String)]] = None): DataFrame = {
    val (pre, merges) = frozen match {
      case Some(m) =>
        (Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(regexp_extract_all(col("text"), lit(BpePretokenPattern), lit(0)))
              .as("w")), m)
      case None => pretokensAndMerges(s, dir)
    }
    // native rank-indexed encode per DISTINCT pretoken (BpeCodec's
    // lowest-rank loop — merge-count-independent per-token cost, so
    // this same plan carries a realistic 2k–50k-merge table); the
    // nested-HOF fold [[encodeWithMerges]] stays as the Catalyst
    // differential reference, pinned equal in BpeDeepSpec
    val lens = pre.select("w").distinct()
      .select(col("w"),
        graft.functions.expressions.BpeEncodedLen(col("w"), merges).as("n_sub"))
    val perDoc = pre.join(broadcast(lens), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pretokens"), sum("n_sub").as("n_bpe_trained"))
    Tables.documents(s, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pretokens"), lit(0L)).as("n_pretokens"),
        coalesce(col("n_bpe_trained"), lit(0L)).as("n_bpe_trained"))
  }

  def bpeTrainedCounts(s: SparkSession, dir: String): DataFrame =
    bpeTrainedPerDoc(s, dir).orderBy("doc_id")

  /** Per-source TOKENIZER-FIT card over the trained BPE codec — the
    * two standard tokenizer diagnostics a data pipeline reads before
    * committing a merge table to a source mix:
    * `chars_per_token_ppm` (compression: corpus chars per emitted
    * trained token — low means the tokenizer prices this source
    * expensively) and `fertility_ppm` (trained tokens per pretoken —
    * high fertility means words shatter into many subwords, the
    * classic symptom of a tokenizer trained off-domain). Both in exact
    * integer ppm (numerators non-negative, so Spark `div` == DuckDB
    * `//`).
    *
    * Scale shape: rides [[bpeTrainedPerDoc]]'s distinct-pretoken
    * encode (each DISTINCT pretoken priced once, lengths broadcast),
    * then ONE |sources|-row aggregate — the card costs one scan over
    * the per-doc counts frame. */
  def reportTokenizerCard(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .join(bpeTrainedPerDoc(s, dir)
        .select("doc_id", "n_pretokens", "n_bpe_trained"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        sum("n_pretokens").as("n_pretokens"),
        sum("n_bpe_trained").as("n_bpe_trained"))
      .withColumn("chars_per_token_ppm",
        expr("n_chars * 1000000 div greatest(n_bpe_trained, 1)"))
      .withColumn("fertility_ppm",
        expr("n_bpe_trained * 1000000 div greatest(n_pretokens, 1)"))
      .orderBy("source")

  /** Per-source budget for [[tokenBudgetTrained]]: ~half a gate
    * source's trained-token mass, so admit and overflow are both
    * populated at every SF. */
  val TrainedBudget = 2500L

  /** TOKEN BUDGETS IN TRAINED-BPE UNITS — [[tokenBudgetMix]]'s
    * admission rule with the denominator an LLM trainer actually
    * consumes (closing VERDICT r14 residual 2: the pretoken-unit
    * budgets under-bill relative to the real tokenizer). Same
    * per-source running-total window; the per-doc counts come from the
    * trained merge table, so budget decisions and the count gate can
    * never disagree on units. */
  def tokenBudgetTrained(
      s: SparkSession, dir: String, budget: Long = TrainedBudget,
      frozen: Option[Seq[(String, String)]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(bpeTrainedPerDoc(s, dir, frozen).select("doc_id", "n_bpe_trained"), "doc_id")
      .withColumn("cum_tokens", sum(col("n_bpe_trained")).over(w))
      .withColumn("action",
        when(col("cum_tokens") <= budget, "admit").otherwise("overflow"))
      .orderBy("doc_id")
  }

  /** The frozen merge table for `dir` — the training-time artifact a
    * live monitor ships in its closure (StreamingTokenBudget's trained
    * variant), exactly as StreamingDrift freezes its reference
    * profile. */
  def trainedMerges(s: SparkSession, dir: String): Seq[(String, String)] =
    pretokensAndMerges(s, dir)._2

  /** Realistic-scale merge geometry for the DEEP encode path (the
    * `bpe_encode_deep` bench line): the gate constants stay at
    * [[BpeMerges]] = 24 because the DuckDB oracle unrolls one
    * MATERIALIZED CTE per merge, but a real token budget is
    * denominated in a 2k–50k-rule tokenizer. The deep table trains TO
    * VOCABULARY EXHAUSTION capped at 1024 rules — the synthetic gate
    * corpora carry a fixed ~61-word dictionary that exhausts around
    * 127 rules at every SF, while a real corpus fills the cap; either
    * way the encode side (BpeCodec / BpeEncodedLen) prices
    * merge-count-independently, and BpeDeepSpec pins a generated
    * 1024-rule table end to end. */
  val BpeDeepMerges = 1024
  val BpeDeepTrainWords = 4096

  /** The deep merge table for `dir` — trained at
    * [[BpeDeepMerges]]/[[BpeDeepTrainWords]] geometry, exhaustion
    * allowed (see above). */
  def trainedMergesDeep(s: SparkSession, dir: String): Seq[(String, String)] =
    pretokensAndMerges(s, dir, BpeDeepMerges, BpeDeepTrainWords,
      strict = false)._2

  /** The trained merge table itself as a gate — (merge_rank, lhs, rhs),
    * pinning the TRAINER (tie rule included) cross-engine, separately
    * from the encoder [[bpeTrainedCounts]] pins. */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    val (_, merges) = pretokensAndMerges(s, dir)
    import s.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1L, l, r) }
      .toDF("merge_rank", "lhs", "rhs")
      .orderBy("merge_rank")
  }

  /** PII patterns, Java-regex ↔ RE2 portable: no lookarounds, no
    * backreferences, explicit classes; `\b`/`\d` are ASCII in both
    * engines and greedy quantifiers resolve identically under Java's
    * leftmost-greedy and RE2's leftmost-first semantics for these
    * alternation-free shapes. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** PII detection + redaction — the scrubbing pass every training-data
    * pipeline runs before text leaves curation. The synthetic corpus
    * carries no PII, so the query first derives a deterministic contact
    * line from each row's own columns (identically in the DuckDB
    * oracle), then counts and redacts emails / IPv4s / phone numbers in
    * class order email → ip → phone (counts are taken on the original
    * string; replacement order matters only for overlapping classes,
    * and is fixed identically on both engines). Pure per-row regexp —
    * scan-speed, shuffle-free, whole-stage codegen'd at 100 TB. */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val contact = concat(
      lit("user"), col("doc_id").cast("string"),
      lit("@"), col("source"), lit(".example.com ip 10."),
      (col("doc_id") % 200).cast("string"), lit("."),
      (col("doc_id") % 251).cast("string"), lit("."),
      (col("doc_id") % 97).cast("string"),
      lit(" tel +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" "), col("text"))
    // spread (r19): 4 regexp_replace passes per doc are CPU-heavy and
    // per-row — the single-row-group corpus scan otherwise runs them in
    // one task (measured 0.97 -> 0.60 s at sf0.1/32 cores; a GLOBAL
    // documents spread was tried and rejected — composite report/curation
    // queries pay one AQE stage barrier per instance and regressed)
    Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), contact.as("contact"))
      .select(
        col("doc_id"),
        regexp_count(col("contact"), lit(EmailPattern)).cast("long").as("n_emails"),
        regexp_count(col("contact"), lit(Ipv4Pattern)).cast("long").as("n_ips"),
        regexp_count(col("contact"), lit(PhonePattern)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("contact"), EmailPattern, "[EMAIL]"),
            Ipv4Pattern, "[IP]"),
          PhonePattern, "[PHONE]").as("redacted"))
      .withColumn("n_pii", col("n_emails") + col("n_ips") + col("n_phones"))
      .orderBy("doc_id")
  }

  /** Repetition-based quality filter (the Gopher-rule family): per-doc
    * distinct-token ratio, most-frequent-token fraction, and duplicate
    * bigram fraction, with a composite keep flag. Two shapes compose:
    * the array metrics are per-row O(len·log len) (no shuffle), and the
    * top-token argmax is the posting-list shape (explode → two-level
    * aggregate → per-doc rank), shuffling tokens once on (doc_id, tok)
    * and once on doc_id for the join — the same plan family as
    * [[rareTerm]], which is the 100 TB-honest form (a per-row
    * frequency HOF would be O(len²) on long documents). */
  def qualityRepetition(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val n = size(col("toks"))
    val bigrams = zip_with(
      slice(col("toks"), lit(1), n - 1),
      slice(col("toks"), lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val arrStats = base.select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
      size(bigrams).cast("long").as("n_bigrams"),
      size(array_distinct(bigrams)).cast("long").as("n_distinct_bigrams"))
    val w = Window.partitionBy("doc_id").orderBy(col("top_tok_n").desc, col("top_tok").asc)
    val top = base.select(col("doc_id"), explode(col("toks")).as("top_tok"))
      .groupBy("doc_id", "top_tok").agg(count(lit(1)).as("top_tok_n"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
    arrStats.join(top, "doc_id")
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_tokens"), 6))
      .withColumn("top_tok_frac",
        round(col("top_tok_n").cast("double") / col("n_tokens"), 6))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(round(
            (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") / col("n_bigrams"), 6)))
      .withColumn("keep",
        col("distinct_ratio") >= 0.45 && col("top_tok_frac") <= 0.12 &&
          col("dup_bigram_frac") <= 0.05)
      .orderBy("doc_id")
  }

  /** TOKEN-BUDGET data mixing: per source, admit documents in
    * deterministic doc_id order until the source's cumulative token
    * count exceeds `budget` — the quota step of mixture curation ("at
    * most N tokens of source X in this training run"). A document is
    * admitted iff the running total INCLUDING it fits the budget;
    * later documents of an exhausted source overflow (no
    * skip-and-refill — admission must be a prefix to stay
    * order-deterministic).
    *
    * Scale shape: one shuffle clustering each source, then a spillable
    * per-partition sort feeding a running-sum window frame — state is
    * O(1) per row. Sources are the natural unit of admission control,
    * so the partition count equals the source count; a pathologically
    * giant single source is a window-skew case (mitigate upstream by
    * splitting the source id). */
  def tokenBudgetMix(
      s: SparkSession, dir: String, budget: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("action",
        when(col("cum_tokens") <= budget, "admit").otherwise("overflow"))
      .orderBy("doc_id")
  }

  /** TOKEN BUDGET — WATER-FILLING allocation: given a global budget B
    * (= total tokens div 2 here), cap every source at the water level
    * L = the largest integer with Σ min(tᵢ, L) ≤ B — small sources
    * stay whole, big sources are equalized down to L. This is the
    * balanced-mixture rule between [[tokenBudgetMix]]'s flat quota and
    * [[tokenBudgetTemperature]]'s sqrt flattening: it maximizes the
    * minimum admitted mass under the budget.
    *
    * Closed form over sources sorted ascending by (t, source): with k
    * sources fully admitted, L_k = (B − prefix_k) div (n − k); the
    * consistent k has t_k ≤ L_k < t_{k+1} — all integer algebra, so
    * both engines pick the identical level. The level candidate scan is
    * |sources| rows; the ONLY corpus-sized work is the per-source token
    * sum (one map-side-combined exchange). The chosen level collects to
    * the driver (1 row, the codebook precedent) and re-enters as a
    * literal. */
  def tokenBudgetWaterfill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(s, dir)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source").agg(sum(col("n_tokens")).as("t"))
    val tot = t.agg(expr("sum(t) div 2").as("budget"), count(lit(1)).as("n_src"))
    // |sources| rows: the single-partition window is the point, not a smell
    val w = Window.orderBy(col("t").asc, col("source").asc)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = t.crossJoin(broadcast(tot))
      .select(col("source"), col("t"), col("budget"), col("n_src"),
        row_number().over(w).cast("long").as("idx"),
        sum(col("t")).over(cum).as("prefix"),
        coalesce(lag(col("t"), 1).over(w), lit(0L)).as("prev_t"))
      .localCheckpoint() // consumed by the candidate filter AND the output
    val lvl = cand
      .withColumn("level", expr("(budget - (prefix - t)) div (n_src - idx + 1)"))
      // the numerator-non-negative guard keeps the division out of the
      // negative range, where Spark `div` (truncating) and DuckDB `//`
      // (flooring) disagree
      .filter((col("budget") >= col("prefix") - col("t") &&
          col("level") >= col("prev_t") && col("level") < col("t")) ||
        (col("idx") === col("n_src") && col("prefix") <= col("budget")))
      .withColumn("level",
        when(col("idx") === col("n_src") && col("prefix") <= col("budget"), col("t"))
          .otherwise(col("level")))
      .orderBy("idx").select("level").head(1)
    require(lvl.length == 1,
      "water-filling found no consistent level — budget/corpus degenerate")
    val level = lvl(0).getLong(0)
    cand.select(col("source"), col("t").as("t_tokens"),
        least(col("t"), lit(level)).as("admitted"),
        expr(s"least(t, ${level}L) * 1000000 div t").as("rate_ppm"),
        lit(level).as("water_level"))
      .orderBy("source")
  }

  /** Temperature-weighted TOKEN budgets: [[tokenBudgetMix]] admits a
    * flat per-source budget; real mixture construction budgets TOKENS
    * per stratum proportional to `sqrt(stratum tokens)` (α = 0.5
    * flattening, the [[Dedup.sampleTemperature]] rule moved from doc
    * counts to token mass). Targets use integer sqrt weights + integer
    * division (cross-engine-exact, order-independent); admission is the
    * same running-token-sum window, now against the per-stratum target.
    *
    * Scale: the window partitions by stratum — same giant-stratum note
    * as tokenBudgetMix (a stratum's running sum is one task's sort;
    * salt+merge à la q40 if a stratum outgrows it). The weight/target
    * side is a |strata|-row broadcast. */
  def tokenBudgetTemperature(
      s: SparkSession, dir: String, budget: Long = 8000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val weights = docs.groupBy("lang").agg(sum(col("n_tokens")).as("t_tokens"))
      .withColumn("w", floor(sqrt(col("t_tokens"))).cast("long"))
    val total = weights.agg(sum(col("w")).as("tw"))
    val targets = weights.crossJoin(broadcast(total))
      .withColumn("target", expr(s"w * $budget div tw"))
      .select("lang", "target")
    val win = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(targets), Seq("lang"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .withColumn("action",
        when(col("cum_tokens") <= col("target"), "admit").otherwise("overflow"))
      .select("doc_id", "lang", "n_tokens", "cum_tokens", "target", "action")
      .orderBy("doc_id")
  }

  /** EPOCH-AWARE mixture construction (`mix_epochs`) — the UPSAMPLING
    * side of the token-budget family: [[tokenBudgetMix]] truncates a
    * source at its budget; real pretraining mixes also REPEAT
    * under-weighted high-value sources for multiple epochs (the
    * Pile/Llama-style recipe). Each source gets an integer token budget
    * `B_s = w_s · 2·ΣT div Σw` (mixture weight w_s = suffix mod 5 + 1 —
    * a fixed deterministic stand-in for a curated weight table; 2×
    * corpus total keeps both regimes populated at every SF). A source
    * delivers `q = B_s div T_s` full epochs of every document plus a
    * FRACTIONAL epoch: the hash-ordered document prefix whose token
    * mass covers the remainder `r = B_s mod T_s` (greedy — the boundary
    * document overshoots, exactly like the budget gates' final admit).
    * `n_repeats = q + [cum_prev < r]`, all integer arithmetic, so the
    * selection is reproducible and auditable — rerunning the mix
    * yields byte-identical epoch plans.
    *
    * Scale shape: one scan + one |sources|-row aggregate (broadcast
    * back with the two ONE-ROW totals as by-construction cross joins);
    * the fractional-epoch window partitions by source — same
    * giant-stratum note as the budget gates (salt+merge à la q40 if a
    * source outgrows one task's sort). */
  def mixEpochs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        h32(col("doc_id").cast("string")).as("hk"))
    val perSource = docs.groupBy("source")
      .agg(sum(col("n_tokens")).as("t_tokens"))
      .withColumn("w", substring(col("source"), 4, 10).cast("long") % 5 + 1)
    val total = perSource.agg(sum(col("t_tokens")).as("grand"))
    val totalW = perSource.agg(sum(col("w")).as("tw"))
    val budgets = perSource
      .crossJoin(broadcast(total)).crossJoin(broadcast(totalW))
      .withColumn("b", expr("w * 2 * grand div tw"))
      .select(col("source"),
        expr("b div t_tokens").as("q"), expr("b % t_tokens").as("r"))
    val win = Window.partitionBy("source").orderBy("hk", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(budgets), Seq("source"))
      .withColumn("cum_prev", coalesce(sum(col("n_tokens")).over(win), lit(0L)))
      .withColumn("n_repeats",
        col("q") + when(col("cum_prev") < col("r"), 1L).otherwise(0L))
      .select("doc_id", "source", "n_tokens", "n_repeats")
      .orderBy("doc_id")
  }

  /** BM25 parameters (Robertson/Sparck Jones defaults) and the fixed
    * query term list for the [[bm25Score]] gate. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25Query: Seq[String] = Seq("spark", "window", "merge")

  /** LEXICAL RANKING — BM25-style relevance of every document against a
    * query, the lexical side of a hybrid (lexical + vector) retrieval
    * stack. One deliberate deviation keeps it hash-gateable:
    * idf uses the RAW Robertson ratio `(N - df + 0.5)/(df + 0.5)`
    * instead of its log — `ln` differs between libm and the JVM in the
    * last ulp (same reason the HLL gate emits integers), while the
    * ratio is a single division of exactly-represented doubles,
    * bit-identical in both engines. Monotone per term, so per-term
    * ranking is unchanged; the blended score weights high-idf terms
    * more than log-BM25 would (documented, constant across engines). */
  def bm25Score(s: SparkSession, dir: String): DataFrame =
    bm25ScoreOf(Tables.documents(s, dir), Bm25Query)

  /** [[bm25Score]] for an ARBITRARY query-term list.
    *
    * Scale shape: per-term tf comes from ONE pass over each row's token
    * array — pre-filter to query hits, then fold the hits into a
    * per-term count array — so the row-side plan carries a single
    * projected column regardless of |query| (the round-5 formulation
    * projected one filter() column per term: plan width O(|query|)).
    * The corpus stats (N, avg length, per-term df) are one tiny
    * aggregate broadcast back via a 1-row cross join; df reads the tf
    * array, so the stats pass is one scan too. The fold over query
    * terms is written in FIXED term order so the double sum is
    * deterministic. Equality with the per-term-column formulation at 32
    * terms is spec-pinned (ExtensionsSpec). */
  /** The per-doc (doc_id, len, tf-vector) frame both the batch scorer
    * and the streaming RRF twin ingest — ONE shared construction so the
    * live head's token counts are bit-identical to the gate's. */
  private[graft] def bm25DocStats(docs: DataFrame, query: Seq[String]): DataFrame = {
    require(query.nonEmpty, "bm25 query must have at least one term")
    require(query.distinct == query, "bm25 query terms must be distinct")
    val qlit = typedLit(query)
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
      .withColumn("tf", aggregate(
        filter(col("toks"), tok => array_contains(qlit, tok)),
        typedLit(Seq.fill(query.size)(0L)),
        (acc, tok) => transform(acc, (c, i) =>
          c + when(element_at(qlit, i + 1) === tok, 1L).otherwise(0L))))
      .select("doc_id", "len", "tf")
  }

  def bm25ScoreOf(docs: DataFrame, query: Seq[String]): DataFrame = {
    val t = bm25DocStats(docs, query)
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
        sum(col("len")).cast("double").as("sum_len") +:
        query.indices.map(i =>
          sum(when(element_at(col("tf"), i + 1) > 0L, 1L).otherwise(0L))
            .cast("double").as(s"df_$i"))
    val stats = t.agg(statAggs.head, statAggs.tail: _*)
    val withStats = t.crossJoin(broadcast(stats))
    val avgLen = col("sum_len") / col("n_docs")
    val score = query.indices.map { i =>
      val tf = element_at(col("tf"), i + 1).cast("double")
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      val tfN = tf * (lit(Bm25K1) + 1.0) /
        (tf +
          lit(Bm25K1) * (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("len") / avgLen))
      idf * tfN
    }.reduce(_ + _)
    withStats
      .select(col("doc_id"), col("len").as("n_tokens"),
        round(score, 6).as("score"))
      .orderBy("doc_id")
  }

  /** Dirichlet smoothing mass for [[qlmScore]] (the Zhai-Lafferty
    * default neighborhood: ~2× a typical document length here). */
  val QlmMu = 2000L

  /** QUERY-LIKELIHOOD LM RETRIEVAL — the third classical lexical
    * ranker beside BM25 and RRF's fused heads: score every document
    * against the fixed [[Bm25Query]] under a Dirichlet-smoothed
    * document language model, P(t|d) = (tf + μ·P(t|C)) / (len + μ).
    * Ponte-Croft / Zhai-Lafferty, kept hash-gateable the way the
    * whole LM family is — in INTEGER fixed point:
    *
    *   score = Σ_t [ tf_t·10⁹ div (len+μ)
    *               + μ·cf_ppm_t·10³ div (len+μ) ]   (parts-per-billion)
    *   cf_ppm_t = cf_t·10⁶ div Σlen                  (corpus constant)
    *
    * One documented deviation (the bm25 raw-ratio-idf precedent): the
    * doc score sums the per-term smoothed probabilities instead of
    * their logs — log differs between libm and the JVM in the last
    * ulp, the integer sum is bit-exact cross-engine, and the ranking
    * intuition (rare-in-corpus terms present in a short doc dominate)
    * is preserved because each term's contribution is still its
    * smoothed P(t|d). Truncating `div` is safe: every operand is
    * non-negative, so Spark's truncation and DuckDB's floor agree.
    *
    * Scale shape: rides [[bm25DocStats]]'s one-pass tf-vector (a
    * single projected column regardless of |query|); corpus stats are
    * ONE tiny aggregate broadcast back via the 1-row cross join; the
    * fixed-order integer fold has no float anywhere. Long headroom:
    * tf·10⁹ ≤ len·10⁹ and μ·cf_ppm·10³ ≤ 2·10¹² stay far under 2⁶³;
    * cf·10⁶ requires Σlen ≤ 9·10¹² tokens per scored shard — beyond
    * that, pre-divide (cf div (Σlen div 10⁶)) at the stats stage. */
  def qlmScore(s: SparkSession, dir: String): DataFrame =
    qlmScoreOf(Tables.documents(s, dir), Bm25Query)

  /** [[qlmScore]] for an arbitrary query-term list. */
  def qlmScoreOf(docs: DataFrame, query: Seq[String]): DataFrame = {
    val t = bm25DocStats(docs, query)
    val statAggs =
      sum(col("len")).as("c_total") +:
        query.indices.map(i =>
          sum(element_at(col("tf"), i + 1)).as(s"cf_$i"))
    val stats = t.agg(statAggs.head, statAggs.tail: _*)
    val score = query.indices.map { i =>
      s"(element_at(tf, ${i + 1}) * 1000000000L) div (len + $QlmMu) + " +
        s"($QlmMu * ((cf_$i * 1000000L) div c_total) * 1000L) div (len + $QlmMu)"
    }.mkString(" + ")
    t.crossJoin(broadcast(stats))
      .select(col("doc_id"), col("len").as("n_tokens"),
        expr(score).as("qlm_ppb"))
      .orderBy("doc_id")
  }

  /** Context length for [[packSequences]] (tokens per training sequence). */
  val PackSeqLen = 512L

  /** SEQUENCE PACKING — the GPT-style pretraining step that concatenates
    * documents in a fixed order and slices the token stream into
    * training sequences of [[PackSeqLen]] tokens: each document is
    * assigned the sequence its FIRST token lands in (documents straddle
    * boundaries; the concatenated stream is what gets sliced, exactly
    * like production packing). Output: one row per (source, sequence)
    * with the documents and tokens that START there.
    *
    * Scale shape: the running offset is a per-source window running sum
    * (linear, partition-parallel — the same shape as
    * [[tokenBudgetMix]]); the sequence roll-up is an ordinary
    * combinable aggregate. A GLOBAL packing order would serialize the
    * window into one reducer — per-source is both the production
    * sharding (mixtures are packed per shard) and the scale-correct
    * one. */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequencesOf(Tables.documents(s, dir))

  /** [[packSequences]] over any (doc_id, source, text) frame — e.g. the
    * curated output of a pipeline rather than the raw table. */
  def packSequencesOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // `div`: exact BIGINT division (a double `/` + floor would read
      // back as DOUBLE at the gate boundary)
      .withColumn("seq_id", expr(s"start_offset div $PackSeqLen"))
      .groupBy("source", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source", "seq_id")
  }

  /** Chunk geometry for [[chunkOverlap]]: window of `ChunkLen` tokens
    * advancing by `ChunkStride` (25% overlap) — the retrieval-side
    * chunking every RAG pipeline runs over a curated corpus. */
  val ChunkLen = 64
  val ChunkStride = 48

  /** OVERLAPPING CHUNKS: slice each document's token array into
    * stride-advanced windows, emitting (doc_id, chunk_id, n_tokens,
    * chunk preview hash). Pure per-row explode — no shuffle at all
    * before the output ordering; a 100 TB corpus chunks at scan speed.
    * Chunk count = ceil(max(n - overlap, 1) / stride) so the final
    * partial window is emitted once and never duplicated. */
  def chunkOverlap(s: SparkSession, dir: String): DataFrame = {
    val nChunks = ceil(
      greatest(size(col("toks")) - lit(ChunkLen - ChunkStride), lit(1))
        .cast("double") / lit(ChunkStride.toDouble)).cast("int")
    Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("toks"), i * ChunkStride + 1, lit(ChunkLen))))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        Portable.h32(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }
}
