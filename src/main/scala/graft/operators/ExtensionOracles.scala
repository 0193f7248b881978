package graft.operators

import graft.functions.{Dedup, Similarity, TextAnalysis}

/** DuckDB-dialect oracles for the extension operators. Shared building
  * blocks are kept in sync with `graft.functions.Portable`:
  * h32 = first 8 md5 hex chars as unsigned BIGINT; shingles = word
  * 3-grams of whitespace tokens; folds via list_reduce (left fold, same
  * order as Spark's `aggregate`).
  */
object ExtensionOracles {

  private val toks = """string_split_regex(lower(text), '\s+')"""
  private def h32(e: String) = s"CAST('0x' || substring(md5($e), 1, 8) AS BIGINT)"
  private def h32b(e: String) = s"CAST('0x' || substring(md5($e), 9, 8) AS BIGINT)"

  private val shingleExpr =
    """CASE WHEN len(toks) >= 3
      |     THEN list_transform(range(len(toks) - 2),
      |            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
      |     ELSE [array_to_string(toks, ' ')] END""".stripMargin

  /** Near-dup corpus: documents plus tail-perturbed copies of every 7th. */
  private val nearCorpus =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000000000000, text || ' graft near dup tail marker'
      |  FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** Distinct (doc_id, shingle) set over the near-dup corpus. */
  private val nearShingles =
    s"""tokd AS (SELECT doc_id, $toks AS toks FROM corpus),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest($shingleExpr) AS s FROM tokd) u)""".stripMargin

  // intersection join on (h32, h32b) md5 pairs, not shingle strings —
  // mirrors the Spark side's 16-byte join keys (Dedup.hashPairs); both
  // engines see any 128-bit collision identically
  private val sizesAndInter =
    s"""sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |hp AS (SELECT doc_id, ${h32("s")} AS h1, ${h32b("s")} AS h2 FROM sh),
       |inter AS (
       |  SELECT p.doc_id AS doc_a, q.doc_id AS doc_b, count(*) AS i
       |  FROM hp p JOIN hp q ON p.h1 = q.h1 AND p.h2 = q.h2 AND p.doc_id < q.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** Banded-LSH candidate CTEs over `sh` (the minhash signature, band
    * hashes, and the distinct same-band pair set) — shared verbatim by
    * the Jaccard- and edit-distance-verified near-dup oracles so the
    * candidate generation provably cannot drift between them. */
  private val lshCandidates =
    s"""hs AS (SELECT doc_id, ${h32("s")} AS h FROM sh),
       |mh AS (
       |  SELECT doc_id, j,
       |    min(((2 * j + 1) * h + 1000003 * j + 12345) % 2147483647) AS m
       |  FROM hs, range(64) t(j) GROUP BY doc_id, j),
       |bands AS (
       |  SELECT doc_id, j // 4 AS band,
       |    sum(m * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END)) AS band_hash
       |  FROM mh GROUP BY doc_id, j // 4),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)""".stripMargin

  private def stopList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private def hitExpr(words: Seq[String]) =
    s"CAST(len(list_filter(toks, x -> list_contains(${stopList(words)}, x))) AS BIGINT)"

  private val langs = TextAnalysis.langMarkers.map(_._1)

  /** Shared by `decontaminate_bloom` AND `decontaminate_bloom_bitmap`:
    * the bitmap form computes bit-identical decisions (same deterministic
    * positions, same set bits, same all-k rule), so one SQL pins both. */
  private lazy val bloomDecontaminateSql: String = {
    import graft.functions.Dedup.{BloomK, BloomM}
    val is = (0 until BloomK).mkString("[", ", ", "]")
    s"""WITH bench AS (
       |  SELECT array_to_string(list_slice($toks, 1, 8), ' ') AS text
       |  FROM documents WHERE doc_id % 13 = 0),
       |btokd AS (SELECT $toks AS toks FROM bench),
       |bsh AS (SELECT DISTINCT unnest($shingleExpr) AS s FROM btokd),
       |bh AS (SELECT ${h32("s")} AS h1, ${h32b("s")} AS h2 FROM bsh),
       |bpos AS (SELECT DISTINCT (h1 + i * h2) % $BloomM AS pos
       |         FROM bh CROSS JOIN (SELECT unnest($is) AS i) g),
       |tokd AS (SELECT doc_id, $toks AS toks FROM documents),
       |dsh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest($shingleExpr) AS s FROM tokd) u),
       |dh AS (SELECT doc_id, s, ${h32("s")} AS h1, ${h32b("s")} AS h2 FROM dsh),
       |dpos AS (SELECT doc_id, s, (h1 + i * h2) % $BloomM AS pos
       |         FROM dh CROSS JOIN (SELECT unnest($is) AS i) g),
       |hit AS (SELECT doc_id, s FROM dpos JOIN bpos USING (pos)
       |        GROUP BY doc_id, s HAVING count(*) = $BloomK),
       |nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom
       |       FROM hit GROUP BY doc_id),
       |ne AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact
       |       FROM dsh JOIN bsh USING (s) GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(nb.n_bloom, 0) AS BIGINT) AS n_bloom,
       |  CAST(coalesce(ne.n_exact, 0) AS BIGINT) AS n_exact,
       |  CASE WHEN coalesce(nb.n_bloom, 0) >= 4
       |       THEN 'quarantine' ELSE 'keep' END AS action
       |FROM documents d
       |LEFT JOIN nb ON d.doc_id = nb.doc_id
       |LEFT JOIN ne ON d.doc_id = ne.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Corpus-size-derived sign-LSH bucket width (kept in sync with
    * `Similarity.signBucketDimsFor`): smallest d ≥ min with
    * 2^d · target ≥ count — same integer predicate, same search range. */
  private def dimsCte(countFrom: String) =
    s"""dims AS (
       |  SELECT min(d) AS d FROM range(${Similarity.MinSignBucketDims}, 41) t(d)
       |  WHERE (CAST(1 AS BIGINT) << d) * ${Similarity.BucketOccupancyTarget}
       |        >= (SELECT count(*) FROM $countFrom))""".stripMargin

  /** Sign-bucket expression over the first `d` dims (d from [[dimsCte]],
    * cross-joined into scope as column `d`). */
  private val bucketExpr =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(d), i -> CASE WHEN embedding[i+1] > 0 THEN CAST(pow(2, i) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (a, b) -> a + b)""".stripMargin

  /** Shared CTE chain of the composed curation pipeline
    * (`graft.examples.PipelineDemo.curated`): every stage is the SAME
    * SQL its individual gate uses — renamed only where CTE names would
    * collide — intersected at the end, so a composed-gate failure
    * isolates to stage INTERACTION (dedup ordering vs sampling
    * determinism, id-space overlap), never to stage logic the per-stage
    * gates already pin. Ends with the `curated` CTE
    * (doc_id, lang, source, fingerprint, text). */
  private lazy val curationCtes: String = {
    val en = langs.head
    val enRule = langs.tail.map(o => s"h_$en >= h_$o").mkString(" AND ")
    val hitCols = TextAnalysis.langMarkers
      .map { case (l, ws) => s"  ${hitExpr(ws)} AS h_$l" }.mkString(",\n")
    s"""$nearCorpus,
       |$nearShingles,
       |$lshCandidates,
       |$sizesAndInter,
       |verified AS (
       |  SELECT c.doc_b
       |  FROM cand c
       |  JOIN inter ON c.doc_a = inter.doc_a AND c.doc_b = inter.doc_b
       |  JOIN sizes sa ON c.doc_a = sa.doc_id
       |  JOIN sizes sb ON c.doc_b = sb.doc_id
       |  WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5),
       |near_keep AS (
       |  SELECT doc_id FROM corpus
       |  WHERE doc_id NOT IN (SELECT doc_b FROM verified)),
       |qstat AS (SELECT doc_id,
       |    CAST(len($toks) AS BIGINT) AS n_tokens,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha
       |  FROM documents),
       |quality AS (SELECT doc_id FROM qstat
       |  WHERE round(CAST(n_alpha AS DOUBLE) / n_chars, 6) >= 0.6 AND n_tokens >= 10),
       |ltok AS (SELECT doc_id, $toks AS toks FROM documents),
       |lhits AS (SELECT doc_id,
       |$hitCols
       |FROM ltok),
       |english AS (SELECT doc_id FROM lhits WHERE $enRule),
       |ecorpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000000000000, text FROM documents WHERE doc_id % 10 = 0),
       |exact_keep AS (SELECT min(doc_id) AS doc_id FROM ecorpus GROUP BY md5(text)),
       |bench AS (
       |  SELECT array_to_string(list_slice($toks, 1, 8), ' ') AS text
       |  FROM documents WHERE doc_id % 13 = 0),
       |btokd AS (SELECT $toks AS toks FROM bench),
       |bsh AS (SELECT DISTINCT unnest($shingleExpr) AS s FROM btokd),
       |dtokd AS (SELECT doc_id, $toks AS toks FROM documents),
       |ddsh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, unnest($shingleExpr) AS s FROM dtokd) du),
       |ov AS (SELECT doc_id, count(*) AS n_overlap
       |       FROM ddsh JOIN bsh USING (s) GROUP BY doc_id),
       |clean AS (
       |  SELECT d.doc_id FROM documents d
       |  LEFT JOIN ov ON d.doc_id = ov.doc_id
       |  WHERE coalesce(ov.n_overlap, 0) < 4),
       |sampled AS (SELECT doc_id FROM documents WHERE ${h32("text")} % 100 < 10),
       |admitted AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, sum(len($toks)) OVER (
       |      PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |    FROM documents) a WHERE cum <= 1000),
       |fp AS (SELECT doc_id,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT), list_transform(toks, s -> ${h32("s")})),
       |      (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint
       |  FROM ltok),
       |curated AS (
       |  SELECT d.doc_id, d.lang, d.source, fp.fingerprint, d.text
       |  FROM documents d
       |  JOIN quality USING (doc_id)
       |  JOIN english USING (doc_id)
       |  JOIN exact_keep USING (doc_id)
       |  JOIN near_keep USING (doc_id)
       |  JOIN clean USING (doc_id)
       |  JOIN sampled USING (doc_id)
       |  JOIN admitted USING (doc_id)
       |  JOIN fp ON d.doc_id = fp.doc_id)""".stripMargin
  }

  /** Trained-BPE CTE chain: bounded vocabulary, then
    * [[TextAnalysis.BpeMerges]] UNROLLED merge rounds (weighted
    * adjacent-pair counts → deterministic best pair (count DESC, l, r)
    * → one left-to-right fold pass), then the distinct-pretoken encode
    * chain folding through every best pair in rank order — the q61
    * chained-CTE replay discipline applied to a trainer. The fold
    * lambda is the EXACT algebra of `TextAnalysis.mergePass` /
    * `mergeFoldCol`. Ends with `pre` (doc_id, w), `best1..bestK`, and
    * `lens` (w, n_sub). */
  private lazy val bpeCtes: String = {
    val pat = TextAnalysis.BpePretokenPattern.replace("'", "''")
    val k = TextAnalysis.BpeMerges
    def fold(m: String) =
      s"""list_reduce(list_transform(toks, t -> [t]),
         |    (acc, x) -> CASE WHEN len(acc) >= 1 AND acc[len(acc)] = $m.l AND x[1] = $m.r
         |                THEN list_append(acc[1:len(acc)-1], $m.l || $m.r)
         |                ELSE list_append(acc, x[1]) END)""".stripMargin
    val charSplit = "list_transform(range(length(w)), i -> substring(w, i+1, 1))"
    // every chained CTE is MATERIALIZED (the kcenter/q61 recipe):
    // DuckDB inlines CTEs by default, and wt_i is referenced by BOTH
    // pc_{i+1} and wt_{i+1} — inlining doubles per round and the plan
    // (and its parquet scans) explodes 2^K
    val rounds = (1 to k).map { i =>
      val prev = s"wt${i - 1}"
      // the last round's post-merge word table feeds nothing — emit
      // only its pair counts and best pair
      val wt = if (i == k) "" else
        s""",
           |wt$i AS MATERIALIZED (SELECT w, n, ${fold(s"m$i")} AS toks FROM $prev, best$i m$i)""".stripMargin
      s"""pc$i AS MATERIALIZED (
         |  SELECT p.l AS l, p.r AS r, sum(n) AS c FROM (
         |    SELECT n, unnest(list_transform(range(len(toks) - 1),
         |      j -> struct_pack(l := toks[j+1], r := toks[j+2]))) AS p
         |    FROM $prev) q$i
         |  GROUP BY 1, 2),
         |best$i AS MATERIALIZED (SELECT l, r FROM pc$i ORDER BY c DESC, l ASC, r ASC LIMIT 1)$wt""".stripMargin
    }.mkString(",\n")
    val encode = (1 to k).map { i =>
      val prev = if (i == 1) "ec0c" else s"ec${i - 1}"
      s"ec$i AS MATERIALIZED (SELECT w, ${fold(s"n$i")} AS toks FROM $prev, best$i n$i)"
    }.mkString(",\n")
    s"""pre AS MATERIALIZED (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '$pat')) AS w
       |  FROM documents),
       |vocab AS MATERIALIZED (SELECT w, count(*) AS n FROM pre GROUP BY w),
       |wt0 AS MATERIALIZED (
       |  SELECT w, n, $charSplit AS toks FROM (
       |    SELECT w, n FROM vocab
       |    ORDER BY n DESC, w ASC LIMIT ${TextAnalysis.BpeTrainWords}) tv),
       |$rounds,
       |ec0 AS MATERIALIZED (SELECT DISTINCT w FROM pre),
       |ec0c AS MATERIALIZED (SELECT w, $charSplit AS toks FROM ec0),
       |$encode,
       |lens AS MATERIALIZED (SELECT w, CAST(len(toks) AS BIGINT) AS n_sub FROM ec$k)""".stripMargin
  }

  private val base: Map[String, String] = Map(
    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
         |s AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
         |  ${hitExpr(TextAnalysis.langMarkers.head._2)} AS n_stopwords
         |FROM t)
         |SELECT doc_id, n_tokens, n_bpe_tokens, n_chars, n_alpha, n_stopwords,
         |  round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
         |  round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
         |  round(CAST(n_alpha AS DOUBLE) / n_chars, 6) AS alpha_ratio,
         |  round(CAST(n_alpha AS DOUBLE) / n_chars + CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS quality_score
         |FROM s ORDER BY doc_id""".stripMargin,

    "text_lang_id" -> {
      val hitCols = TextAnalysis.langMarkers
        .map { case (l, ws) => s"  ${hitExpr(ws)} AS h_$l" }.mkString(",\n")
      val cases = langs.init.map { l =>
        val ge = langs.filter(_ != l).map(o => s"h_$l >= h_$o").mkString(" AND ")
        s"  WHEN $ge THEN '$l'"
      }.mkString("\n")
      val total = langs.map(l => s"h_$l").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, $toks AS toks FROM documents),
         |h AS (SELECT doc_id, labeled_lang,
         |$hitCols
         |FROM t)
         |SELECT doc_id, labeled_lang, $total AS n_marker_hits,
         |  CASE
         |$cases
         |  ELSE '${langs.last}' END AS detected_lang
         |FROM h ORDER BY doc_id""".stripMargin
    },

    // nearest-rank quantiles: smallest value with cumulative count >=
    // max(1, ceil(q*n)) == the value at that sorted position — exactly
    // the sketch's exact-regime semantics
    "approx_quantiles" -> {
      val qCol = (q: String, name: String) =>
        s"max(CASE WHEN rn = greatest(1, CAST(ceil($q * n) AS BIGINT)) THEN v END) AS $name"
      s"""WITH s AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v FROM lineitem),
         |n AS (SELECT l_returnflag, count(*) AS n FROM s GROUP BY 1),
         |r AS (SELECT l_returnflag, v,
         |  row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn FROM s)
         |SELECT r.l_returnflag,
         |  ${qCol("0.25", "q25")},
         |  ${qCol("0.5", "q50")},
         |  ${qCol("0.75", "q75")},
         |  ${qCol("0.95", "q95")}
         |FROM r JOIN n USING (l_returnflag)
         |GROUP BY r.l_returnflag ORDER BY l_returnflag""".stripMargin
    },

    // Count-Min counter table mirror: row i's bucket is the i-th 11-bit
    // slice of the shared 52-bit md5 hash (d=4, w=2048 — Profiling.CmsD/
    // CmsWBits); estimates = min over each probe term's 4 cells. All
    // integer math, so any bucket collision inflates both engines
    // identically.
    "approx_count_min" -> {
      import graft.functions.Profiling.{CmsD, CmsW, CmsWBits}
      val is = (0 until CmsD).mkString("[", ", ", "]")
      // self-parenthesized: the probe CTE divides this whole expression
      // (`h52 // shift`), and without the outer parens DuckDB's `//`
      // would bind into the `+` — a precedence bug the old inner-join
      // lookup silently masked by dropping the garbage-bucket cells
      val h52 = (e: String) =>
        s"(${h32(e)} * ${1L << 20} + (${h32b(e)} % ${1L << 20}))"
      s"""WITH t AS (SELECT unnest($toks) AS tok FROM documents),
         |h AS (SELECT ${h52("tok")} AS h52 FROM t),
         |rb AS (SELECT i, (h52 // (CAST(1 AS BIGINT) << ($CmsWBits * i))) % $CmsW AS bucket
         |       FROM h CROSS JOIN (SELECT unnest($is) AS i) g),
         |counters AS (SELECT i, bucket, CAST(count(*) AS BIGINT) AS cnt
         |             FROM rb GROUP BY 1, 2),
         |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact
         |        FROM t GROUP BY tok ORDER BY n_exact DESC, tok ASC LIMIT 20),
         |p AS (SELECT tok, n_exact, i,
         |        (${h52("tok")} // (CAST(1 AS BIGINT) << ($CmsWBits * i))) % $CmsW AS bucket
         |      FROM top CROSS JOIN (SELECT unnest($is) AS i) g)
         |SELECT p.tok, p.n_exact, min(coalesce(counters.cnt, 0)) AS n_est
         |FROM p LEFT JOIN counters USING (i, bucket)
         |GROUP BY 1, 2 ORDER BY tok""".stripMargin
    },

    "approx_ndv" -> {
      import graft.functions.Profiling.{HllM, HllMaxRank, HllP}
      s"""WITH t AS (SELECT source, unnest($toks) AS tok FROM documents),
         |h AS (SELECT source,
         |  ${h32("tok")} * ${1L << 20} + (${h32b("tok")} % ${1L << 20}) AS h52
         |FROM t),
         |r AS (SELECT source, h52 % $HllM AS bucket,
         |  CASE WHEN h52 // ${1L << HllP} = 0 THEN $HllMaxRank
         |       ELSE $HllMaxRank - length(format('{:b}', h52 // ${1L << HllP})) END AS rank
         |FROM h),
         |reg AS (SELECT source, bucket, max(rank) AS r FROM r GROUP BY source, bucket),
         |sk AS (SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_buckets_hit,
         |  CAST(sum(r) AS BIGINT) AS sum_rank,
         |  CAST(sum(CAST(1 AS BIGINT) << ($HllMaxRank - r)) AS BIGINT) AS z_scaled
         |FROM reg GROUP BY source),
         |ex AS (SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
         |       FROM t GROUP BY source)
         |SELECT sk.source, n_buckets_hit, sum_rank, z_scaled, n_exact
         |FROM sk JOIN ex ON sk.source = ex.source
         |ORDER BY sk.source""".stripMargin
    },

    // epoch-aware mixture: integer budgets B_s = w·2·grand div Σw,
    // full epochs q = B div T, fractional epoch = hash-ordered prefix
    // covering r = B mod T — all integer arithmetic, exclusive-prefix
    // window mirrored ROWS ... 1 PRECEDING; every sub-expression
    // parenthesized before // (the round-10 interpolation lesson)
    "mix_epochs" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    ${h32("CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |ps AS (SELECT source, sum(n_tokens) AS t_tokens,
         |    (CAST(substring(source, 4) AS BIGINT) % 5) + 1 AS w
         |  FROM d GROUP BY source),
         |tot AS (SELECT sum(t_tokens) AS grand, sum(w) AS tw FROM ps),
         |bud AS (SELECT source,
         |    ((w * 2 * grand) // tw) // t_tokens AS q,
         |    ((w * 2 * grand) // tw) % t_tokens AS r
         |  FROM ps, tot),
         |c AS (SELECT doc_id, source, n_tokens, hk,
         |    COALESCE(sum(n_tokens) OVER (
         |      PARTITION BY source ORDER BY hk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
         |  FROM d)
         |SELECT c.doc_id, c.source, c.n_tokens,
         |  CAST(b.q + CASE WHEN c.cum_prev < b.r THEN 1 ELSE 0 END AS BIGINT)
         |    AS n_repeats
         |FROM c JOIN bud b ON c.source = b.source
         |ORDER BY c.doc_id""".stripMargin,

    // greedy k-center: the ONE oracle that replays an iterative
    // algorithm end to end — each greedy step is a CTE pair (min
    // distance to the selected set, argmax pick), chained k−1 times;
    // every pairwise distance rounds to the same 1e-6 grid as the
    // Spark side, so the argmax decisions are bit-identical
    "sample_kcenter" -> {
      import graft.functions.Similarity.KcenterK
      val dotCS =
        """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list_transform(range(len(c.embedding)), i -> CAST(c.embedding[i+1] AS DOUBLE) * CAST(s.embedding[i+1] AS DOUBLE))),
          |      (a, b) -> a + b)""".stripMargin
      // every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
      // an inlined k-step chain (each level referencing the previous
      // 3×) re-evaluates the distance folds exponentially — the
      // un-materialized form ran minutes, materialized it's instant
      val iters = (2 to KcenterK).map { i =>
        s"""d$i AS MATERIALIZED (SELECT c.vec_id, c.embedding, c.nrm,
           |  min(1 - round($dotCS / (c.nrm * s.nrm), 6)) AS d
           |  FROM e c, s${i - 1} s
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM s${i - 1})
           |  GROUP BY c.vec_id, c.embedding, c.nrm),
           |p$i AS MATERIALIZED (SELECT $i AS rank, vec_id, embedding, nrm, d AS sel_dist
           |  FROM d$i ORDER BY d DESC, vec_id LIMIT 1),
           |s$i AS MATERIALIZED (SELECT * FROM s${i - 1} UNION ALL SELECT * FROM p$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
         |      (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |s1 AS MATERIALIZED (SELECT 1 AS rank, vec_id, embedding, nrm,
         |       CAST(2.0 AS DOUBLE) AS sel_dist
         |       FROM e ORDER BY vec_id LIMIT 1),
         |$iters
         |SELECT CAST(rank AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id,
         |  sel_dist
         |FROM s$KcenterK ORDER BY rank""".stripMargin
    },

    // KMV/theta sketch: the k-min sets are exact BIGINTs, so the oracle
    // replicates the ENTIRE sketch state — per-set k smallest distinct
    // h52, union merge from the k-sets alone, shared-value Jaccard
    // numerator on the union row
    "approx_distinct_kmv" -> {
      import graft.functions.Profiling.KmvK
      s"""WITH base AS (
         |  SELECT CASE WHEN year(o_orderdate) = 1996 THEN 'a' ELSE 'b' END AS set_id,
         |         CAST(o_custkey AS VARCHAR) AS ck
         |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
         |h AS (SELECT DISTINCT set_id,
         |  ${h32("ck")} * ${1L << 20} + (${h32b("ck")} % ${1L << 20}) AS h
         |FROM base),
         |km AS (SELECT set_id, h FROM (
         |  SELECT set_id, h,
         |    row_number() OVER (PARTITION BY set_id ORDER BY h) AS rn FROM h)
         |  WHERE rn <= $KmvK),
         |uk AS (SELECT 'union' AS set_id, h FROM (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rn
         |  FROM (SELECT DISTINCT h FROM km))
         |  WHERE rn <= $KmvK),
         |sh AS (SELECT count(*) AS n_shared FROM uk
         |       WHERE h IN (SELECT ka.h FROM
         |         (SELECT h FROM km WHERE set_id = 'a') ka
         |         JOIN (SELECT h FROM km WHERE set_id = 'b') kb
         |           ON ka.h = kb.h)),
         |allk AS (SELECT * FROM km UNION ALL SELECT * FROM uk),
         |sk AS (SELECT set_id, CAST(count(*) AS BIGINT) AS n_vals,
         |       CAST(max(h) AS BIGINT) AS kth_val FROM allk GROUP BY set_id),
         |ex AS (SELECT set_id, CAST(count(DISTINCT ck) AS BIGINT) AS n_exact
         |       FROM base GROUP BY set_id
         |       UNION ALL
         |       SELECT 'union', CAST(count(DISTINCT ck) AS BIGINT) FROM base)
         |SELECT sk.set_id, n_vals, kth_val, n_exact,
         |  CAST(CASE WHEN sk.set_id = 'union' THEN sh.n_shared ELSE 0 END
         |    AS BIGINT) AS n_shared
         |FROM sk JOIN ex ON sk.set_id = ex.set_id, sh
         |ORDER BY sk.set_id""".stripMargin
    },

    // HLL set algebra: same register construction as approx_ndv over
    // two order-year customer sets, with the union's registers derived
    // by the SAME per-bucket max full-outer merge the Spark side runs
    // (rank >= 1, so -1 is a safe absent-bucket sentinel)
    "approx_ndv_overlap" -> {
      import graft.functions.Profiling.{HllM, HllMaxRank, HllP}
      s"""WITH base AS (
         |  SELECT CASE WHEN year(o_orderdate) = 1996 THEN 'a' ELSE 'b' END AS set_id,
         |         CAST(o_custkey AS VARCHAR) AS ck
         |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)),
         |h AS (SELECT set_id,
         |  ${h32("ck")} * ${1L << 20} + (${h32b("ck")} % ${1L << 20}) AS h52
         |FROM base),
         |r AS (SELECT set_id, h52 % $HllM AS bucket,
         |  CASE WHEN h52 // ${1L << HllP} = 0 THEN $HllMaxRank
         |       ELSE $HllMaxRank - length(format('{:b}', h52 // ${1L << HllP})) END AS rank
         |FROM h),
         |reg AS (SELECT set_id, bucket, max(rank) AS r FROM r GROUP BY set_id, bucket),
         |mreg AS (
         |  SELECT 'union' AS set_id,
         |         COALESCE(ra.bucket, rb.bucket) AS bucket,
         |         greatest(COALESCE(ra.r, -1), COALESCE(rb.r, -1)) AS r
         |  FROM (SELECT bucket, r FROM reg WHERE set_id = 'a') ra
         |  FULL JOIN (SELECT bucket, r FROM reg WHERE set_id = 'b') rb
         |    ON ra.bucket = rb.bucket),
         |allreg AS (SELECT * FROM reg UNION ALL SELECT * FROM mreg),
         |sk AS (SELECT set_id,
         |  CAST(count(*) AS BIGINT) AS n_buckets_hit,
         |  CAST(sum(r) AS BIGINT) AS sum_rank,
         |  CAST(sum(CAST(1 AS BIGINT) << ($HllMaxRank - r)) AS BIGINT) AS z_scaled
         |FROM allreg GROUP BY set_id),
         |ex AS (SELECT set_id, CAST(count(DISTINCT ck) AS BIGINT) AS n_exact
         |       FROM base GROUP BY set_id
         |       UNION ALL
         |       SELECT 'union', CAST(count(DISTINCT ck) AS BIGINT) FROM base)
         |SELECT sk.set_id, n_buckets_hit, sum_rank, z_scaled, n_exact
         |FROM sk JOIN ex ON sk.set_id = ex.set_id
         |ORDER BY sk.set_id""".stripMargin
    },

    // integer-exact equi-width histogram mirror: same scaled-cent
    // values, same `div` bucket rule, same ceil-edge formula — all
    // BIGINT math, so bucket boundaries agree bit-for-bit
    "column_histogram" -> {
      import graft.functions.Profiling.HistogramBuckets
      val B = HistogramBuckets
      val branches = graft.functions.Profiling.ProfileColumns
        .map(c =>
          s"SELECT '$c' AS column_name, CAST(round($c * 100) AS BIGINT) AS vi FROM lineitem")
        .mkString("\n|  UNION ALL ")
      s"""WITH v AS (
         |  $branches),
         |nn AS (SELECT column_name, vi FROM v WHERE vi IS NOT NULL),
         |st AS (SELECT column_name, min(vi) AS mini, max(vi) AS maxi
         |       FROM nn GROUP BY 1),
         |b AS (SELECT nn.column_name,
         |        ((vi - mini) * $B) // (maxi - mini + 1) AS bucket, mini, maxi
         |      FROM nn JOIN st USING (column_name))
         |SELECT column_name, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(mini + ((bucket * (maxi - mini + 1) + ${B - 1}) // $B) AS BIGINT) AS lo_cents,
         |  CAST(mini + (((bucket + 1) * (maxi - mini + 1) + ${B - 1}) // $B) - 1 AS BIGINT) AS hi_cents,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM b GROUP BY column_name, bucket, mini, maxi
         |ORDER BY column_name, bucket""".stripMargin
    },

    // equi-depth mirror: same scaled cents, same (rn−1)·B div n bucket
    // formula over the per-column value sort; per-bucket min/max/count
    // are multiset properties of the sorted sequence, so arbitrary tie
    // splits cannot diverge the engines
    "column_histogram_depth" -> {
      import graft.functions.Profiling.HistogramBuckets
      val B = HistogramBuckets
      val branches = graft.functions.Profiling.ProfileColumns
        .map(c =>
          s"SELECT '$c' AS column_name, CAST(round($c * 100) AS BIGINT) AS vi FROM lineitem")
        .mkString("\n|  UNION ALL ")
      s"""WITH v AS (
         |  $branches),
         |nn AS (SELECT column_name, vi FROM v WHERE vi IS NOT NULL),
         |ct AS (SELECT column_name, count(*) AS n FROM nn GROUP BY 1),
         |r AS (SELECT column_name, vi,
         |        row_number() OVER (PARTITION BY column_name ORDER BY vi) AS rn
         |      FROM nn),
         |b AS (SELECT r.column_name, vi, ((rn - 1) * $B) // n AS bucket
         |      FROM r JOIN ct USING (column_name))
         |SELECT column_name, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(min(vi) AS BIGINT) AS lo_cents,
         |  CAST(max(vi) AS BIGINT) AS hi_cents,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM b GROUP BY column_name, bucket
         |ORDER BY column_name, bucket""".stripMargin
    },

    // sort-free equi-depth mirror: the oracle states the SEMANTICS
    // (boundary t_j = value at rank ceil(n·j/B); bucket = #{t_j < v},
    // range rule, whole tie groups) with its own sort — the Spark side
    // proves the band-refinement plan computes the same values WITHOUT
    // one. Bucket depends only on (column, value), so it's computed per
    // DISTINCT value and joined back (row multiplicity preserved).
    "column_histogram_depth_band" -> {
      import graft.functions.Profiling.HistogramBuckets
      val B = HistogramBuckets
      val branches = graft.functions.Profiling.ProfileColumns
        .map(c =>
          s"SELECT '$c' AS column_name, CAST(round($c * 100) AS BIGINT) AS vi FROM lineitem")
        .mkString("\n|  UNION ALL ")
      val js = (1 until B).map(j => s"($j)").mkString(", ")
      s"""WITH v AS (
         |  $branches),
         |nn AS (SELECT column_name, vi FROM v WHERE vi IS NOT NULL),
         |ct AS (SELECT column_name, count(*) AS n FROM nn GROUP BY 1),
         |r AS (SELECT column_name, vi,
         |        row_number() OVER (PARTITION BY column_name ORDER BY vi) AS rn
         |      FROM nn),
         |bd AS (SELECT r.column_name, j.jj, r.vi AS t
         |       FROM r JOIN ct USING (column_name)
         |       JOIN (VALUES $js) AS j(jj)
         |         ON r.rn = (ct.n * j.jj + ${B - 1}) // $B),
         |dv AS (SELECT DISTINCT column_name, vi FROM nn),
         |ab AS (SELECT dv.column_name, dv.vi, count(bd.jj) AS bucket
         |       FROM dv LEFT JOIN bd
         |         ON bd.column_name = dv.column_name AND dv.vi > bd.t
         |       GROUP BY dv.column_name, dv.vi),
         |a AS (SELECT nn.column_name, nn.vi, ab.bucket
         |      FROM nn JOIN ab USING (column_name, vi))
         |SELECT column_name, CAST(bucket AS BIGINT) AS bucket,
         |  CAST(min(vi) AS BIGINT) AS lo_cents,
         |  CAST(max(vi) AS BIGINT) AS hi_cents,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM a GROUP BY column_name, bucket
         |ORDER BY column_name, bucket""".stripMargin
    },

    // winsorization: quantile_cont thresholds (bit-equal to the band
    // machinery per the q28/q38 pins); interior sum BIGINT; the two
    // tails contribute single count×threshold products — no per-row
    // float accumulation on either engine
    "column_winsorize" ->
      s"""WITH o AS (
         |  SELECT o_orderpriority AS grp,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |p AS (SELECT grp, quantile_cont(cents, 0.01) AS p01,
         |    quantile_cont(cents, 0.99) AS p99
         |  FROM o GROUP BY 1),
         |a AS (SELECT o.grp, count(*) AS n,
         |    sum(CASE WHEN cents < p01 THEN 1 ELSE 0 END) AS n_low,
         |    sum(CASE WHEN cents > p99 THEN 1 ELSE 0 END) AS n_high,
         |    sum(CASE WHEN cents >= p01 AND cents <= p99 THEN cents
         |        ELSE 0 END) AS sum_mid,
         |    max(p01) AS p01, max(p99) AS p99
         |  FROM o JOIN p USING (grp) GROUP BY 1)
         |SELECT grp, CAST(n AS BIGINT) AS n,
         |  CAST(n_low AS BIGINT) AS n_low, CAST(n_high AS BIGINT) AS n_high,
         |  CAST(round(sum_mid + n_low * p01 + n_high * p99) AS BIGINT)
         |    AS winsor_sum_cents,
         |  round(p01, 4) AS p01_cents, round(p99, 4) AS p99_cents
         |FROM a ORDER BY grp""".stripMargin,

    "column_profile" -> {
      val branches = graft.functions.Profiling.ProfileColumns
        .map(c => s"SELECT '$c' AS column_name, CAST($c AS DOUBLE) AS v FROM lineitem")
        .mkString("\n|  UNION ALL ")
      s"""WITH v AS (
         |  $branches)
         |SELECT column_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
         |  min(v) AS min_v, max(v) AS max_v,
         |  CAST(sum(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
         |FROM v GROUP BY column_name ORDER BY column_name""".stripMargin
    },

    // sketch-NDV profile: flat stats + HLL register mirror of the Spark
    // side's two-level single-scan aggregate (values identical; DuckDB
    // need not mirror the partial-agg shape). Hash key is the scaled
    // INTEGER string of the ≤2-decimal values — engine-stable where
    // double→VARCHAR formatting is not.
    "column_profile_approx" -> {
      import graft.functions.Profiling.{HllM, HllMaxRank, HllP}
      val branches = graft.functions.Profiling.ProfileColumns
        .map(c => s"SELECT '$c' AS column_name, CAST($c AS DOUBLE) AS v FROM lineitem")
        .mkString("\n|  UNION ALL ")
      val key = "CAST(CAST(round(v * 100) AS BIGINT) AS VARCHAR)"
      s"""WITH v AS (
         |  $branches),
         |dv AS (SELECT column_name, v FROM v WHERE v IS NOT NULL GROUP BY 1, 2),
         |h AS (SELECT column_name,
         |  CAST('0x' || substring(md5($key), 1, 13) AS BIGINT) AS h52
         |FROM dv),
         |r AS (SELECT column_name, h52 % $HllM AS bucket,
         |  CASE WHEN h52 // ${1L << HllP} = 0 THEN $HllMaxRank
         |       ELSE $HllMaxRank - length(format('{:b}', h52 // ${1L << HllP})) END AS rank
         |FROM h),
         |reg AS (SELECT column_name, bucket, max(rank) AS r FROM r GROUP BY 1, 2),
         |sk AS (SELECT column_name,
         |  CAST(count(*) AS BIGINT) AS n_buckets_hit,
         |  CAST(sum(r) AS BIGINT) AS sum_rank,
         |  CAST(sum(CAST(1 AS BIGINT) << ($HllMaxRank - r)) AS BIGINT) AS z_scaled
         |FROM reg GROUP BY 1),
         |st AS (SELECT column_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  min(v) AS min_v, max(v) AS max_v,
         |  CAST(sum(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
         |FROM v GROUP BY 1)
         |SELECT st.column_name, n_rows, n_null, min_v, max_v, sum_v,
         |  n_buckets_hit, sum_rank, z_scaled
         |FROM st JOIN sk USING (column_name)
         |ORDER BY column_name""".stripMargin
    },

    "pii_scrub" -> {
      val email = TextAnalysis.EmailPattern
      val ip = TextAnalysis.Ipv4Pattern
      val phone = TextAnalysis.PhonePattern
      s"""WITH c AS (
         |  SELECT doc_id,
         |    'user' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com ip 10.' ||
         |    CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 251 AS VARCHAR) || '.' ||
         |    CAST(doc_id % 97 AS VARCHAR) || ' tel +1-555-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text AS contact
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(contact, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(contact, '$ip')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(contact, '$phone')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(contact,
         |    '$email', '[EMAIL]', 'g'), '$ip', '[IP]', 'g'), '$phone', '[PHONE]', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(contact, '$email')) + len(regexp_extract_all(contact, '$ip'))
         |    + len(regexp_extract_all(contact, '$phone')) AS BIGINT) AS n_pii
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "quality_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |a AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
         |  CAST(len(list_distinct(list_transform(range(len(toks) - 1),
         |    i -> toks[i+1] || ' ' || toks[i+2]))) AS BIGINT) AS n_distinct_bigrams
         |FROM t),
         |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |c AS (SELECT doc_id, tok, count(*) AS cnt FROM e GROUP BY 1, 2),
         |r AS (SELECT doc_id, tok, cnt,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok ASC) AS rn FROM c),
         |j AS (
         |  SELECT a.doc_id, n_tokens, n_distinct, n_bigrams, n_distinct_bigrams,
         |    r.tok AS top_tok, CAST(r.cnt AS BIGINT) AS top_tok_n,
         |    round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
         |    round(CAST(r.cnt AS DOUBLE) / n_tokens, 6) AS top_tok_frac,
         |    CASE WHEN n_bigrams = 0 THEN 0.0
         |         ELSE round(CAST(n_bigrams - n_distinct_bigrams AS DOUBLE) / n_bigrams, 6)
         |    END AS dup_bigram_frac
         |  FROM a JOIN r ON a.doc_id = r.doc_id AND r.rn = 1)
         |SELECT doc_id, n_tokens, n_distinct, n_bigrams, n_distinct_bigrams,
         |  top_tok, top_tok_n, distinct_ratio, top_tok_frac, dup_bigram_frac,
         |  (distinct_ratio >= 0.45 AND top_tok_frac <= 0.12 AND dup_bigram_frac <= 0.05) AS keep
         |FROM j ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
         |SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT), list_transform(toks, s -> ${h32("s")})),
         |    (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint,
         |  CAST(len(toks) AS BIGINT) AS n_tokens
         |FROM t ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM corpus GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "dedup_jaccard" ->
      s"""WITH $nearCorpus,
         |$nearShingles,
         |$sizesAndInter
         |SELECT doc_a, doc_b,
         |  round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jacc
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $nearCorpus,
         |$nearShingles,
         |$lshCandidates,
         |$sizesAndInter
         |SELECT c.doc_a, c.doc_b,
         |  round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) AS jacc
         |FROM cand c
         |JOIN inter ON c.doc_a = inter.doc_a AND c.doc_b = inter.doc_b
         |JOIN sizes sa ON c.doc_a = sa.doc_id
         |JOIN sizes sb ON c.doc_b = sb.doc_id
         |WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5
         |ORDER BY c.doc_a, c.doc_b""".stripMargin,

    // edit-distance verify over the SAME shared candidate CTEs; both
    // engines run classic Levenshtein on the same ASCII corpus, and
    // the ppm ratio is non-negative BIGINT division (// == div)
    "dedup_editdist" -> {
      import graft.functions.Dedup.EditDupPpm
      s"""WITH $nearCorpus,
         |$nearShingles,
         |$lshCandidates
         |SELECT c.doc_a, c.doc_b,
         |  CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev,
         |  CAST((levenshtein(ta.text, tb.text) * 1000000)
         |    // greatest(length(ta.text), length(tb.text)) AS BIGINT)
         |    AS edit_ppm
         |FROM cand c
         |JOIN corpus ta ON c.doc_a = ta.doc_id
         |JOIN corpus tb ON c.doc_b = tb.doc_id
         |WHERE (levenshtein(ta.text, tb.text) * 1000000)
         |    // greatest(length(ta.text), length(tb.text)) <= $EditDupPpm
         |ORDER BY c.doc_a, c.doc_b""".stripMargin
    },

    // normalized-digest mirror: identical lower/strip/collapse/trim
    // chain (DuckDB needs the 'g' flag for replace-all; Spark replaces
    // all by default), identical md5 grouping
    "dedup_exact_normalized" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000000000000,
         |    upper(substring(text, 1, 12)) || substring(text, 13) || '  '
         |  FROM documents WHERE doc_id % 11 = 0),
         |n AS (SELECT doc_id,
         |  md5(trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))) AS dg
         |FROM corpus)
         |SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
         |FROM n GROUP BY dg ORDER BY doc_id""".stripMargin,

    // incremental dedup mirror: even ids = index, odd ids = incoming;
    // candidates = index×incoming (any order) ∪ incoming×incoming
    // (ordered); `inter` holds ordered pairs, so the verify join uses
    // least/greatest (Jaccard is symmetric)
    "dedup_incremental" ->
      s"""WITH $nearCorpus,
         |$nearShingles,
         |hs AS (SELECT doc_id, ${h32("s")} AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, j,
         |    min(((2 * j + 1) * h + 1000003 * j + 12345) % 2147483647) AS m
         |  FROM hs, range(64) t(j) GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |    sum(m * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END)) AS band_hash
         |  FROM mh GROUP BY doc_id, j // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash
         |   AND x.doc_id % 2 = 0 AND y.doc_id % 2 = 1
         |  UNION
         |  SELECT DISTINCT x.doc_id, y.doc_id
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash
         |   AND x.doc_id % 2 = 1 AND y.doc_id % 2 = 1 AND x.doc_id < y.doc_id),
         |$sizesAndInter,
         |verified AS (
         |  SELECT DISTINCT c.doc_b
         |  FROM cand c
         |  JOIN inter ON least(c.doc_a, c.doc_b) = inter.doc_a
         |            AND greatest(c.doc_a, c.doc_b) = inter.doc_b
         |  JOIN sizes sa ON c.doc_a = sa.doc_id
         |  JOIN sizes sb ON c.doc_b = sb.doc_id
         |  WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5)
         |SELECT d.doc_id,
         |  CASE WHEN v.doc_b IS NOT NULL THEN 'drop' ELSE 'keep' END AS action
         |FROM (SELECT doc_id FROM corpus WHERE doc_id % 2 = 1) d
         |LEFT JOIN verified v ON d.doc_id = v.doc_b
         |ORDER BY d.doc_id""".stripMargin,

    "dedup_drop_list" ->
      s"""WITH $nearCorpus,
         |$nearShingles,
         |hs AS (SELECT doc_id, ${h32("s")} AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, j,
         |    min(((2 * j + 1) * h + 1000003 * j + 12345) % 2147483647) AS m
         |  FROM hs, range(64) t(j) GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |    sum(m * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END)) AS band_hash
         |  FROM mh GROUP BY doc_id, j // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |$sizesAndInter,
         |verified AS (
         |  SELECT c.doc_b
         |  FROM cand c
         |  JOIN inter ON c.doc_a = inter.doc_a AND c.doc_b = inter.doc_b
         |  JOIN sizes sa ON c.doc_a = sa.doc_id
         |  JOIN sizes sb ON c.doc_b = sb.doc_id
         |  WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5)
         |SELECT doc_id,
         |  CASE WHEN doc_id IN (SELECT doc_b FROM verified) THEN 'drop' ELSE 'keep' END AS action
         |FROM corpus ORDER BY doc_id""".stripMargin,

    // transitive closure over the verified pairs: recursive CTE computes
    // min-reachable id per node == the component label min-propagation
    // converges to on the Spark side
    "dedup_components" ->
      s"""WITH RECURSIVE $nearCorpus,
         |$nearShingles,
         |hs AS (SELECT doc_id, ${h32("s")} AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, j,
         |    min(((2 * j + 1) * h + 1000003 * j + 12345) % 2147483647) AS m
         |  FROM hs, range(64) t(j) GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |    sum(m * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END)) AS band_hash
         |  FROM mh GROUP BY doc_id, j // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |$sizesAndInter,
         |verified AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c
         |  JOIN inter ON c.doc_a = inter.doc_a AND c.doc_b = inter.doc_b
         |  JOIN sizes sa ON c.doc_a = sa.doc_id
         |  JOIN sizes sb ON c.doc_b = sb.doc_id
         |  WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM verified
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM verified),
         |walk(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src),
         |comp AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS component
         |  FROM walk GROUP BY src)
         |SELECT c.doc_id,
         |  coalesce(m.component, c.doc_id) AS component,
         |  CASE WHEN coalesce(m.component, c.doc_id) = c.doc_id THEN 'keep' ELSE 'drop' END AS action
         |FROM corpus c LEFT JOIN comp m ON c.doc_id = m.doc_id
         |ORDER BY c.doc_id""".stripMargin,

    "sample_by_hash" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${h32("text")} % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    // per-language rates: en 50%, zh 25%, default 10% (the Spark side's
    // map-literal lookup rendered as CASE)
    "sample_stratified" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ${h32("text")} % 100 <
         |  CASE lang WHEN 'en' THEN 50 WHEN 'zh' THEN 25 ELSE 10 END
         |ORDER BY doc_id""".stripMargin,

    // exact-size reservoir semantics: the 40 smallest (h32(text), doc_id)
    // per language — the oracle ranks the full stratum, the Spark side
    // ranks only the candidate-bounded slice; winners are identical
    "sample_reservoir" ->
      s"""SELECT lang, rank, doc_id FROM (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${h32("text")}, doc_id) AS rank
         |  FROM documents)
         |WHERE rank <= 40
         |ORDER BY lang, rank""".stripMargin,

    // temperature mixing at α=0.5: per-stratum target = budget·w/Σw with
    // w = floor(sqrt(n)) — integer weights/totals/division so both engines
    // derive identical targets; selection = smallest (h32, doc_id) per lang
    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS n_rows FROM documents GROUP BY 1),
         |t AS (SELECT lang, n_rows,
         |        CAST(floor(sqrt(n_rows)) AS BIGINT) AS w FROM c),
         |tt AS (SELECT sum(w) AS tw FROM t),
         |tgt AS (SELECT lang, least(n_rows, w * 300 // tw) AS target FROM t, tt),
         |r AS (SELECT lang, doc_id,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY ${h32("text")}, doc_id) AS rank
         |      FROM documents)
         |SELECT r.lang, r.rank, r.doc_id
         |FROM r JOIN tgt ON r.lang = tgt.lang
         |WHERE r.rank <= tgt.target
         |ORDER BY r.lang, r.rank""".stripMargin,

    // systematic PPS mirror: same doc_id-ordered per-source cumulative
    // token axis, same integer crossing rule — selections agree
    // bit-for-bit (doc_id is unique, so the running sum's frame is
    // deterministic in both engines); the target interpolates
    // Dedup.PpsDefaultTarget, the same constant the Spark default uses
    "sample_pps" -> {
      val target = graft.functions.Dedup.PpsDefaultTarget
      s"""WITH d AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens
         |           FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |      FROM d),
         |t AS (SELECT source, sum(n_tokens) AS t FROM d GROUP BY 1)
         |SELECT c.source, doc_id, n_tokens
         |FROM c JOIN t USING (source)
         |WHERE (cum * $target) // t > ((cum - n_tokens) * $target) // t
         |ORDER BY c.source, doc_id""".stripMargin
    },

    // benchmark = first 8 tokens of every 13th doc; a doc is
    // quarantined when it shares >= 4 distinct 3-shingles with the
    // benchmark shingle set
    "text_boilerplate" -> {
      import graft.functions.Dedup.{BoilerplateDocFreq, BoilerplatePpm}
      s"""WITH tokd AS (SELECT doc_id, $toks AS toks FROM documents),
         |dsh AS (
         |  SELECT DISTINCT doc_id, s FROM (
         |    SELECT doc_id, unnest($shingleExpr) AS s FROM tokd) u),
         |hot AS (SELECT s FROM (
         |    SELECT s, count(*) AS df FROM dsh GROUP BY 1)
         |  WHERE df >= greatest($BoilerplateDocFreq,
         |    (SELECT count(*) FROM documents) // 100)),
         |tot AS (SELECT doc_id, count(*) AS n_shingles FROM dsh GROUP BY 1),
         |nh AS (SELECT doc_id, count(*) AS n_hot
         |  FROM dsh JOIN hot USING (s) GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(tot.n_shingles, 0) AS BIGINT) AS n_shingles,
         |  CAST(coalesce(nh.n_hot, 0) AS BIGINT) AS n_hot,
         |  CAST(CASE WHEN coalesce(tot.n_shingles, 0) = 0 THEN 0
         |    ELSE (coalesce(nh.n_hot, 0) * 1000000) // tot.n_shingles END
         |    AS BIGINT) AS boiler_ppm,
         |  CASE WHEN CAST(CASE WHEN coalesce(tot.n_shingles, 0) = 0 THEN 0
         |    ELSE (coalesce(nh.n_hot, 0) * 1000000) // tot.n_shingles END
         |    AS BIGINT) >= $BoilerplatePpm THEN 'flag' ELSE 'keep' END AS action
         |FROM documents d
         |LEFT JOIN tot ON d.doc_id = tot.doc_id
         |LEFT JOIN nh ON d.doc_id = nh.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "decontaminate" ->
      s"""WITH bench AS (
         |  SELECT array_to_string(list_slice($toks, 1, 8), ' ') AS text
         |  FROM documents WHERE doc_id % 13 = 0),
         |btokd AS (SELECT $toks AS toks FROM bench),
         |bsh AS (SELECT DISTINCT unnest($shingleExpr) AS s FROM btokd),
         |tokd AS (SELECT doc_id, $toks AS toks FROM documents),
         |dsh AS (
         |  SELECT DISTINCT doc_id, s FROM (
         |    SELECT doc_id, unnest($shingleExpr) AS s FROM tokd) u),
         |ov AS (
         |  SELECT doc_id, count(*) AS n_overlap
         |  FROM dsh JOIN bsh USING (s) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  CASE WHEN coalesce(ov.n_overlap, 0) >= 4
         |       THEN 'quarantine' ELSE 'keep' END AS action
         |FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Bloom mirror of decontaminate: position_i = (h32 + i·h32b) mod m
    // (Kirsch–Mitzenmacher double hashing, Dedup.BloomM/BloomK); a
    // shingle bloom-hits iff all k positions are in the benchmark's
    // position set — FPs are md5-deterministic, so both engines
    // over-count identically and n_bloom >= n_exact everywhere.
    "decontaminate_bloom" -> bloomDecontaminateSql,

    // the BITMAP production form: positions, set bits, and the all-k-hit
    // rule are identical to the set form, so the SAME oracle pins it —
    // the gate's evidence is that a 128 KB bitmap + codegen'd bit test
    // reproduces every count (and every false positive) bit-for-bit
    "decontaminate_bloom_bitmap" -> bloomDecontaminateSql,

    // THE Spark-side pattern, interpolated (engine-portable literal —
    // single source of truth; quotes doubled for SQL)
    "text_bpe_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len($toks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.BpePretokenPattern.replace("'", "''")}'))
         |    AS BIGINT) AS n_pretokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    // per-source running token total in doc_id order; admit while the
    // cumulative count including the doc fits the 1000-token budget
    "token_budget_mix" ->
      s"""SELECT doc_id, source,
         |  CAST(len($toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(len($toks)) OVER (
         |    PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens,
         |  CASE WHEN sum(len($toks)) OVER (
         |    PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 1000
         |    THEN 'admit' ELSE 'overflow' END AS action
         |FROM documents
         |ORDER BY doc_id""".stripMargin,

    // water-filling: sources sorted ascending, candidate level per
    // position, numerator-non-negative guard (division stays out of the
    // negative range where // and DIV disagree), min-idx selection,
    // all-admitted fallback — the Spark algebra replayed verbatim
    "token_budget_waterfill" ->
      s"""WITH t AS (
         |  SELECT source, CAST(sum(len($toks)) AS BIGINT) AS t
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(t) // 2 AS BIGINT) AS budget,
         |    CAST(count(*) AS BIGINT) AS n_src FROM t),
         |cand AS (SELECT source, t, budget, n_src,
         |    CAST(row_number() OVER (ORDER BY t, source) AS BIGINT) AS idx,
         |    CAST(sum(t) OVER (ORDER BY t, source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS prefix,
         |    CAST(coalesce(lag(t) OVER (ORDER BY t, source), 0) AS BIGINT)
         |      AS prev_t
         |  FROM t, tot),
         |lv AS (SELECT idx,
         |    CASE WHEN idx = n_src AND prefix <= budget THEN t
         |         ELSE (budget - (prefix - t)) // (n_src - idx + 1) END AS level
         |  FROM cand
         |  WHERE (budget >= prefix - t
         |      AND (budget - (prefix - t)) // (n_src - idx + 1) >= prev_t
         |      AND (budget - (prefix - t)) // (n_src - idx + 1) < t)
         |    OR (idx = n_src AND prefix <= budget)
         |  ORDER BY idx LIMIT 1)
         |SELECT source, t AS t_tokens,
         |  CAST(least(t, level) AS BIGINT) AS admitted,
         |  CAST(least(t, level) * 1000000 // t AS BIGINT) AS rate_ppm,
         |  CAST(level AS BIGINT) AS water_level
         |FROM cand, lv ORDER BY source""".stripMargin,

    // temperature token budgets: per-lang target = 8000·w/Σw with
    // w = floor(sqrt(stratum tokens)) — integer weights/total/division;
    // admission = running token sum vs the target
    "token_budget_temperature" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |tw AS (SELECT lang, sum(n_tokens) AS t_tokens FROM d GROUP BY 1),
         |wts AS (SELECT lang, CAST(floor(sqrt(t_tokens)) AS BIGINT) AS w FROM tw),
         |tt AS (SELECT sum(w) AS total FROM wts),
         |tgt AS (SELECT lang, CAST(w * 8000 // total AS BIGINT) AS target
         |        FROM wts, tt),
         |c AS (
         |  SELECT d.doc_id, d.lang, d.n_tokens,
         |    CAST(sum(d.n_tokens) OVER (PARTITION BY d.lang ORDER BY d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens,
         |    tgt.target
         |  FROM d JOIN tgt ON d.lang = tgt.lang)
         |SELECT doc_id, lang, n_tokens, cum_tokens, target,
         |  CASE WHEN cum_tokens <= target THEN 'admit' ELSE 'overflow' END AS action
         |FROM c ORDER BY doc_id""".stripMargin,

    "bm25_score" -> {
      import graft.functions.TextAnalysis.{Bm25B, Bm25K1, Bm25Query}
      val dfCols = Bm25Query.zipWithIndex.map { case (term, i) =>
        s"CAST(sum(CASE WHEN list_contains(toks, '$term') THEN 1 ELSE 0 END) AS DOUBLE) AS df_$i"
      }.mkString(",\n|              ")
      // parenthesization mirrors the Spark column expressions EXACTLY —
      // double arithmetic must run in the identical order to be
      // bit-identical before the final round
      val terms = Bm25Query.zipWithIndex.map { case (term, i) =>
        val tf = s"CAST(len(list_filter(toks, x -> x = '$term')) AS DOUBLE)"
        s"((n_docs - df_$i + 0.5) / (df_$i + 0.5)) * (($tf * ($Bm25K1 + 1.0)) / " +
          s"($tf + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * len / (sum_len / n_docs))))"
      }.mkString("\n|    + ")
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |l AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len FROM t),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |              CAST(sum(len) AS DOUBLE) AS sum_len,
         |              $dfCols
         |       FROM l)
         |SELECT doc_id, len AS n_tokens,
         |  round($terms, 6) AS score
         |FROM l, st
         |ORDER BY doc_id""".stripMargin
    },

    // query-likelihood LM ranking: the bm25 chain's toks/len CTEs with
    // the integer Dirichlet tail — every div is floor-vs-trunc-safe
    // (all operands non-negative), so the ppb scores hash exactly
    "retrieval_qlm" -> {
      import graft.functions.TextAnalysis.{Bm25Query, QlmMu}
      val cfCols = Bm25Query.zipWithIndex.map { case (term, i) =>
        s"CAST(sum(len(list_filter(toks, x -> x = '$term'))) AS BIGINT) AS cf_$i"
      }.mkString(",\n|              ")
      val terms = Bm25Query.zipWithIndex.map { case (term, i) =>
        val tf = s"CAST(len(list_filter(toks, x -> x = '$term')) AS BIGINT)"
        s"($tf * 1000000000) // (len + $QlmMu) + " +
          s"($QlmMu * ((cf_$i * 1000000) // c_total) * 1000) // (len + $QlmMu)"
      }.mkString("\n|    + ")
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |l AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS len FROM t),
         |st AS (SELECT CAST(sum(len) AS BIGINT) AS c_total,
         |              $cfCols
         |       FROM l)
         |SELECT doc_id, len AS n_tokens,
         |  CAST($terms AS BIGINT) AS qlm_ppb
         |FROM l, st
         |ORDER BY doc_id""".stripMargin
    },

    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens
         |           FROM documents),
         |o AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          - n_tokens AS start_offset
         |      FROM t)
         |SELECT source, start_offset // ${TextAnalysis.PackSeqLen} AS seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM o GROUP BY source, start_offset // ${TextAnalysis.PackSeqLen}
         |ORDER BY source, seq_id""".stripMargin,

    // TRAINED BPE (learned merges, not the pretoken proxy): per-doc
    // token counts under the corpus-trained merge table — see [[bpeCtes]]
    "text_bpe_trained" ->
      s"""WITH $bpeCtes,
         |agg AS (
         |  SELECT doc_id, count(*) AS n_pretokens, sum(n_sub) AS n_bpe_trained
         |  FROM pre JOIN lens USING (w) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(agg.n_pretokens, 0) AS BIGINT) AS n_pretokens,
         |  CAST(coalesce(agg.n_bpe_trained, 0) AS BIGINT) AS n_bpe_trained
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // budget admission in TRAINED-token units: the bpe chain's per-doc
    // counts under the token_budget_mix window rule
    "token_budget_trained" -> {
      val budget = TextAnalysis.TrainedBudget
      s"""WITH $bpeCtes,
         |agg AS (
         |  SELECT doc_id, sum(n_sub) AS n_bpe_trained
         |  FROM pre JOIN lens USING (w) GROUP BY doc_id),
         |c AS (
         |  SELECT d.doc_id, d.source,
         |    CAST(coalesce(agg.n_bpe_trained, 0) AS BIGINT) AS n_bpe_trained
         |  FROM documents d LEFT JOIN agg USING (doc_id))
         |SELECT doc_id, source, n_bpe_trained,
         |  CAST(sum(n_bpe_trained) OVER (
         |    PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens,
         |  CASE WHEN sum(n_bpe_trained) OVER (
         |    PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= $budget
         |    THEN 'admit' ELSE 'overflow' END AS action
         |FROM c ORDER BY doc_id""".stripMargin
    },

    // per-source tokenizer-fit card: the bpe chain's per-doc counts
    // rolled to one row per source, compression + fertility in exact
    // integer ppm (non-negative numerators: // == div)
    "report_tokenizer_card" ->
      s"""WITH $bpeCtes,
         |agg AS (
         |  SELECT doc_id, count(*) AS n_pretokens, sum(n_sub) AS n_bpe
         |  FROM pre JOIN lens USING (w) GROUP BY doc_id),
         |c AS (
         |  SELECT d.source, length(d.text) AS n_chars,
         |    coalesce(agg.n_pretokens, 0) AS np, coalesce(agg.n_bpe, 0) AS nb
         |  FROM documents d LEFT JOIN agg USING (doc_id)),
         |g AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |    CAST(sum(np) AS BIGINT) AS n_pretokens,
         |    CAST(sum(nb) AS BIGINT) AS n_bpe_trained
         |  FROM c GROUP BY 1)
         |SELECT source, n_docs, n_chars, n_pretokens, n_bpe_trained,
         |  (n_chars * 1000000) // greatest(n_bpe_trained, 1) AS chars_per_token_ppm,
         |  (n_bpe_trained * 1000000) // greatest(n_pretokens, 1) AS fertility_ppm
         |FROM g ORDER BY source""".stripMargin,

    // the merge table itself: pins the TRAINER (tie rule included)
    "text_bpe_merges" -> {
      val ranks = (1 to TextAnalysis.BpeMerges).map { i =>
        s"SELECT CAST($i AS BIGINT) AS merge_rank, l AS lhs, r AS rhs FROM best$i"
      }.mkString("\n  UNION ALL ")
      s"""WITH $bpeCtes
         |SELECT * FROM (
         |  $ranks)
         |ORDER BY merge_rank""".stripMargin
    },

    // cross-source shared-shingle matrix: distinct (source, md5-pair)
    // self-join, containment vs the smaller source
    "report_source_overlap" ->
      s"""WITH tokd AS (SELECT source, $toks AS toks FROM documents),
         |ssh AS (
         |  SELECT DISTINCT source, ${h32("s")} AS h1, ${h32b("s")} AS h2
         |  FROM (SELECT source, unnest($shingleExpr) AS s FROM tokd) u),
         |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |        FROM ssh GROUP BY 1),
         |pr AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM ssh a JOIN ssh b
         |    ON a.h1 = b.h1 AND a.h2 = b.h2 AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT pr.src_a, pr.src_b, ca.n AS n_a, cb.n AS n_b, pr.n_shared,
         |  CAST((pr.n_shared * 1000000) // least(ca.n, cb.n) AS BIGINT)
         |    AS contain_ppm
         |FROM pr
         |JOIN cnt ca ON pr.src_a = ca.source
         |JOIN cnt cb ON pr.src_b = cb.source
         |ORDER BY pr.src_a, pr.src_b""".stripMargin,

    // per-source data card over the same stage CTEs: token mass +
    // gate rejection counts + survivors
    "report_source_card" ->
      s"""WITH $curationCtes,
         |toksrc AS (
         |  SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |card AS (
         |  SELECT t.source,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN q.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_quality_fail,
         |    CAST(sum(CASE WHEN e.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_non_en,
         |    CAST(sum(CASE WHEN x.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_exact_dup,
         |    CAST(sum(CASE WHEN nk.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_near_dup,
         |    CAST(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_quarantined
         |  FROM toksrc t
         |  LEFT JOIN quality q USING (doc_id)
         |  LEFT JOIN english e USING (doc_id)
         |  LEFT JOIN exact_keep x USING (doc_id)
         |  LEFT JOIN near_keep nk USING (doc_id)
         |  LEFT JOIN clean c USING (doc_id)
         |  GROUP BY 1),
         |cur AS (SELECT source, CAST(count(*) AS BIGINT) AS n_curated
         |        FROM curated GROUP BY 1)
         |SELECT card.*, CAST(coalesce(cur.n_curated, 0) AS BIGINT) AS n_curated
         |FROM card LEFT JOIN cur USING (source)
         |ORDER BY source""".stripMargin,

    // END-TO-END composition gate: the full curation CTE chain
    // intersected — see [[curationCtes]]
    "curation_pipeline" ->
      s"""WITH $curationCtes
         |SELECT doc_id, lang, source, fingerprint FROM curated
         |ORDER BY doc_id""".stripMargin,

    // terminal packing over the SURVIVORS: same pack_sequences geometry,
    // offsets re-derived over the curated corpus
    "curation_packed" ->
      s"""WITH $curationCtes,
         |pt AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens
         |       FROM curated),
         |po AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          - n_tokens AS start_offset
         |      FROM pt)
         |SELECT source, start_offset // ${TextAnalysis.PackSeqLen} AS seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  min(doc_id) AS first_doc,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM po GROUP BY source, start_offset // ${TextAnalysis.PackSeqLen}
         |ORDER BY source, seq_id""".stripMargin,

    "chunk_overlap" -> {
      val len = TextAnalysis.ChunkLen
      val stride = TextAnalysis.ChunkStride
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |n AS (SELECT doc_id, toks,
         |        CAST(ceil(CAST(greatest(len(toks) - ${len - stride}, 1) AS DOUBLE)
         |          / $stride.0) AS BIGINT) AS nc
         |      FROM t),
         |c AS (SELECT doc_id, unnest(range(nc)) AS chunk_id, toks FROM n),
         |ch AS (SELECT doc_id, chunk_id,
         |         list_slice(toks, chunk_id * $stride + 1, chunk_id * $stride + $len) AS chunk
         |       FROM c)
         |SELECT doc_id, chunk_id,
         |  CAST(len(chunk) AS BIGINT) AS n_tokens,
         |  ${h32("array_to_string(chunk, ' ')")} AS chunk_hash
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin
    },

    "dedup_simhash" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         |$nearShingles,
         |hh AS (SELECT doc_id, ${h32("s")} AS h1, ${h32b("s")} AS h2 FROM sh),
         |bits AS (
         |  SELECT doc_id, j,
         |    sum(CASE WHEN (h1 // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v1,
         |    sum(CASE WHEN (h2 // CAST(pow(2, j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS v2
         |  FROM hh, range(32) t(j) GROUP BY doc_id, j)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN v2 > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash_hi,
         |  CAST(sum(CASE WHEN v1 > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash_lo
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_lines" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, '${Dedup.BoilerplateLine} ' || text AS text
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id + ${Dedup.LineDupOffset},
         |         '${Dedup.BoilerplateLine} ' || text
         |  FROM documents WHERE doc_id % 10 = 0),
         |tokd AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
         |FROM corpus),
         |numbered AS (
         |  SELECT doc_id,
         |         unnest(range(CAST(ceil(len(toks) / ${Dedup.LineChunk}.0) AS BIGINT))) AS pos,
         |         toks
         |  FROM tokd),
         |lins AS (
         |  SELECT doc_id, pos,
         |         array_to_string(list_slice(toks,
         |           pos * ${Dedup.LineChunk} + 1,
         |           pos * ${Dedup.LineChunk} + ${Dedup.LineChunk}), ' ') AS line
         |  FROM numbered
         |  WHERE length(array_to_string(list_slice(toks,
         |           pos * ${Dedup.LineChunk} + 1,
         |           pos * ${Dedup.LineChunk} + ${Dedup.LineChunk}), ' ')) > 0),
         |winners AS (SELECT line, min((doc_id << 20) + pos) AS win FROM lins GROUP BY line)
         |SELECT win >> 20 AS doc_id,
         |       CAST(count(*) AS BIGINT) AS n_kept,
         |       string_agg(line, ' ' ORDER BY win & 1048575) AS text_dedup
         |FROM winners
         |GROUP BY win >> 20
         |ORDER BY doc_id""".stripMargin,

    // substring-level span dedup over the near-dup corpus: 8-token spans,
    // first occurrence (min packed doc*2^SpanGatePosBits+pos slot)
    // canonical; per doc the span count, duplicated-span count, and
    // duplicated fraction. Matches the Spark side's (h1,h2) span keys +
    // packed winner slots at the gate's bit split.
    "dedup_spans" ->
      s"""WITH $nearCorpus,
         |tokd AS (SELECT doc_id, $toks AS toks FROM corpus),
         |occ0 AS (
         |  SELECT doc_id,
         |    unnest(range(greatest(len(toks) - 7, 1))) AS pos,
         |    unnest(list_transform(range(greatest(len(toks) - 7, 1)),
         |      i -> array_to_string(toks[i+1:i+8], ' '))) AS span
         |  FROM tokd),
         |occ AS (
         |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |    ${h32("span")} AS h1, ${h32b("span")} AS h2
         |  FROM occ0),
         |perdoc AS (
         |  SELECT h1, h2, doc_id, count(*) AS cnt,
         |    min(doc_id * ${1L << Dedup.SpanGatePosBits} + pos) AS first_here
         |  FROM occ GROUP BY 1, 2, 3),
         |winner AS (SELECT h1, h2, min(first_here) AS w FROM perdoc GROUP BY 1, 2)
         |SELECT p.doc_id,
         |  CAST(sum(p.cnt) AS BIGINT) AS n_spans,
         |  CAST(sum(p.cnt - CASE WHEN p.first_here = w.w THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  round(CAST(sum(p.cnt - CASE WHEN p.first_here = w.w THEN 1 ELSE 0 END) AS DOUBLE)
         |        / CAST(sum(p.cnt) AS DOUBLE), 6) AS dup_frac
         |FROM perdoc p JOIN winner w USING (h1, h2)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "ann_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qnorm FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnorm FROM e),
        |d AS (
        |  SELECT qid, cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(qv)), i -> CAST(qv[i+1] AS DOUBLE) * CAST(cv[i+1] AS DOUBLE))),
        |      (a, b) -> a + b) / (qnorm * cnorm), 6) AS sim
        |  FROM q, c WHERE qid <> cid),
        |r AS (SELECT qid, cid, sim,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
        |  FROM d)
        |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,

    // trained-PQ recall gate: the oracle asserts recall_ok=1 for every
    // query — the Spark side computes per-query recall of the trained
    // codebook's search against the (value-hashed) brute-force top-k and
    // thresholds at 4/5; any query under 0.8 flips a row to 0 and fails
    // the hash. k-means itself is deliberately NOT mirrored in SQL.
    "ann_pq_recall" ->
      s"""SELECT CAST(vec_id AS BIGINT) AS qid, CAST(1 AS BIGINT) AS recall_ok
         |FROM embeddings WHERE vec_id < ${Similarity.NQueryVectors}
         |ORDER BY qid""".stripMargin,

    // SemDeDup planted-pair gate: the oracle asserts dropped=1 for every
    // planted cosine-0.995 copy — a codebook whose top-2 cell
    // assignments separate a planted pair flips a row to 0 and fails
    // the hash. k-means is deliberately NOT mirrored in SQL (same
    // strategy as the trained ANN recall gates below); soundness and
    // brute-force exactness are pinned in SemanticDedupSpec.
    "dedup_semantic" ->
      s"""SELECT CAST(vec_id AS BIGINT) AS src_id, CAST(1 AS BIGINT) AS dropped
         |FROM embeddings WHERE vec_id % 9 = 0
         |ORDER BY src_id""".stripMargin,

    // trained-IVF recall gate, planted-near-dup form: the oracle asserts
    // dup_found=1 for every planted query — searching from each planted
    // copy (source ids 0,9,..,63) must surface its source in the top-k;
    // a codebook whose cells split a cosine-0.995 pair flips a row to 0
    // and fails the hash. k-means is deliberately NOT mirrored in SQL.
    "ann_ivf_recall" ->
      s"""SELECT CAST(vec_id AS BIGINT) AS src_id, CAST(1 AS BIGINT) AS dup_found
         |FROM embeddings
         |WHERE vec_id % 9 = 0 AND vec_id < ${9 * Similarity.NQueryVectors}
         |ORDER BY src_id""".stripMargin,

    // PQ mirror: 64-dim embeddings, M=8 sub-spaces of 8 dims (the inner
    // ranges/offsets hardcode sub=8 accordingly); argmin code = first
    // minimal centroid index (strict < scan), ADC = nested inner fold
    // per sub-space then outer fold over sub-spaces — both exactly the
    // Spark expressions' loop order
    "ann_pq" -> {
      val dotFold = (a: String, b: String) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))),
           |      (x, y) -> x + y)""".stripMargin
      s"""WITH c0 AS (
         |  SELECT vec_id, embedding, ${h32("CAST(vec_id AS VARCHAR)")} AS hk
         |  FROM embeddings ORDER BY hk, vec_id LIMIT ${Similarity.PqK}),
         |cents AS (
         |  SELECT embedding AS cv,
         |    CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS INTEGER) AS cidx
         |  FROM c0),
         |cl AS (SELECT list(cv ORDER BY cidx) AS cl FROM cents),
         |dists AS (
         |  SELECT e.vec_id, m.m, c.cidx,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(8), j ->
         |        (CAST(e.embedding[m.m*8+j+1] AS DOUBLE) - CAST(c.cv[m.m*8+j+1] AS DOUBLE))
         |        * (CAST(e.embedding[m.m*8+j+1] AS DOUBLE) - CAST(c.cv[m.m*8+j+1] AS DOUBLE)))),
         |      (a, b) -> a + b) AS dist
         |  FROM embeddings e, range(${Similarity.PqM}) m(m), cents c),
         |codes AS (
         |  SELECT vec_id, list(cidx ORDER BY m) AS codes FROM (
         |    SELECT vec_id, m, cidx,
         |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cidx ASC) AS rn
         |    FROM dists) WHERE rn = 1 GROUP BY vec_id),
         |q AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id < ${Similarity.NQueryVectors}),
         |adc AS (
         |  SELECT q.qid, v.vec_id AS cid, q.qv, v.embedding AS cv,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(${Similarity.PqM}), m ->
         |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(range(8), j ->
         |            CAST(q.qv[m*8+j+1] AS DOUBLE) * CAST(cl.cl[k.codes[m+1]+1][m*8+j+1] AS DOUBLE))),
         |          (a, b) -> a + b))),
         |      (x, y) -> x + y) AS adc
         |  FROM q CROSS JOIN cl CROSS JOIN embeddings v JOIN codes k ON v.vec_id = k.vec_id
         |  WHERE v.vec_id <> q.qid),
         |top AS (
         |  SELECT qid, cid, qv, cv,
         |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid ASC) AS arn
         |  FROM adc),
         |ref AS (
         |  SELECT qid, cid,
         |    round(${dotFold("qv", "cv")}
         |      / (sqrt(${dotFold("qv", "qv")}) * sqrt(${dotFold("cv", "cv")})), 6) AS sim
         |  FROM top WHERE arn <= ${Similarity.PqRefine}),
         |r AS (SELECT qid, cid, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
         |  FROM ref)
         |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin
    },

    // SQ8 mirror: integer-exact end-to-end — per-dim min/width trained
    // over the EScale-quantized corpus, levels = (le-mn)*255 // w (the
    // numerator is non-negative, so DuckDB's flooring // equals Spark's
    // truncating div), symmetric BIGINT reconstruction-dot pre-rank
    // (rec = mn·255 + level·w), then the exact top-Sq8Refine re-rank in
    // doubles — same loop orders as the Spark expressions
    "ann_sq8" -> {
      val dotFold = (a: String, b: String) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))),
           |      (x, y) -> x + y)""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * ${Similarity.PcaEScale}) AS BIGINT)) AS le
         |  FROM embeddings),
         |mm AS (
         |  SELECT i, min(le[i+1]) AS mn,
         |    greatest(max(le[i+1]) - min(le[i+1]), 1) AS w
         |  FROM e, range(${Similarity.PcaDim}) t(i) GROUP BY i),
         |ml AS (SELECT list(mn ORDER BY i) AS mn, list(w ORDER BY i) AS w FROM mm),
         |q8 AS (
         |  SELECT vec_id, embedding,
         |    list_transform(range(${Similarity.PcaDim}),
         |      i -> ((le[i+1] - ml.mn[i+1]) * ${Similarity.Sq8Levels}) // ml.w[i+1]) AS q8
         |  FROM e CROSS JOIN ml),
         |q AS (SELECT vec_id AS qid, q8 AS qq, embedding AS qv
         |      FROM q8 WHERE vec_id < ${Similarity.NQueryVectors}),
         |s AS (
         |  SELECT qid, c.vec_id AS cid, qv, c.embedding AS cv,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(${Similarity.PcaDim}), i ->
         |        (ml.mn[i+1] * ${Similarity.Sq8Levels} + qq[i+1] * ml.w[i+1])
         |        * (ml.mn[i+1] * ${Similarity.Sq8Levels} + c.q8[i+1] * ml.w[i+1]))),
         |      (x, y) -> x + y) AS s8
         |  FROM q, q8 c CROSS JOIN ml WHERE qid <> c.vec_id),
         |short AS (
         |  SELECT qid, cid, qv, cv,
         |    row_number() OVER (PARTITION BY qid ORDER BY s8 DESC, cid ASC) AS srn
         |  FROM s),
         |ref AS (
         |  SELECT qid, cid,
         |    round(${dotFold("qv", "cv")}
         |      / (sqrt(${dotFold("qv", "qv")}) * sqrt(${dotFold("cv", "cv")})), 6) AS sim
         |  FROM short WHERE srn <= ${Similarity.Sq8Refine}),
         |r AS (SELECT qid, cid, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
         |  FROM ref)
         |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= ${Similarity.TopK}
         |ORDER BY qid, rank""".stripMargin
    },

    // IVF-SQ8 composition: probe2's cell CTEs bound the candidates,
    // ann_sq8's quantization CTEs score them (integer reconstruction
    // dot), exact top-Sq8Refine re-rank — same loop orders as the two
    // component oracles (both independently hash-verified)
    "ann_ivf_sq8" -> {
      val dotFold = (a: String, b: String) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))),
           |      (x, y) -> x + y)""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
         |      (a, b) -> a + b)) AS nrm,
         |    list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * ${Similarity.PcaEScale}) AS BIGINT)) AS le
         |  FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm FROM e
         |      ORDER BY ${h32("CAST(vec_id AS VARCHAR)")}, vec_id
         |      LIMIT ${Similarity.IvfCodebookK}),
         |ac AS (
         |  SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
         |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(e.embedding)), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(c.cv[i+1] AS DOUBLE))),
         |      (x, y) -> x + y) / (e.nrm * c.cnrm), 6) AS csim
         |  FROM e, c),
         |a AS (
         |  SELECT vec_id, embedding, nrm, cent_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
         |  FROM ac),
         |asg AS (SELECT vec_id, embedding, cent_id AS cell FROM a WHERE arn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv, cent_id AS probe_cell
         |      FROM a WHERE arn <= 2 AND vec_id < ${Similarity.NQueryVectors}),
         |mm AS (
         |  SELECT i, min(le[i+1]) AS mn,
         |    greatest(max(le[i+1]) - min(le[i+1]), 1) AS w
         |  FROM e, range(${Similarity.PcaDim}) t(i) GROUP BY i),
         |ml AS (SELECT list(mn ORDER BY i) AS mn, list(w ORDER BY i) AS w FROM mm),
         |k8 AS (
         |  SELECT vec_id,
         |    list_transform(range(${Similarity.PcaDim}),
         |      i -> ((le[i+1] - ml.mn[i+1]) * ${Similarity.Sq8Levels}) // ml.w[i+1]) AS q8
         |  FROM e CROSS JOIN ml),
         |cand AS (
         |  SELECT q.qid, q.qv, asg.vec_id AS cid, asg.embedding AS cv
         |  FROM q JOIN asg ON q.probe_cell = asg.cell AND q.qid <> asg.vec_id),
         |s AS (
         |  SELECT cand.qid, cand.cid, cand.qv, cand.cv,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(${Similarity.PcaDim}), i ->
         |        (ml.mn[i+1] * ${Similarity.Sq8Levels} + kq.q8[i+1] * ml.w[i+1])
         |        * (ml.mn[i+1] * ${Similarity.Sq8Levels} + kc.q8[i+1] * ml.w[i+1]))),
         |      (x, y) -> x + y) AS s8
         |  FROM cand CROSS JOIN ml
         |  JOIN k8 kq ON cand.qid = kq.vec_id
         |  JOIN k8 kc ON cand.cid = kc.vec_id),
         |short AS (
         |  SELECT qid, cid, qv, cv,
         |    row_number() OVER (PARTITION BY qid ORDER BY s8 DESC, cid ASC) AS srn
         |  FROM s),
         |ref AS (
         |  SELECT qid, cid,
         |    round(${dotFold("qv", "cv")}
         |      / (sqrt(${dotFold("qv", "qv")}) * sqrt(${dotFold("cv", "cv")})), 6) AS sim
         |  FROM short WHERE srn <= ${Similarity.Sq8Refine}),
         |r AS (SELECT qid, cid, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
         |  FROM ref)
         |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= ${Similarity.TopK}
         |ORDER BY qid, rank""".stripMargin
    },

    // IVF-PQ composition: probe2's cell CTEs feed ann_pq's codes/ADC
    // CTEs — candidates restricted to each query's two probed cells,
    // ADC-ranked, top-PqRefine exactly re-scored. Same loop orders as
    // the component oracles (both independently hash-verified).
    "ann_ivf_pq" -> {
      val dotFold = (a: String, b: String) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE))),
           |      (x, y) -> x + y)""".stripMargin
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm FROM e
        |      ORDER BY ${h32("CAST(vec_id AS VARCHAR)")}, vec_id
        |      LIMIT ${Similarity.IvfCodebookK}),
        |ac AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(e.embedding)), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(c.cv[i+1] AS DOUBLE))),
        |      (x, y) -> x + y) / (e.nrm * c.cnrm), 6) AS csim
        |  FROM e, c),
        |a AS (
        |  SELECT vec_id, embedding, nrm, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |  FROM ac),
        |asg AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM a WHERE arn = 1),
        |q AS (SELECT vec_id AS qid, embedding AS qv, cent_id AS probe_cell
        |      FROM a WHERE arn <= 2 AND vec_id < ${Similarity.NQueryVectors}),
        |pq0 AS (
        |  SELECT vec_id, embedding, ${h32("CAST(vec_id AS VARCHAR)")} AS hk
        |  FROM embeddings ORDER BY hk, vec_id LIMIT ${Similarity.PqK}),
        |pqc AS (
        |  SELECT embedding AS cv,
        |    CAST(row_number() OVER (ORDER BY hk, vec_id) - 1 AS INTEGER) AS cidx
        |  FROM pq0),
        |cl AS (SELECT list(cv ORDER BY cidx) AS cl FROM pqc),
        |dists AS (
        |  SELECT e2.vec_id, m.m, pc.cidx,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(8), j ->
        |        (CAST(e2.embedding[m.m*8+j+1] AS DOUBLE) - CAST(pc.cv[m.m*8+j+1] AS DOUBLE))
        |        * (CAST(e2.embedding[m.m*8+j+1] AS DOUBLE) - CAST(pc.cv[m.m*8+j+1] AS DOUBLE)))),
        |      (a, b) -> a + b) AS dist
        |  FROM embeddings e2, range(${Similarity.PqM}) m(m), pqc pc),
        |codes AS (
        |  SELECT vec_id, list(cidx ORDER BY m) AS codes FROM (
        |    SELECT vec_id, m, cidx,
        |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cidx ASC) AS rn
        |    FROM dists) WHERE rn = 1 GROUP BY vec_id),
        |cand AS (
        |  SELECT q.qid, q.qv, asg.vec_id AS cid, asg.embedding AS cv
        |  FROM q JOIN asg ON q.probe_cell = asg.cell AND q.qid <> asg.vec_id),
        |adc AS (
        |  SELECT cand.qid, cand.cid, cand.qv, cand.cv,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(${Similarity.PqM}), m ->
        |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(8), j ->
        |            CAST(cand.qv[m*8+j+1] AS DOUBLE) * CAST(cl.cl[k.codes[m+1]+1][m*8+j+1] AS DOUBLE))),
        |          (a, b) -> a + b))),
        |      (x, y) -> x + y) AS adc
        |  FROM cand CROSS JOIN cl JOIN codes k ON cand.cid = k.vec_id),
        |top AS (
        |  SELECT qid, cid, qv, cv,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid ASC) AS arn
        |  FROM adc),
        |ref AS (
        |  SELECT qid, cid,
        |    round(${dotFold("qv", "cv")}
        |      / (sqrt(${dotFold("qv", "qv")}) * sqrt(${dotFold("cv", "cv")})), 6) AS sim
        |  FROM top WHERE arn <= ${Similarity.PqRefine}),
        |r AS (SELECT qid, cid, sim,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
        |  FROM ref)
        |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin
    },

    "ann_lsh_bucketed" ->
      s"""WITH ${dimsCte("embeddings")},
        |e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm,
        |    $bucketExpr AS bucket
        |  FROM embeddings, dims),
        |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qnorm, bucket AS qbucket FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnorm, bucket FROM e),
        |d AS (
        |  SELECT qid, cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(qv)), i -> CAST(qv[i+1] AS DOUBLE) * CAST(cv[i+1] AS DOUBLE))),
        |      (a, b) -> a + b) / (qnorm * cnorm), 6) AS sim
        |  FROM q JOIN c ON qbucket = bucket AND qid <> cid),
        |r AS (SELECT qid, cid, sim,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
        |  FROM d)
        |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,

    "ann_lsh_multiprobe" ->
      s"""WITH ${dimsCte("embeddings")},
        |e AS (
        |  SELECT vec_id, embedding, d,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm,
        |    $bucketExpr AS bucket
        |  FROM embeddings, dims),
        |probes AS (
        |  SELECT vec_id AS qid, embedding AS qv, nrm AS qnorm,
        |    unnest(list_transform(range(d + 1),
        |      i -> CASE WHEN i = d THEN bucket ELSE xor(bucket, CAST(1 AS BIGINT) << i) END)) AS probe_bucket
        |  FROM e WHERE vec_id < 8),
        |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnorm, bucket FROM e),
        |d AS (
        |  SELECT qid, cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(qv)), i -> CAST(qv[i+1] AS DOUBLE) * CAST(cv[i+1] AS DOUBLE))),
        |      (a, b) -> a + b) / (qnorm * cnorm), 6) AS sim
        |  FROM probes JOIN c ON probe_bucket = bucket AND qid <> cid),
        |r AS (SELECT qid, cid, sim,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
        |  FROM d)
        |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,

    "multimodal_meta" ->
      s"""WITH t AS (SELECT doc_id, text, ${h32("text")} AS h FROM documents)
         |SELECT doc_id,
         |  (['img', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS format,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  32 + h % 97 AS width,
         |  24 + (h // 97) % 97 AS height
         |FROM t ORDER BY doc_id""".stripMargin,
  )

  /** Embedding near-dup corpus: embeddings ∪ perturbed copies of every
    * 9th vector (+0.1 on dim 0 in double, narrowed to float — the exact
    * IEEE sequence the Spark side performs). */
  private val embCorpus =
    """corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 3000000000000000,
      |    list_transform(range(len(embedding)),
      |      i -> CASE WHEN i = 0 THEN CAST(CAST(embedding[1] AS DOUBLE) + 0.1 AS FLOAT)
      |                ELSE embedding[i+1] END)
      |  FROM embeddings WHERE vec_id % 9 = 0)""".stripMargin

  /** Unrolled fixed-point power-iteration CTE chain shared by the two
    * embed_pca gates — one (d, s, y, m, x) block per round, every frame
    * MATERIALIZED (y is referenced twice per round; non-materialized
    * CTEs re-referenced each round explode exponentially — the BPE
    * trainer lesson). Divisions are sign-safe (abs // d) so DuckDB's
    * flooring `//` matches Spark's truncating `DIV` on negatives. */
  private def pcaIterCtes: String = {
    import graft.functions.Similarity.{PcaDim, PcaIters, PcaEScale, PcaXScale, PcaDotShift}
    val sb = new StringBuilder
    sb.append(
      s"""el AS MATERIALIZED (
         |  SELECT vec_id, label, j,
         |    CAST(round(CAST(embedding[j] AS DOUBLE) * $PcaEScale) AS BIGINT) AS e
         |  FROM embeddings, range(1, ${PcaDim + 1}) t(j)),
         |x0 AS (SELECT j, CAST($PcaXScale AS BIGINT) AS x
         |  FROM range(1, ${PcaDim + 1}) t(j))""".stripMargin)
    for (k <- 1 to PcaIters) {
      sb.append(",\n")
      sb.append(
        s"""d$k AS MATERIALIZED (
           |  SELECT vec_id, CAST(sum(e * x) AS BIGINT) AS dot
           |  FROM el JOIN x${k - 1} USING (j) GROUP BY vec_id),
           |s$k AS MATERIALIZED (SELECT vec_id,
           |  CASE WHEN dot < 0 THEN -((-dot) // $PcaDotShift)
           |       ELSE dot // $PcaDotShift END AS sdot FROM d$k),
           |y$k AS MATERIALIZED (
           |  SELECT j, CAST(sum(e * sdot) AS BIGINT) AS y
           |  FROM el JOIN s$k USING (vec_id) GROUP BY j),
           |m$k AS MATERIALIZED (SELECT greatest(max(abs(y)), 1) AS m FROM y$k),
           |x$k AS MATERIALIZED (SELECT j,
           |  CASE WHEN y < 0 THEN -CAST((CAST(-y AS HUGEINT) * $PcaXScale) // m AS BIGINT)
           |       ELSE CAST((CAST(y AS HUGEINT) * $PcaXScale) // m AS BIGINT) END AS x
           |  FROM y$k, m$k)""".stripMargin)
    }
    sb.toString
  }

  /** Unrolled top-m deflation chain for the embed_pca_topm gates: per
    * component the same (d, s, y, m, x) power blocks as [[pcaIterCtes]]
    * (component-prefixed names over frame el{c}), then the integer
    * deflation el{c+1}: e − sdiv(p·x, Σx²) with ONE sign-safe division
    * per element — the exact algebra
    * `Similarity.deflateFrame` performs, so the whole chain replays
    * bit-for-bit. Generated from the SAME config constants the Spark
    * side trains with. */
  private def pcaTopmCtes: String = {
    import graft.functions.Similarity.{
      PcaDim, PcaIters, PcaTopM, PcaEScale, PcaXScale, PcaDotShift}
    val sb = new StringBuilder
    sb.append(
      s"""el1 AS MATERIALIZED (
         |  SELECT vec_id, label, j,
         |    CAST(round(CAST(embedding[j] AS DOUBLE) * $PcaEScale) AS BIGINT) AS e
         |  FROM embeddings, range(1, ${PcaDim + 1}) t(j))""".stripMargin)
    for (c <- 1 to PcaTopM) {
      sb.append(",\n")
      sb.append(
        s"""xc${c}_0 AS (SELECT j, CAST($PcaXScale AS BIGINT) AS x
           |  FROM range(1, ${PcaDim + 1}) t(j))""".stripMargin)
      for (k <- 1 to PcaIters) {
        sb.append(",\n")
        sb.append(
          s"""dc${c}_$k AS MATERIALIZED (
             |  SELECT vec_id, CAST(sum(e * x) AS BIGINT) AS dot
             |  FROM el$c JOIN xc${c}_${k - 1} USING (j) GROUP BY vec_id),
             |sc${c}_$k AS MATERIALIZED (SELECT vec_id,
             |  CASE WHEN dot < 0 THEN -((-dot) // $PcaDotShift)
             |       ELSE dot // $PcaDotShift END AS sdot FROM dc${c}_$k),
             |yc${c}_$k AS MATERIALIZED (
             |  SELECT j, CAST(sum(e * sdot) AS BIGINT) AS y
             |  FROM el$c JOIN sc${c}_$k USING (vec_id) GROUP BY j),
             |mc${c}_$k AS MATERIALIZED (SELECT greatest(max(abs(y)), 1) AS m FROM yc${c}_$k),
             |xc${c}_$k AS MATERIALIZED (SELECT j,
             |  CASE WHEN y < 0 THEN -CAST((CAST(-y AS HUGEINT) * $PcaXScale) // m AS BIGINT)
             |       ELSE CAST((CAST(y AS HUGEINT) * $PcaXScale) // m AS BIGINT) END AS x
             |  FROM yc${c}_$k, mc${c}_$k)""".stripMargin)
      }
      if (c < PcaTopM) {
        sb.append(",\n")
        sb.append(
          s"""nn$c AS MATERIALIZED (
             |  SELECT CAST(sum(x * x) AS BIGINT) AS nn FROM xc${c}_$PcaIters),
             |p$c AS MATERIALIZED (
             |  SELECT vec_id, CAST(sum(e * x) AS BIGINT) AS p
             |  FROM el$c JOIN xc${c}_$PcaIters USING (j) GROUP BY vec_id),
             |el${c + 1} AS MATERIALIZED (
             |  SELECT e.vec_id, e.label, e.j,
             |    e.e - (CASE WHEN p.p * x.x < 0 THEN -((-(p.p * x.x)) // nn.nn)
             |                ELSE (p.p * x.x) // nn.nn END) AS e
             |  FROM el$c e
             |  JOIN p$c p USING (vec_id)
             |  JOIN xc${c}_$PcaIters x USING (j), nn$c nn)""".stripMargin)
      }
    }
    sb.toString
  }

  /** Unrolled fixed-point Lloyd chain for embed_kmeans — per round a
    * (d, a, g, c) block: pairwise integer distances, packed-min
    * assignment (dist·16 + cluster ties to the smaller id), per-cluster
    * sums, sign-safe truncating means with carry-forward for emptied
    * clusters. Every frame MATERIALIZED (each is re-referenced). */
  private def kmeansCtes: String = {
    import graft.functions.Similarity.{PcaDim, PcaEScale, KmeansK, KmeansIters}
    val sb = new StringBuilder
    sb.append(
      s"""el AS MATERIALIZED (
         |  SELECT vec_id, j,
         |    CAST(round(CAST(embedding[j] AS DOUBLE) * $PcaEScale) AS BIGINT) AS e
         |  FROM embeddings, range(1, ${PcaDim + 1}) t(j)),
         |c0 AS MATERIALIZED (
         |  SELECT vec_id AS cluster, j, e AS c FROM el WHERE vec_id < $KmeansK)""".stripMargin)
    for (k <- 1 to KmeansIters) {
      sb.append(",\n")
      sb.append(
        s"""d$k AS MATERIALIZED (
           |  SELECT el.vec_id, ct.cluster,
           |    CAST(sum((e - c) * (e - c)) AS BIGINT) AS dist
           |  FROM el JOIN c${k - 1} ct USING (j) GROUP BY el.vec_id, ct.cluster),
           |a$k AS MATERIALIZED (
           |  SELECT vec_id, CAST(min(dist * 16 + cluster) % 16 AS BIGINT) AS cluster
           |  FROM d$k GROUP BY vec_id),
           |g$k AS MATERIALIZED (
           |  SELECT a$k.cluster, el.j, CAST(sum(el.e) AS BIGINT) AS s,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM el JOIN a$k USING (vec_id) GROUP BY 1, 2),
           |c$k AS MATERIALIZED (
           |  SELECT p.cluster, p.j,
           |    COALESCE(CASE WHEN g.s < 0 THEN -((-g.s) // g.n)
           |                  ELSE g.s // g.n END, p.c) AS c
           |  FROM c${k - 1} p LEFT JOIN g$k g
           |    ON p.cluster = g.cluster AND p.j = g.j)""".stripMargin)
    }
    sb.toString
  }

  val all: Map[String, String] = withAliases(base ++ Map(
    // fixed-point Lloyd, unrolled round by round — centroids and final
    // cluster sizes replayed exactly (integer distances, packed-min
    // tie-break, sign-safe means)
    "embed_kmeans" -> {
      val k = graft.functions.Similarity.KmeansIters
      s"""WITH $kmeansCtes,
         |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n
         |  FROM a$k GROUP BY 1)
         |SELECT c.cluster, c.j AS dim, c.c,
         |  COALESCE(sz.n, 0) AS n_vectors
         |FROM c$k c LEFT JOIN sz USING (cluster)
         |ORDER BY cluster, dim""".stripMargin
    },

    // the FINAL MODEL's (cluster, label) contingency — same unrolled
    // Lloyd chain plus one more assignment against the final centroids
    // (what a deployed pipeline does with the trained model; the
    // training-time sizes live in embed_kmeans.n_vectors)
    "embed_kmeans_profile" -> {
      val k = graft.functions.Similarity.KmeansIters
      s"""WITH $kmeansCtes,
         |dF AS MATERIALIZED (
         |  SELECT el.vec_id, ct.cluster,
         |    CAST(sum((e - c) * (e - c)) AS BIGINT) AS dist
         |  FROM el JOIN c$k ct USING (j) GROUP BY el.vec_id, ct.cluster),
         |aF AS (
         |  SELECT vec_id, CAST(min(dist * 16 + cluster) % 16 AS BIGINT) AS cluster
         |  FROM dF GROUP BY vec_id)
         |SELECT a.cluster, emb.label, CAST(count(*) AS BIGINT) AS n
         |FROM aF a JOIN embeddings emb ON a.vec_id = emb.vec_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // fixed-point power iteration, unrolled round by round — loadings
    // and final gain replayed exactly (every op is BIGINT with
    // sign-safe division, so the chain is order-independent)
    "embed_pca_power" -> {
      val k = graft.functions.Similarity.PcaIters
      s"""WITH $pcaIterCtes
         |SELECT x$k.j AS dim, CAST(x$k.x AS BIGINT) AS loading,
         |  CAST(m$k.m AS BIGINT) AS gain
         |FROM x$k, m$k ORDER BY dim""".stripMargin
    },

    // top-m deflation chain: per component the PC1 power blocks on the
    // residual frame, then the integer deflation — loadings and gains
    // of all PcaTopM components replayed exactly
    "embed_pca_topm" -> {
      import graft.functions.Similarity.{PcaIters, PcaTopM}
      val unions = (1 to PcaTopM).map { c =>
        s"""SELECT CAST($c AS BIGINT) AS component, x.j AS dim,
           |  CAST(x.x AS BIGINT) AS loading, CAST(m.m AS BIGINT) AS gain
           |FROM xc${c}_$PcaIters x, mc${c}_$PcaIters m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $pcaTopmCtes
         |$unions
         |ORDER BY component, dim""".stripMargin
    },

    // per-class projection bands over PC1..PCm: every component's axis
    // projects the ORIGINAL quantized frame (el1), then a per-(component,
    // label) rollup — the multi-axis separability card
    "embed_pca_project_topm" -> {
      import graft.functions.Similarity.{PcaIters, PcaTopM}
      val unions = (1 to PcaTopM).map { c =>
        s"""SELECT CAST($c AS BIGINT) AS component, el1.vec_id, el1.label,
           |  CAST(sum(el1.e * x.x) AS BIGINT) AS proj
           |FROM el1 JOIN xc${c}_$PcaIters x USING (j)
           |GROUP BY el1.vec_id, el1.label""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $pcaTopmCtes,
         |pall AS ($unions),
         |q AS (SELECT component, label, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(proj) AS BIGINT) AS sp,
         |    CAST(min(proj) AS BIGINT) AS min_proj,
         |    CAST(max(proj) AS BIGINT) AS max_proj
         |  FROM pall GROUP BY component, label)
         |SELECT component, label, n,
         |  CAST(CASE WHEN sp < 0 THEN -((-sp) // n) ELSE sp // n END AS BIGINT)
         |    AS mean_proj,
         |  min_proj, max_proj
         |FROM q ORDER BY component, label""".stripMargin
    },

    // per-class projection onto the trained component: same unrolled
    // chain, then one projection fold per vector + a per-label rollup
    "embed_pca_project" -> {
      val k = graft.functions.Similarity.PcaIters
      s"""WITH $pcaIterCtes,
         |p AS (SELECT el.vec_id, el.label,
         |    CAST(sum(e * x) AS BIGINT) AS proj
         |  FROM el JOIN x$k USING (j) GROUP BY el.vec_id, el.label),
         |q AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(proj) AS BIGINT) AS sp,
         |    CAST(min(proj) AS BIGINT) AS min_proj,
         |    CAST(max(proj) AS BIGINT) AS max_proj
         |  FROM p GROUP BY label)
         |SELECT label, n,
         |  CAST(CASE WHEN sp < 0 THEN -((-sp) // n) ELSE sp // n END AS BIGINT)
         |    AS mean_proj,
         |  min_proj, max_proj
         |FROM q ORDER BY label""".stripMargin
    },

    // min-label propagation computes the same transitive closure as the
    // default star-contraction CC — one oracle serves both gate queries
    "dedup_components_minlabel" -> base("dedup_components"),

    // RRF fusion composed from the two ranking oracles: union of the
    // per-query vector list and the lexical head, integer reciprocal
    // discounts, (rrf desc, cid) total order
    "retrieval_rrf" -> {
      import graft.functions.Similarity.{RrfK, TopK}
      s"""WITH av AS (${base("ann_cosine_topk")}),
         |bm AS (${base("bm25_score")}),
         |bt AS (SELECT cid, r_b FROM (
         |    SELECT doc_id AS cid,
         |      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_b
         |    FROM bm) WHERE r_b <= $TopK),
         |u AS (
         |  SELECT qid, cid FROM av
         |  UNION
         |  SELECT q.qid, bt.cid FROM (SELECT DISTINCT qid FROM av) q, bt),
         |f AS (SELECT u.qid, u.cid,
         |    coalesce(1000000 // ($RrfK + av.rank), 0)
         |      + coalesce(1000000 // ($RrfK + bt.r_b), 0) AS rrf_ppm
         |  FROM u
         |  LEFT JOIN av ON u.qid = av.qid AND u.cid = av.cid
         |  LEFT JOIN bt ON u.cid = bt.cid)
         |SELECT qid, cid, CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
         |  CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY rrf_ppm DESC, cid) AS BIGINT) AS fused_rank
         |FROM f ORDER BY qid, fused_rank""".stripMargin
    },

    // leakage-safe split: the components oracle's WITH chain with a
    // cluster-hashed split tail (string surgery on the shared chain —
    // the fragments stay single-sourced)
    "split_leakage_safe" -> {
      val comp = base("dedup_components")
      val cut = comp.lastIndexOf("SELECT c.doc_id,")
      require(cut > 0, "dedup_components oracle tail moved")
      comp.substring(0, cut) +
        s"""SELECT c.doc_id,
           |  coalesce(m.component, c.doc_id) AS cluster,
           |  CASE WHEN ${h32("CAST(coalesce(m.component, c.doc_id) AS VARCHAR)")} % 100 < ${graft.functions.Dedup.EvalPct}
           |    THEN 'eval' ELSE 'train' END AS split
           |FROM corpus c LEFT JOIN comp m ON c.doc_id = m.doc_id
           |ORDER BY c.doc_id""".stripMargin
    },

    // split-contamination card: the components oracle's WITH chain
    // (which also defines `verified` and `corpus`) with a two-policy
    // leak-count tail — eval docs with a verified near-dup in train,
    // per policy; cluster-hash must be zero by construction
    "report_split_contamination" -> {
      val comp = base("dedup_components")
      val cut = comp.lastIndexOf("SELECT c.doc_id,")
      require(cut > 0, "dedup_components oracle tail moved")
      comp.substring(0, cut) +
        s""", clustered AS (
           |  SELECT c.doc_id, coalesce(m.component, c.doc_id) AS cluster
           |  FROM corpus c LEFT JOIN comp m ON c.doc_id = m.doc_id),
           |assign AS (
           |  SELECT doc_id,
           |    ${h32("CAST(doc_id AS VARCHAR)")} % 100 < ${graft.functions.Dedup.EvalPct} AS ed,
           |    ${h32("CAST(cluster AS VARCHAR)")} % 100 < ${graft.functions.Dedup.EvalPct} AS ec
           |  FROM clustered),
           |sym AS (
           |  SELECT doc_a AS d, doc_b AS o FROM verified
           |  UNION ALL
           |  SELECT doc_b, doc_a FROM verified),
           |leaks AS (
           |  SELECT
           |    CAST(count(DISTINCT CASE WHEN ad.ed AND NOT ao.ed THEN sym.d END) AS BIGINT) AS leak_d,
           |    CAST(count(DISTINCT CASE WHEN ad.ec AND NOT ao.ec THEN sym.d END) AS BIGINT) AS leak_c
           |  FROM sym
           |  JOIN assign ad ON sym.d = ad.doc_id
           |  JOIN assign ao ON sym.o = ao.doc_id),
           |totals AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(CASE WHEN ed THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_d,
           |    CAST(sum(CASE WHEN ec THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_c
           |  FROM assign)
           |SELECT 'cluster_hash' AS policy, t.n_docs, t.n_eval_c AS n_eval,
           |  l.leak_c AS leaked_eval,
           |  (l.leak_c * 1000000) // greatest(t.n_eval_c, 1) AS leak_ppm
           |FROM totals t, leaks l
           |UNION ALL
           |SELECT 'doc_hash', t.n_docs, t.n_eval_d, l.leak_d,
           |  (l.leak_d * 1000000) // greatest(t.n_eval_d, 1)
           |FROM totals t, leaks l
           |ORDER BY policy""".stripMargin
    },

    // trained integer batch-perceptron (the distilled quality filter):
    // 8 unrolled rounds of single-row weight CTEs — misclassified-set
    // sums with sign-safe mean steps, then the final confusion. Every
    // fragment (tokens, marker hits, alpha/stopword algebra) is the one
    // the text_stats / curation gates already pin.
    "quality_perceptron" -> {
      import graft.functions.QualityModel.{Rounds, BiasX}
      val dims = 0 until graft.functions.QualityModel.Dim
      val tau = graft.functions.QualityModel.QualityTau
      val dotW = dims.map(j => s"w.w$j * x$j").mkString(" + ")
      val sb = new StringBuilder
      sb.append(
        s"""qtok AS MATERIALIZED (SELECT doc_id, text, $toks AS toks FROM documents),
           |qs AS MATERIALIZED (SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe,
           |  CAST(length(text) AS BIGINT) AS n_chars,
           |  CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
           |  ${hitExpr(graft.functions.TextAnalysis.langMarkers.head._2)} AS n_stopwords
           |FROM qtok),
           |rawlab AS MATERIALIZED (SELECT doc_id,
           |  CASE WHEN round(CAST(n_alpha AS DOUBLE) / n_chars, 6)
           |      + round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) >= $tau
           |    THEN 1 ELSE -1 END AS y,
           |  CAST($BiasX AS BIGINT) AS x0,
           |  n_tokens AS x1,
           |  (n_alpha * 1000000) // greatest(n_chars, 1) AS x2,
           |  (n_stopwords * 1000000) // greatest(n_tokens, 1) AS x3,
           |  (n_chars * 1000) // greatest(n_tokens, 1) AS x4,
           |  n_bpe AS x5
           |FROM qs),
           |fm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
           |${(1 until graft.functions.QualityModel.Dim).map(j => s"  CAST(sum(x$j) AS BIGINT) AS s$j").mkString(",\n")}
           |FROM rawlab),
           |lab AS MATERIALIZED (SELECT doc_id, y, x0,
           |${(1 until graft.functions.QualityModel.Dim).map(j => s"  x$j - (fm.s$j // fm.n) AS x$j").mkString(",\n")}
           |FROM rawlab, fm),
           |pw0 AS (SELECT ${dims.map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")})""".stripMargin)
      for (t <- 1 to Rounds) {
        val mis = s"y * ($dotW) <= 0"
        sb.append(",\n")
        sb.append(
          s"""pg$t AS MATERIALIZED (SELECT
             |  CAST(coalesce(count(*) FILTER (WHERE $mis), 0) AS BIGINT) AS cnt,
             |${dims.map(j => s"  CAST(coalesce(sum(y * x$j) FILTER (WHERE $mis), 0) AS BIGINT) AS g$j").mkString(",\n")}
             |FROM lab, pw${t - 1} w),
             |pw$t AS (SELECT
             |${dims.map(j => s"  w.w$j + CASE WHEN g.g$j < 0 THEN -((-g.g$j) // greatest(g.cnt, 1)) ELSE g.g$j // greatest(g.cnt, 1) END AS w$j").mkString(",\n")}
             |FROM pw${t - 1} w, pg$t g)""".stripMargin)
      }
      s"""WITH $sb,
         |conf AS (SELECT
         |  CAST(count(*) FILTER (WHERE y = 1 AND m > 0) AS BIGINT) AS tp,
         |  CAST(count(*) FILTER (WHERE y = -1 AND m > 0) AS BIGINT) AS fp,
         |  CAST(count(*) FILTER (WHERE y = -1 AND m <= 0) AS BIGINT) AS tn,
         |  CAST(count(*) FILTER (WHERE y = 1 AND m <= 0) AS BIGINT) AS fn
         |FROM (SELECT y, $dotW AS m FROM lab, pw$Rounds w)),
         |wu AS (
         |${dims.map(j => s"  SELECT CAST($j AS BIGINT) AS j, w$j AS w FROM pw$Rounds").mkString("\n  UNION ALL\n")}
         |)
         |SELECT wu.j, wu.w, c.tp, c.fp, c.tn, c.fn FROM wu, conf c
         |ORDER BY j""".stripMargin
    },

    // IVF-accelerated k-center is BIT-IDENTICAL to the exact greedy by
    // construction (pruning is a sufficient no-change proof, never an
    // approximation) — the same k-step CTE replay adjudicates both
    "sample_kcenter_ivf" -> base("sample_kcenter"),

    // canonical-per-cluster: same transitive-closure components, winner =
    // longest doc then smallest id, folded into one packed min() —
    // (1024 - n_toks) * 2^51 + doc_id, decoded with & / >>
    "dedup_canonical" ->
      s"""WITH RECURSIVE $nearCorpus,
         |$nearShingles,
         |hs AS (SELECT doc_id, ${h32("s")} AS h FROM sh),
         |mh AS (
         |  SELECT doc_id, j,
         |    min(((2 * j + 1) * h + 1000003 * j + 12345) % 2147483647) AS m
         |  FROM hs, range(64) t(j) GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |    sum(m * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END)) AS band_hash
         |  FROM mh GROUP BY doc_id, j // 4),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |$sizesAndInter,
         |verified AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand c
         |  JOIN inter ON c.doc_a = inter.doc_a AND c.doc_b = inter.doc_b
         |  JOIN sizes sa ON c.doc_a = sa.doc_id
         |  JOIN sizes sb ON c.doc_b = sb.doc_id
         |  WHERE round(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE), 6) >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM verified
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM verified),
         |walk(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT w.src, e.dst FROM walk w JOIN edges e ON w.dst = e.src),
         |comp AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS component
         |  FROM walk GROUP BY src),
         |compfull AS (
         |  SELECT c.doc_id, coalesce(m.component, c.doc_id) AS component
         |  FROM corpus c LEFT JOIN comp m ON c.doc_id = m.doc_id),
         |tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks FROM tokd),
         |keyd AS (
         |  SELECT f.component,
         |    (1024 - t.n_toks) * 2251799813685248 + f.doc_id AS key
         |  FROM compfull f JOIN tk t ON f.doc_id = t.doc_id)
         |SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(key) & 2251799813685247 AS canonical_doc,
         |  1024 - (min(key) >> 51) AS canonical_toks
         |FROM keyd GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_embedding" ->
      s"""WITH $embCorpus,
         |${dimsCte("corpus")},
         |e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
         |      (a, b) -> a + b)) AS nrm,
         |    $bucketExpr AS bucket
         |  FROM corpus, dims),
         |p AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(a.embedding)), i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE))),
         |      (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS sim
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, sim FROM p WHERE sim >= 0.99
         |ORDER BY vec_a, vec_b""".stripMargin,

    "embed_centroids" ->
      s"""WITH x AS (
         |  SELECT label, unnest(range(len(embedding))) AS dim, embedding
         |  FROM embeddings),
         |s AS (
         |  SELECT label, dim,
         |    CAST(round(CAST(embedding[dim+1] AS DOUBLE) * ${Similarity.CentroidScale}) AS BIGINT) AS sv
         |  FROM x)
         |SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vectors,
         |  round(CAST(sum(sv) AS DOUBLE) / (count(*) * ${Similarity.CentroidScale}.0), 6) AS c
         |FROM s GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "knn_join" ->
      s"""WITH ${dimsCte("embeddings")},
         |e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
         |      (a, b) -> a + b)) AS nrm,
         |    $bucketExpr AS bucket
         |  FROM embeddings, dims),
         |p AS (
         |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(range(len(a.embedding)), i -> CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE))),
         |      (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS sim
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
         |r AS (
         |  SELECT vec_id, nbr_id, sim,
         |    CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, nbr_id ASC) AS BIGINT) AS rank
         |  FROM p)
         |SELECT vec_id, nbr_id, rank, sim FROM r WHERE rank <= ${Similarity.KnnK}
         |ORDER BY vec_id, rank""".stripMargin,

    "ann_ivf" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm FROM e
        |      ORDER BY ${h32("CAST(vec_id AS VARCHAR)")}, vec_id
        |      LIMIT ${Similarity.IvfCodebookK}),
        |ac AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(e.embedding)), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(c.cv[i+1] AS DOUBLE))),
        |      (x, y) -> x + y) / (e.nrm * c.cnrm), 6) AS csim
        |  FROM e, c),
        |a AS (
        |  SELECT vec_id, embedding, nrm, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |  FROM ac),
        |asg AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM a WHERE arn = 1),
        |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qnrm, cell AS qcell FROM asg WHERE vec_id < 8),
        |d AS (
        |  SELECT qid, asg.vec_id AS cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(qv)), i -> CAST(qv[i+1] AS DOUBLE) * CAST(asg.embedding[i+1] AS DOUBLE))),
        |      (x, y) -> x + y) / (qnrm * asg.nrm), 6) AS sim
        |  FROM q JOIN asg ON qcell = asg.cell AND qid <> asg.vec_id),
        |r AS (SELECT qid, cid, sim,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
        |  FROM d)
        |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,

    "ann_ivf_probe2" ->
      s"""WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(embedding)), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cnrm FROM e
        |      ORDER BY ${h32("CAST(vec_id AS VARCHAR)")}, vec_id
        |      LIMIT ${Similarity.IvfCodebookK}),
        |ac AS (
        |  SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(e.embedding)), i -> CAST(e.embedding[i+1] AS DOUBLE) * CAST(c.cv[i+1] AS DOUBLE))),
        |      (x, y) -> x + y) / (e.nrm * c.cnrm), 6) AS csim
        |  FROM e, c),
        |a AS (
        |  SELECT vec_id, embedding, nrm, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |  FROM ac),
        |asg AS (SELECT vec_id, embedding, nrm, cent_id AS cell FROM a WHERE arn = 1),
        |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qnrm, cent_id AS probe_cell
        |      FROM a WHERE arn <= 2 AND vec_id < 8),
        |d AS (
        |  SELECT qid, asg.vec_id AS cid,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(len(qv)), i -> CAST(qv[i+1] AS DOUBLE) * CAST(asg.embedding[i+1] AS DOUBLE))),
        |      (x, y) -> x + y) / (qnrm * asg.nrm), 6) AS sim
        |  FROM q JOIN asg ON probe_cell = asg.cell AND qid <> asg.vec_id),
        |r AS (SELECT qid, cid, sim,
        |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid ASC) AS BIGINT) AS rn
        |  FROM d)
        |SELECT qid, cid, rn AS rank, sim FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,

    "ann_recall_at_k" ->
      s"""WITH brute AS (${base("ann_cosine_topk")}),
         |lsh AS (${base("ann_lsh_bucketed")})
         |SELECT b.qid, count(l.cid) AS n_found,
         |  CAST(count(l.cid) AS DOUBLE) / 5 AS recall
         |FROM brute b LEFT JOIN lsh l ON b.qid = l.qid AND b.cid = l.cid
         |GROUP BY b.qid ORDER BY b.qid""".stripMargin,

    "multimodal_frames" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |f AS (
        |  SELECT doc_id, text, n,
        |    unnest(list_filter(range(CAST(ceil(CAST(n AS DOUBLE) / 256) AS BIGINT)),
        |                       i -> i % 2 = 0)) AS i
        |  FROM t),
        |fr AS (
        |  SELECT doc_id, i AS frame_idx,
        |    least(256, n - i*256) AS n_bytes,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(least(256, n - i*256)),
        |          j -> CAST(ord(substring(text, CAST(i*256 + j + 1 AS INT), 1)) AS BIGINT))),
        |      (a, b) -> (a*31 + b) % 1000000007) AS checksum
        |  FROM f)
        |SELECT doc_id, frame_idx, n_bytes, checksum FROM fr
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "text_top_terms" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS tok FROM documents)
         |SELECT tok, count(*) AS freq, count(DISTINCT doc_id) AS df
         |FROM t GROUP BY tok
         |ORDER BY freq DESC, tok ASC LIMIT 20""".stripMargin,

    // exact-mode SpaceSaving gate: capacity (4096) >= vocabulary (~31),
    // so no eviction ever fires and count_lo = count_hi = exact frequency
    "approx_top_terms" ->
      s"""WITH t AS (SELECT unnest($toks) AS tok FROM documents)
         |SELECT tok AS item,
         |  CAST(count(*) AS BIGINT) AS count_lo,
         |  CAST(count(*) AS BIGINT) AS count_hi
         |FROM t GROUP BY tok
         |ORDER BY count_hi DESC, item ASC LIMIT 20""".stripMargin,

    "text_rare_term" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(list_distinct($toks)) AS tok FROM documents),
         |df AS (SELECT tok, count(*) AS doc_freq FROM t GROUP BY tok),
         |r AS (
         |  SELECT t.doc_id, t.tok, df.doc_freq,
         |    row_number() OVER (PARTITION BY t.doc_id ORDER BY df.doc_freq, t.tok) AS rn
         |  FROM t JOIN df USING (tok))
         |SELECT doc_id, tok AS rare_term, doc_freq FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,

    // mean log2-frequency-class per doc: fc = length(bin(cnt)) - 1 is an
    // INTEGER log2 (identical in both engines, unlike libm log); mean =
    // exact-integer sum / count in double
    "text_freq_class" ->
      s"""WITH tokd AS (SELECT doc_id, $toks AS toks FROM documents),
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM tokd),
         |vocab AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY 1),
         |fcv AS (SELECT tok, CAST(length(bin(cnt)) - 1 AS BIGINT) AS fc FROM vocab)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |  round(CAST(sum(fc) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS fc_mean
         |FROM occ JOIN fcv USING (tok)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // bigram LM: fc2 - fc1 = floor(log2 c(w1,w2)) - floor(log2 c(w1·))
    // per bigram (integer log2 via length(bin())-1, identical in both
    // engines); head counts derive from the bigram model (sum over w2);
    // docs with < 2 tokens have no bigrams and are excluded
    "text_lm_bigram" ->
      s"""WITH tokd0 AS (SELECT doc_id, $toks AS toks FROM documents),
         |tokd AS (SELECT * FROM tokd0 WHERE len(toks) >= 2),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(len(toks) - 1), i -> toks[i+1])) AS w1,
         |    unnest(list_transform(range(len(toks) - 1), i -> toks[i+2])) AS w2
         |  FROM tokd),
         |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt2 FROM occ GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(sum(cnt2) AS BIGINT) AS cnt1 FROM c2 GROUP BY 1),
         |f2 AS (SELECT w1, w2, CAST(length(bin(cnt2)) - 1 AS BIGINT) AS fc2 FROM c2),
         |f1 AS (SELECT w1, CAST(length(bin(cnt1)) - 1 AS BIGINT) AS fc1 FROM c1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(fc2 - fc1) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS lp_mean
         |FROM occ JOIN f2 USING (w1, w2) JOIN f1 USING (w1)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // head-truncated bigram LM: top-K2 bigrams by (cnt2 DESC, bg) and
    // top-K1 heads by (cnt1 DESC, w1) — the same deterministic rankings
    // the Spark TakeOrdereds use — score from the heads, default class
    // 0 on both sides (the live monitor's frozen-model rule); plain-SQL
    // truncation, so the serving form gets a FULL value oracle
    "text_lm_bigram_head" ->
      s"""WITH tokd0 AS (SELECT doc_id, $toks AS toks FROM documents),
         |tokd AS (SELECT * FROM tokd0 WHERE len(toks) >= 2),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(len(toks) - 1),
         |      i -> toks[i+1] || ' ' || toks[i+2])) AS bg
         |  FROM tokd),
         |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt2 FROM occ GROUP BY 1),
         |c1 AS (SELECT split_part(bg, ' ', 1) AS w1,
         |  CAST(sum(cnt2) AS BIGINT) AS cnt1 FROM c2 GROUP BY 1),
         |h2 AS (
         |  SELECT bg, CAST(length(bin(cnt2)) - 1 AS BIGINT) AS fc2 FROM (
         |    SELECT bg, cnt2,
         |      row_number() OVER (ORDER BY cnt2 DESC, bg ASC) AS rn
         |    FROM c2)
         |  WHERE rn <= ${TextAnalysis.LmHeadK2}),
         |h1 AS (
         |  SELECT w1, CAST(length(bin(cnt1)) - 1 AS BIGINT) AS fc1 FROM (
         |    SELECT w1, cnt1,
         |      row_number() OVER (ORDER BY cnt1 DESC, w1 ASC) AS rn
         |    FROM c1)
         |  WHERE rn <= ${TextAnalysis.LmHeadK1}),
         |sel AS (
         |  SELECT o.doc_id,
         |    coalesce(h2.fc2, 0) - coalesce(h1.fc1, 0) AS lp
         |  FROM occ o
         |  LEFT JOIN h2 ON o.bg = h2.bg
         |  LEFT JOIN h1 ON split_part(o.bg, ' ', 1) = h1.w1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS lp_mean
         |FROM sel GROUP BY 1 ORDER BY 1""".stripMargin,

    // head-truncated variant: top-K head by (cnt DESC, tok) — the same
    // deterministic ranking the Spark TakeOrdered uses — scores fc from
    // the head, everything else the default tail class 0; the truncation
    // itself is plain SQL so the head form gets a FULL value oracle
    "text_freq_class_head" ->
      s"""WITH tokd AS (SELECT doc_id, $toks AS toks FROM documents),
         |occ AS (SELECT doc_id, unnest(toks) AS tok FROM tokd),
         |vocab AS (SELECT tok, count(*) AS cnt FROM occ GROUP BY 1),
         |head AS (
         |  SELECT tok, CAST(length(bin(cnt)) - 1 AS BIGINT) AS fc FROM (
         |    SELECT tok, cnt,
         |      row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rn
         |    FROM vocab)
         |  WHERE rn <= ${TextAnalysis.FreqClassHeadK})
         |SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |  round(CAST(sum(coalesce(h.fc, ${TextAnalysis.FreqClassTailFc})) AS DOUBLE)
         |        / CAST(count(*) AS DOUBLE), 6) AS fc_mean
         |FROM occ o LEFT JOIN head h USING (tok)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  ))

  /** Aliases resolved AFTER the map is built (some aliased gates live
    * in the `all` extras, not in `base`): the artifact-store deploy
    * round-trip must not perturb the IVF ranking, so ann_ivf's oracle
    * adjudicates the loaded-codebook search too. */
  private def withAliases(m: Map[String, String]): Map[String, String] =
    m + ("ann_ivf_deploy" -> m("ann_ivf")) +
      ("ann_sq8_deploy" -> m("ann_sq8")) +
      ("quality_perceptron_deploy" -> m("quality_perceptron")) +
      ("ann_pq_deploy" -> m("ann_pq"))
}
