package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Portable, Similarity, TextAnalysis}
import graft.multimodal.Multimodal
import graft.operators.Extensions

/** Semantics of the pipeline extensions beyond the DuckDB value gate:
  * dedup recall/precision structure, LSH-vs-brute agreement, and the
  * multimodal stub plumbing equaling its expression-level twin.
  */
class ExtensionsSpec extends SparkTestBase {

  /** Gates whose value is deliberately NOT SQL-mirrored (driver records
    * a rows-only check). Empty since round 7: the trained-IVF path's
    * quality pin moved from rows-only to the planted-near-dup recall
    * gate (ann_ivf_recall), so every registered gate is oracle-checked. */
  val RowsOnlyGates = Set.empty[String]

  test("every extension query runs non-empty on sf0.001 and has an oracle") {
    Extensions.all.foreach { case (name, fn) =>
      assert(fn(spark, sf0001).count() > 0, s"$name returned no rows")
      assert(
        operators.ExtensionOracles.all.contains(name) || RowsOnlyGates(name),
        s"$name has no oracle")
    }
  }

  test("connected components close transitive chains the one-hop rule misses") {
    val s = spark
    import s.implicits._
    // A~B, B~C (no A~C edge), plus an isolated pair and a 4-cycle
    val pairs = Seq(
      (1L, 2L), (2L, 3L),          // chain: all -> 1
      (10L, 11L),                  // pair: 11 -> 10
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L) // cycle: all -> 20
    ).toDF("doc_a", "doc_b")
    val got = Dedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L), s"got $got")
    // empty edge set: converges immediately to an empty labeling
    assert(Dedup.components(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .count() == 0)
  }

  test("components == driver-side union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n * 3 / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // reference: classic union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val minOfRoot = nodes.groupBy(id => find(id.toInt))
        .map { case (r, ids) => r -> ids.min }
      val expected = nodes.map(id => id -> minOfRoot(find(id.toInt))).toMap
      val got = Dedup.components(pairs.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial (n=$n, ${pairs.size} edges) diverged: " +
        expected.collectFirst { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) })
      // the star-contraction alternative must agree exactly — fed a
      // DIRTY edge list (duplicates, both orientations, self-loops) to
      // prove the canonicalization step owns input hygiene
      val dirty = pairs ++ pairs.map(_.swap) ++ pairs.take(5) ++
        Seq((7L, 7L), (n.toLong - 1, n.toLong - 1))
      val gotStar = Dedup.componentsStar(dirty.toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      // self-loop-only nodes form their own singleton components
      val expectedStar = expected ++
        Seq(7L, n.toLong - 1).filterNot(expected.contains).map(x => x -> x)
      assert(gotStar == expectedStar, s"trial $trial componentsStar diverged: " +
        expectedStar.collectFirst { case (k, v) if gotStar.get(k) != Some(v) => (k, v, gotStar.get(k)) })
    }
  }

  test("componentsStar: O(log n) rounds on a long path where min-label needs diameter") {
    val s = spark
    import s.implicits._
    // a 256-node path is the adversarial case: min-label propagation
    // moves the min one hop per round (needs ~255 rounds); the
    // large-star/small-star alternation must close it in O(log n)
    val path = (1L until 256L).map(i => (i, i + 1L)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.componentsStarWithRounds(path, maxIters = 30)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (1L to 256L).map(_ -> 1L).toMap,
      s"path not fully collapsed: ${got.filter(_._2 != 1L).take(5)}")
    assert(rounds <= 16, s"expected O(log 256)=~8+slack rounds, took $rounds")
    // empty edge set: converges immediately to an empty labeling
    assert(Dedup.componentsStar(Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .count() == 0)
    // and the hand-built chain/pair/cycle case matches components()
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (20L, 23L)
    ).toDF("doc_a", "doc_b")
    assert(Dedup.componentsStar(pairs).as[(Long, Long)].collect().toMap ==
      Dedup.components(pairs).as[(Long, Long)].collect().toMap)
  }

  test("pipeline cache: LRU cap evicts the least-recently-used session, not the hot one") {
    // query CONSTRUCTION only — entryFor caches lazy frames, no jobs run
    val sessions = (1 to Dedup.MaxCachedSessions + 1).map(_ => spark.newSession())
    sessions.take(Dedup.MaxCachedSessions).foreach(s => Dedup.dedupMinhash(s, sf0001))
    // touch the first session again — it becomes most-recently-used
    Dedup.dedupMinhash(sessions.head, sf0001)
    // the (cap+1)-th session must evict the LRU slot, not the hot head
    Dedup.dedupMinhash(sessions.last, sf0001)
    assert(Dedup.evictSharedPipeline(sessions.head, sf0001),
      "the most-recently-used session was evicted by the cap")
    assert(!Dedup.evictSharedPipeline(sessions(1), sf0001),
      "the least-recently-used session survived the cap")
    assert(Dedup.evictSharedPipeline(sessions.last, sf0001))
    sessions.foreach(s => Dedup.evictSharedPipeline(s, sf0001))
  }

  test("CC fails loudly when the iteration cap truncates convergence") {
    val s = spark
    import s.implicits._
    // a 64-node path needs ~63 min-label rounds and ~7 star alternations:
    // a cap below that must THROW, not silently hand back wrong labels
    val path = (1L until 64L).map(i => (i, i + 1L)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException](Dedup.components(path, maxIters = 3))
    intercept[IllegalStateException](Dedup.componentsStar(path, maxIters = 2))
    // while a sufficient cap still converges cleanly
    assert(Dedup.componentsStar(path, maxIters = 30).count() == 64)
  }

  test("dedup_canonical: every planted cluster keeps its LONGEST doc (the copy), not min id") {
    val comps = Dedup.dedupComponents(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = Dedup.dedupCanonical(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // one row per component, components agree with the keep/drop gate
    assert(got.map(_._1).toSet == comps.map(_._2).toSet)
    assert(got.map(_._2).sum == comps.size)
    val toksByDoc = Dedup.corpusWithNearDupes(spark, sf0001)
      .select(col("doc_id"), size(Portable.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // differential model: per cluster, longest doc wins, ties to min id
    val model = comps.groupBy(_._2).map { case (c, members) =>
      val win = members.map(_._1).sortBy(d => (-toksByDoc(d), d)).head
      c -> ((members.size.toLong, win, toksByDoc(win)))
    }
    assert(got.map(t => t._1 -> ((t._2, t._3, t._4))).toMap == model,
      s"first diff: ${model.collectFirst { case (c, v)
        if !got.exists(t => t._1 == c && ((t._2, t._3, t._4)) == v) => (c, v) }}")
    // the rule genuinely diverges from min-id keep: a planted (original,
    // longer copy) pair's canonical is the COPY, not the component id
    val multi = got.filter(_._2 >= 2)
    assert(multi.exists(t => t._3 >= Dedup.NearDupOffset && t._3 != t._1),
      "no cluster diverged from min-id keep — the gate would not distinguish the rules")
    // singletons keep themselves
    assert(got.filter(_._2 == 1L).forall(t => t._3 == t._1))
  }

  test("dedup_components keeps exactly one doc per component; drops superset of one-hop drops") {
    val comp = Dedup.dedupComponents(spark, sf0001).cache()
    val byComponent = comp.groupBy("component")
      .agg(sum(when(col("action") === "keep", 1).otherwise(0)).as("n_keep"))
    assert(byComponent.filter(col("n_keep") =!= 1).count() == 0,
      "every component must keep exactly one representative")
    // transitive closure can only drop MORE than the one-hop rule
    val oneHop = Dedup.dedupDropList(spark, sf0001)
      .filter(col("action") === "drop").select("doc_id")
    val closure = comp.filter(col("action") === "drop").select("doc_id")
    assert(oneHop.except(closure).count() == 0,
      "one-hop drops must be a subset of component drops")
    comp.unpersist()
  }

  test("decontaminate == driver-side shingle intersection against the benchmark set") {
    val s = spark
    import s.implicits._
    // mirror of tokens/shingles3: lower + \s+ split, 3-gram shingles
    // with the short-doc whole-text degrade, distinct
    def shingles(text: String): Set[String] = {
      // split limit -1 keeps trailing empty tokens, like Spark's split()
      val t = text.toLowerCase.split("\\s+", -1).toSeq
      (if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSeq
       else Seq(t.mkString(" "))).toSet
    }
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val benchShingles = docs
      .filter(_._1 % 13 == 0)
      .map { case (_, text) =>
        text.toLowerCase.split("\\s+", -1).take(8).mkString(" ") }
      .flatMap(shingles)
      .toSet
    val expected = docs.map { case (id, text) =>
      val n = (shingles(text) intersect benchShingles).size.toLong
      id -> ((n, if (n >= 4) "quarantine" else "keep"))
    }.toMap
    val got = Dedup.decontaminate(spark, sf0001)
      .as[(Long, Long, String)].collect()
      .map { case (id, n, a) => id -> ((n, a)) }.toMap
    assert(got == expected, s"first diff: ${expected.collectFirst {
      case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }}")
    // the synthetic benchmark guarantees quarantines at every SF
    assert(got.values.count(_._2 == "quarantine") > 0)
  }

  test("token_budget_mix == driver-side per-source cumulative admission") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).toSeq.map { case (id, _, text) =>
        val n = text.toLowerCase.split("\\s+", -1).length.toLong
        cum += n
        id -> ((n, cum, if (cum <= 1000L) "admit" else "overflow"))
      }
    }.toMap
    val got = TextAnalysis.tokenBudgetMix(spark, sf0001)
      .as[(Long, String, Long, Long, String)].collect()
      .map { case (id, _, n, cum, a) => id -> ((n, cum, a)) }.toMap
    assert(got == expected, s"first diff: ${expected.collectFirst {
      case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }}")
  }

  test("sample_stratified nests correctly around the flat-rate sample") {
    val flat = Dedup.sampleByHash(spark, sf0001).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val strat = Dedup.sampleStratified(spark, sf0001).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // boosted langs (en 50, zh 25) keep a SUPERSET of their 10% buckets;
    // default langs select the identical set (same hash, same rate)
    val boosted = Set("en", "zh")
    assert(flat.filter(d => boosted(d._2)).subsetOf(strat))
    assert(strat.filterNot(d => boosted(d._2)) == flat.filterNot(d => boosted(d._2)))
    // and the boost is real: strictly more en docs than the flat rate
    assert(strat.count(_._2 == "en") > flat.count(_._2 == "en"))
  }

  test("sample_temperature == driver model; flattens the lang distribution vs proportional") {
    import graft.functions.Portable.h32
    val budget = 300
    val full = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), h32(col("text")).as("hv"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    val strata = full.groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    val n = strata.view.mapValues(_.size.toLong).toMap
    val wts = n.view.mapValues(v => math.sqrt(v.toDouble).toLong).toMap
    val tw = wts.values.sum
    val target = n.map { case (l, nl) => l -> math.min(nl, wts(l) * budget / tw) }
    val expected = strata.toSeq.flatMap { case (lang, rows) =>
      rows.take(target(lang).toInt).zipWithIndex
        .map { case ((_, _, id), i) => (lang, (i + 1).toLong, id) }
    }.sortBy(t => (t._1, t._2))
    val got = Dedup.sampleTemperature(spark, sf0001, budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"first diff ${expected.zipAll(got, null, null)
      .collectFirst { case (e, g) if e != g => (e, g) }}")
    // the flattening property: the dominant stratum's share of the sample
    // is strictly below its share of the corpus; the scarcest is above
    val corpusTotal = n.values.sum.toDouble
    val sampleTotal = got.size.toDouble
    val dominant = n.maxBy(_._2)._1
    val scarcest = n.minBy(_._2)._1
    assert(target(dominant) / sampleTotal < n(dominant) / corpusTotal,
      s"dominant $dominant not down-weighted")
    assert(target(scarcest) / sampleTotal > n(scarcest) / corpusTotal,
      s"scarcest $scarcest not up-weighted")
  }

  test("sample_reservoir == naive full-stratum window; exact n per stratum at several n") {
    import graft.functions.Portable.h32
    // naive reference: rank the ENTIRE stratum (the giant-group shape the
    // operator exists to avoid), driver-side
    val full = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), h32(col("text")).as("hv"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    val strata = full.groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3))).toMap
    for (n <- Seq(3, 40, 100)) {
      val expected = strata.toSeq.flatMap { case (lang, rows) =>
        rows.take(n).zipWithIndex.map { case ((_, _, id), i) => (lang, (i + 1).toLong, id) }
      }.sortBy(t => (t._1, t._2))
      val got = Dedup.sampleReservoir(spark, sf0001, n)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"n=$n: first diff ${expected.zipAll(got, null, null)
        .collectFirst { case (e, g) if e != g => (e, g) }}")
      // exact-size contract: min(n, |stratum|) rows per stratum
      val sizes = got.groupBy(_._1).view.mapValues(_.size).toMap
      for ((lang, rows) <- strata)
        assert(sizes.getOrElse(lang, 0) == math.min(n, rows.size),
          s"n=$n lang=$lang: got ${sizes.getOrElse(lang, 0)} of ${rows.size}")
    }
  }

  test("dedup_exact keeps one representative per content and counts copies") {
    val df = Dedup.dedupExact(spark, sf0001).cache()
    // every original doc survives as the min-id representative
    assert(df.count() == 500)
    // exactly the every-10th docs got a copy
    assert(df.filter(col("n_copies") === 2).count() == 50)
    assert(df.filter(col("n_copies") === 2 && col("doc_id") % 10 =!= 0).count() == 0)
    df.unpersist()
  }

  test("shared verified-pairs cache is pair-set-sized, not corpus-partitioned") {
    // the verify chain is broadcast-join-shaped (no shuffle of its own):
    // without the explicit AQE-coalescing repartition the cached sliver
    // of pairs would inherit the CORPUS scan's partition count and every
    // CC round downstream would schedule a task per partition
    val pairs = Dedup.verifiedPairs(spark, sf0001)
    assert(pairs.count() > 0)
    assert(pairs.rdd.getNumPartitions <=
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"pairs cached across ${pairs.rdd.getNumPartitions} partitions")
  }

  test("minhash-LSH candidates recover nearly all true near-dup pairs (recall vs brute force)") {
    val truth = Dedup.dedupJaccard(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhash(spark, sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(truth), "LSH produced a pair brute force did not (verification must filter)")
    val recall = lsh.size.toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall (${lsh.size}/${truth.size}) below 0.9")
    // constructed near-dups: short docs sit near the Jaccard threshold
    // where a band miss is genuinely probable, so bound recall rather than
    // demanding full capture
    val constructed = truth.filter { case (a, b) => b == a + graft.functions.Dedup.NearDupOffset }
    val cRecall = constructed.count(lsh.contains).toDouble / constructed.size
    assert(constructed.nonEmpty && cRecall >= 0.85,
      s"constructed near-dup recall $cRecall below 0.85")
  }

  test("LSH ANN agrees with brute force on shared pairs and stays in-bucket") {
    val brute = Similarity.annBrute(spark, sf0001)
      .select("qid", "cid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.annLsh(spark, sf0001)
      .select("qid", "cid", "sim").collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach { bSim =>
        assert(bSim == r.getDouble(2), s"sim mismatch for $key")
      }
    }
  }

  test("multi-probe LSH recovers at least as much of the brute-force top-5 as single-probe") {
    def top5(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = top5(Similarity.annBrute(spark, sf0001))
    val single = top5(Similarity.annLsh(spark, sf0001))
    val multi = top5(Similarity.annLshMultiProbe(spark, sf0001))
    val rSingle = (single & brute).size.toDouble / brute.size
    val rMulti = (multi & brute).size.toDouble / brute.size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(multi.size >= single.size, "multi-probe returned fewer results than single-probe")
  }

  test("IVF: sims exact on shared pairs, probe2 recall >= probe1, candidates cell-bounded") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteDf = Similarity.annBrute(spark, sf0001)
    val brute = bruteDf.select("qid", "cid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every IVF similarity agrees with brute force on shared pairs
    val ivf = Similarity.annIvf(spark, sf0001).select("qid", "cid", "sim").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach { bSim =>
        assert(bSim == r.getDouble(2), s"sim mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
    // the second probe can only widen the candidate pool: recall vs the
    // brute top-k is monotone in nprobe
    val bruteSet = pairs(bruteDf)
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = (ivfPairs & bruteSet).size.toDouble / bruteSet.size
    val r2 = (pairs(Similarity.annIvfProbe2(spark, sf0001)) & bruteSet).size.toDouble / bruteSet.size
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
  }

  test("bigram LM: driver-replay equality at sf0.001, scores nonpositive") {
    val got = TextAnalysis.lmBigram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    // brute-force replica of the exact model: split(-1) mirrors Spark's
    // keep-trailing-empties regex split; fc = floor(log2 n) in integers;
    // HALF_UP rounding mirrors Spark's round(col, 6)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+", -1).toSeq)
      .filter(_._2.size >= 2)
    val bigrams = docs.flatMap { case (id, t) => t.zip(t.tail).map(p => (id, p)) }
    val c2 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    def fc(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val exp = bigrams.groupBy(_._1).map { case (id, bs) =>
      val lps = bs.map { case (_, p) => fc(c2(p)) - fc(c1(p._1)) }
      val mean = BigDecimal(lps.sum.toDouble / bs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((bs.size.toLong, mean))
    }
    assert(got.map(_._1).toSet == exp.keySet, "doc-id sets differ")
    got.foreach { case (id, n, lp) =>
      val (en, elp) = exp(id)
      assert(n == en, s"doc $id n_bigrams $n != $en")
      assert(lp == elp, s"doc $id lp_mean $lp != $elp")
      assert(lp <= 0.0, s"doc $id lp_mean $lp positive — fc2 > fc1 impossible")
    }
  }

  test("tokenizer card: per-source sums reconcile with the per-doc gate, ppm exact") {
    val perDoc = TextAnalysis.bpeTrainedCounts(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2).length.toLong))).toMap
    val exp = perDoc.groupBy(t => docs(t._1)._1).map { case (src, rows) =>
      val nchars = rows.map(t => docs(t._1)._2).sum
      val np = rows.map(_._2).sum
      val nb = rows.map(_._3).sum
      src -> ((rows.length.toLong, nchars, np, nb,
        nchars * 1000000L / math.max(nb, 1L),
        nb * 1000000L / math.max(np, 1L)))
    }
    val got = TextAnalysis.reportTokenizerCard(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getString(0)).toSet == exp.keySet, "source sets differ")
    got.foreach { r =>
      val e = exp(r.getString(0))
      val g = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
      assert(g == e, s"${r.getString(0)}: card $g != per-doc rollup $e")
    }
  }

  test("bigram-LM head form == exact form when the heads cover both vocabularies") {
    val exact = TextAnalysis.lmBigram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val head = TextAnalysis.lmBigramHead(spark, sf0001,
      headK2 = 1000000, headK1 = 1000000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(head == exact, "full-head serving form diverged from the exact model")
    // the gate-registered truncation genuinely exercises the tail: some
    // doc's mean must differ from the exact form (else the head sizes
    // cover the vocab and the truncated regime is untested)
    val trunc = TextAnalysis.lmBigramHead(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(trunc != exact, "gate head sizes cover the whole vocabulary — tail untested")
  }

  test("SQ8: sims exact on shared pairs, recall vs brute >= 0.8, levels in [0,255]") {
    val brute = Similarity.annBrute(spark, sf0001)
      .select("qid", "cid", "sim").collect()
    val bruteSims = brute.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sq8 = Similarity.annSq8(spark, sf0001).select("qid", "cid", "sim").collect()
    assert(sq8.nonEmpty)
    // the re-rank is exact cosine, so every shared pair's sim is bit-equal
    sq8.foreach { r =>
      bruteSims.get((r.getLong(0), r.getLong(1))).foreach { bSim =>
        assert(bSim == r.getDouble(2), s"sim mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
      }
    }
    // with Sq8Refine=40 candidates over this corpus the 8-bit pre-rank
    // should recover most of the true top-5 (bounded, not asserted exact:
    // quantized ordering may genuinely differ near ties)
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8Set = sq8.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (sq8Set & bruteSet).size.toDouble / bruteSet.size
    assert(recall >= 0.8, s"SQ8 recall $recall below 0.8")
    // trained bounds put every encoded level in [0, Sq8Levels]
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"),
        expr(s"transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * ${Similarity.PcaEScale}) AS BIGINT))").as("e"))
    val (mn, w) = Similarity.sq8Bounds(e, Similarity.PcaDim)
    assert(mn.length == Similarity.PcaDim && w.forall(_ >= 1L))
    val codeExpr = (1 to Similarity.PcaDim).map(j =>
      s"(element_at(e, $j) - ${mn(j - 1)}L) * ${Similarity.Sq8Levels} div ${w(j - 1)}L")
      .mkString("array(", ", ", ")")
    val bad = e.select(explode(expr(codeExpr)).as("lvl"))
      .filter(col("lvl") < 0 || col("lvl") > Similarity.Sq8Levels)
      .count()
    assert(bad == 0L, s"$bad encoded levels outside [0, ${Similarity.Sq8Levels}]")
  }

  test("IVF-SQ8: sims exact on shared pairs; == probe2 when refine covers the cells") {
    val brute = Similarity.annBrute(spark, sf0001)
      .select("qid", "cid", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val composed = Similarity.annIvfSq8(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(composed.nonEmpty)
    composed.foreach { case (q, c, _, sim) =>
      brute.get((q, c)).foreach { bSim =>
        assert(bSim == sim, s"sim mismatch for ($q, $c)")
      }
    }
    // at this corpus the two probed cells hold <= Sq8Refine candidates
    // per query (~50 vectors over 32 cells), so the exact re-rank sees
    // EVERY candidate and the composition must equal plain probe2
    // (same cells, exact ranking); a corpus where cells outgrow the
    // refine depth would fail here VISIBLY, which is the right signal
    // to re-derive the pin
    val probe2 = Similarity.annIvfProbe2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(composed.toSeq == probe2,
      "refine covers all cell candidates, yet IVF-SQ8 diverged from probe2")
  }

  test("bm25ScoreOf at 32 terms == the per-term-column formulation, single tf projection") {
    import graft.functions.Portable.tokens
    import graft.functions.TextAnalysis.{Bm25B, Bm25K1}
    // 24 corpus terms + 8 absent ones (df=0 exercises the +0.5 smoothing)
    val query = Seq(
      "scan", "column", "window", "order", "sort", "part", "agg", "value",
      "line", "key", "join", "merge", "spark", "table", "batch", "stream",
      "hash", "filter", "query", "row", "data", "vector", "customer", "small",
      "zz_absent_a", "zz_absent_b", "zz_absent_c", "zz_absent_d",
      "zz_absent_e", "zz_absent_f", "zz_absent_g", "zz_absent_h")
    val docs = graft.Tables.documents(spark, sf0001)
    // reference: the round-5 formulation — one filter() column per term
    val t = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("len", size(col("toks")).cast("long"))
    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
        sum(col("len")).cast("double").as("sum_len") +:
        query.zipWithIndex.map { case (term, i) =>
          sum(when(array_contains(col("toks"), term), 1L).otherwise(0L))
            .cast("double").as(s"df_$i")
        }
    val stats = t.agg(statAggs.head, statAggs.tail: _*)
    val withStats = query.zipWithIndex
      .foldLeft(t.crossJoin(broadcast(stats))) { case (df, (term, i)) =>
        df.withColumn(s"tf_$i",
          size(filter(col("toks"), x => x === term)).cast("double"))
      }
    val avgLen = col("sum_len") / col("n_docs")
    val refScore = query.indices.map { i =>
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      val tfN = col(s"tf_$i") * (lit(Bm25K1) + 1.0) /
        (col(s"tf_$i") +
          lit(Bm25K1) * (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("len") / avgLen))
      idf * tfN
    }.reduce(_ + _)
    val expected = withStats
      .select(col("doc_id"), round(refScore, 6).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = graft.functions.TextAnalysis.bm25ScoreOf(docs, query)
      .select("doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, s) =>
      assert(got(id) == s, s"score mismatch for doc $id: ${got(id)} vs $s")
    }
    assert(got.values.exists(_ > 0.0), "no document scored above zero")
    // plan width: the generalized row side projects ONE tf column
    val plan = graft.functions.TextAnalysis.bm25ScoreOf(docs, query)
      .queryExecution.analyzed.toString
    assert(!plan.contains("tf_1"), "generalized bm25 still projects per-term columns")
  }

  test("knnJoin ranks candidate pairs without a second exchange in the sort-merge regime") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val df = Similarity.knnJoin(spark, sf0001)
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString
      // every hash exchange is keyed on bucket — the window rank reuses
      // the join's hashpartitioning(bucket) instead of re-shuffling all
      // candidate pairs on vec_id (the final orderBy is a
      // rangepartitioning, not matched here)
      val hashKeys = "Exchange hashpartitioning\\(([^)]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(hashKeys.nonEmpty, s"no hash exchange found:\n$plan")
      hashKeys.foreach(k => assert(k.contains("bucket"),
        s"candidate pairs re-shuffled on '$k' instead of ranking in place:\n$plan"))
      // values unchanged vs the round-5 formulation (window on vec_id)
      val base = graft.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
      val dims = Similarity.signBucketDimsFor(base.count())
      val emb = base.select(col("vec_id"), col("embedding"),
        Similarity.signBucket(col("embedding"), dims).as("bucket"))
      val wRef = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("sim").desc, col("nbr_id").asc)
      val ref = emb.as("a")
        .join(emb.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .withColumn("sim",
          round(graft.functions.expressions.CosineSimilarity(
            col("a.embedding"), col("b.embedding")), 6))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"), col("sim"))
        .withColumn("rank", row_number().over(wRef).cast("long"))
        .filter(col("rank") <= Similarity.KnnK)
        .select("vec_id", "nbr_id", "rank", "sim")
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows(df) == rows(ref), "bucket-clustered ranking changed knnJoin values")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("trained PQ: recall gate >= 0.8 per query, codebook deterministic") {
    val gate = Similarity.annPqRecall(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gate.keySet == (0L until Similarity.NQueryVectors.toLong).toSet)
    gate.foreach { case (qid, ok) =>
      assert(ok == 1L, s"trained-PQ recall@5 < 0.8 for query $qid")
    }
    val emb = graft.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val (a, b) = (Similarity.pqCodebookTrained(emb), Similarity.pqCodebookTrained(emb))
    assert(a == b, "pqCodebookTrained is not deterministic")
    assert(a.size == math.min(Similarity.PqKTrained, 500))
  }

  test("trained IVF: k-means strictly lowers quantization distortion vs its hash-picked init") {
    val emb = graft.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    def cents(df: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
      df.orderBy("cent_id").collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    // cent_id is vec_id for the hash pick vs 0..k-1 for the trained one;
    // distortion is order-free so the orderBy only fixes collect() order
    val hash = cents(Similarity.ivfCodebook(emb))
    val trained = cents(Similarity.ivfCodebookTrained(spark, emb))
    val vecs = emb.collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def distortion(cs: Array[Array[Double]]): Double =
      vecs.map { v =>
        cs.map { c =>
          var d = 0.0; var j = 0
          while (j < v.length) { val x = v(j) - c(j); d += x * x; j += 1 }
          d
        }.min
      }.sum
    val dHash = distortion(hash)
    val dTrained = distortion(trained)
    // Lloyd inits from the same 32 hash-ordered vectors the hash-picked
    // codebook uses, and its objective is monotone non-increasing — so
    // trained distortion can never exceed the hash pick's
    assert(dTrained <= dHash,
      s"trained IVF distortion $dTrained > hash-picked $dHash")
    assert(dTrained < dHash * 0.95,
      s"training barely moved distortion ($dTrained vs $dHash)")
    // determinism of the trained codebook
    val again = cents(Similarity.ivfCodebookTrained(spark, emb))
    assert(trained.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sign-LSH width scales with the corpus: occupancy bounded, floored, minimal, monotone") {
    import Similarity._
    val ns = Seq(1L, 100L, 500L, 1024L, 4096L, 4097L, 100000L,
      123456789L, 1L << 30, (1L << 40) * BucketOccupancyTarget)
    ns.foreach { n =>
      val d = signBucketDimsFor(n)
      assert(d >= MinSignBucketDims, s"n=$n: d=$d below floor")
      assert((1L << d) * BucketOccupancyTarget >= n,
        s"n=$n d=$d: expected occupancy ${n.toDouble / (1L << d)} exceeds target")
      if (d > MinSignBucketDims)
        assert((1L << (d - 1)) * BucketOccupancyTarget < n, s"n=$n: d=$d not minimal")
    }
    // the concrete test-corpus widths: sf0.001/0.01 stay at the floor,
    // sf0.1 (2000 vectors) widens past it — adaptivity is exercised by
    // the sf0.1 cross-engine sweep, not just this unit check
    assert(signBucketDimsFor(500) == 8)
    assert(signBucketDimsFor(2000) == 9)
    val ds = Seq(1L, 10L, 100L, 1000L, 10000L, 1000000L).map(signBucketDimsFor)
    assert(ds == ds.sorted, s"dims not monotone in corpus size: $ds")
  }

  test("IVF codebook is fixed-k and deterministic regardless of corpus size") {
    val emb = graft.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val ids = Similarity.ivfCodebook(emb).select("cent_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size == Similarity.IvfCodebookK, s"codebook size ${ids.size}")
    assert(ids.distinct.size == ids.size)
    val again = Similarity.ivfCodebook(emb).select("cent_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == again, "codebook pick must be deterministic")
    // half the corpus yields the SAME codebook size (corpus-independent k)
    val half = Similarity.ivfCodebook(emb.filter(col("vec_id") % 2 === 0))
    assert(half.count() == Similarity.IvfCodebookK)
  }

  test("dedup drop list: drops are exactly the distinct higher-ids of verified pairs") {
    val pairs = Dedup.dedupMinhash(spark, sf0001)
      .select("doc_b").distinct().count()
    val drops = Dedup.dedupDropList(spark, sf0001)
      .filter(col("action") === "drop").count()
    assert(drops == pairs, s"$drops drops vs $pairs distinct doc_b")
  }

  test("hash sampling is reproducible and lands near the target rate") {
    val a = Dedup.sampleByHash(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val b = Dedup.sampleByHash(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash sampling must be run-to-run identical")
    val rate = a.size / 500.0
    assert(rate > 0.04 && rate < 0.2, s"sample rate $rate implausible for pct=10")
  }

  test("multimodal mapPartitions decode equals the expression-level metadata query") {
    val s = spark
    import s.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeFeatures(media)
      .select(col("doc_id"), col("format"), col("n_bytes"),
        col("width").cast("long"), col("height").cast("long"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    val meta = Multimodal.mediaMeta(spark, sf0001)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(decoded.length == meta.length)
    decoded.zip(meta).foreach { case (d, m) => assert(d == m, s"stub/expression drift: $d vs $m") }
  }

  test("multimodal real codec: javax.imageio PNG decodes through the same seam as the stub") {
    val s = spark
    import s.implicits._
    // deterministic REAL PNGs: dimensions derived from the doc id,
    // pixels a fixed function of (x, y, id) — then decoded back on
    // executors through decodeFeaturesWith, proving the codec seam
    // carries a genuine decoder (not just stub-shaped plumbing)
    def makePng(id: Long): Multimodal.MediaRow = {
      val w = (16 + id % 21).toInt
      val h = (12 + id % 13).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 7 + id).toInt & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      Multimodal.MediaRow(id, bytes, "img", bytes.length.toLong)
    }
    val rows = (0L until 64L).map(makePng)
    val ds = s.createDataset(rows).repartition(4)
    val decoded = Multimodal.decodeFeaturesWith(ds)(Multimodal.PngDecoder.decode).collect()
    assert(decoded.length == 64)
    decoded.foreach { f =>
      assert((f.width, f.height, f.n_frames) ==
        ((16 + f.doc_id % 21).toInt, (12 + f.doc_id % 13).toInt, 1),
        s"doc ${f.doc_id}: decoded ${f.width}x${f.height}")
    }
  }

  test("multimodal real resize: pixel-level PNG scale matches the metadata stub's prediction") {
    val s = spark
    import s.implicits._
    def makePng(id: Long): Multimodal.MediaRow = {
      val w = (6 + id % 21).toInt
      val h = (4 + id % 13).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 7 + id).toInt & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      Multimodal.MediaRow(id, bytes, "img", bytes.length.toLong)
    }
    val rows = (0L until 48L).map(makePng)
    val ds = s.createDataset(rows).repartition(4)
    val maxSide = 10
    // real path: pixel resize on executors, then real decode of the
    // RE-ENCODED payloads
    val resized = Multimodal.transformMediaWith(ds)(
      Multimodal.PngResizer.resize(maxSide))
    val realDims = Multimodal.decodeFeaturesWith(resized)(
      Multimodal.PngDecoder.decode)
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    // stub path: metadata-only arithmetic over the ORIGINAL dims must
    // predict exactly what the pixel path produced
    val origDims = Multimodal.decodeFeaturesWith(ds)(Multimodal.PngDecoder.decode)
    val predicted = Multimodal.resizeFeatures(origDims, maxSide)
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    assert(realDims == predicted,
      s"pixel/metadata drift: ${(realDims.toSet diff predicted.toSet).take(5)}")
    // already-small payloads pass through byte-identically
    val byId = rows.map(r => r.doc_id -> r).toMap
    resized.collect().foreach { r =>
      val o = byId(r.doc_id)
      val ow = (6 + r.doc_id % 21).toInt; val oh = (4 + r.doc_id % 13).toInt
      if (math.max(ow, oh) <= maxSide)
        assert(java.util.Arrays.equals(r.media, o.media),
          s"doc ${r.doc_id}: small image was re-encoded")
      else assert(!java.util.Arrays.equals(r.media, o.media))
    }
  }

  test("multimodal real codec: javax.imageio JPEG decodes and resizes through the same seam") {
    val s = spark
    import s.implicits._
    // same deterministic corpus shape as the PNG tests, encoded JPEG —
    // javax.imageio handles JPEG natively, so only video is genuinely
    // environment-bound (VERDICT r12 item 6)
    def makeJpeg(id: Long): Multimodal.MediaRow = {
      val w = (6 + id % 21).toInt
      val h = (4 + id % 13).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 7 + id).toInt & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val bytes = bos.toByteArray
      Multimodal.MediaRow(id, bytes, "img", bytes.length.toLong)
    }
    val rows = (0L until 48L).map(makeJpeg)
    val ds = s.createDataset(rows).repartition(4)
    // decode: JPEG dims through the SAME PngDecoder seam (ImageIO is
    // format-sniffing — the decoder is image-general despite the name)
    val decoded = Multimodal.decodeFeaturesWith(ds)(Multimodal.PngDecoder.decode)
    decoded.collect().foreach { f =>
      assert((f.width, f.height) ==
        (((6 + f.doc_id % 21).toInt, (4 + f.doc_id % 13).toInt)),
        s"doc ${f.doc_id}: decoded ${f.width}x${f.height}")
    }
    // resize with JPEG re-encode: real pixel path dims == the metadata
    // stub's prediction (JPEG is lossy in pixels, exact in dims)
    val maxSide = 10
    val resized = Multimodal.transformMediaWith(ds)(
      Multimodal.ImageResizer.resize(maxSide, "jpg"))
    val realDims = Multimodal.decodeFeaturesWith(resized)(
      Multimodal.PngDecoder.decode)
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    val predicted = Multimodal.resizeFeatures(decoded, maxSide)
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    assert(realDims == predicted,
      s"jpeg pixel/metadata drift: ${(realDims.toSet diff predicted.toSet).take(5)}")
    // resized payloads are still JPEG (SOI marker), not PNG
    resized.collect().foreach { r =>
      assert((r.media(0) & 0xff) == 0xff && (r.media(1) & 0xff) == 0xd8,
        s"doc ${r.doc_id}: re-encoded payload lost the JPEG SOI signature")
    }
  }

  test("multimodal tolerant codec: bad payloads pass through resizeOrPass, decodable quarantines them") {
    val s = spark
    import s.implicits._
    def makePng(id: Long): Multimodal.MediaRow = {
      val img = new java.awt.image.BufferedImage(
        20, 15, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      Multimodal.MediaRow(id, bytes, "img", bytes.length.toLong)
    }
    val garbage = Multimodal.MediaRow(99L, Array[Byte](1, 2, 3, 4, 5), "img", 5L)
    val rows = (0L until 4L).map(makePng) :+ garbage
    val ds = s.createDataset(rows).repartition(2)
    // strict form fails the task on the garbage row
    intercept[org.apache.spark.SparkException] {
      Multimodal.transformMediaWith(ds)(
        Multimodal.ImageResizer.resize(10, "png")).collect()
    }
    // tolerant form: good rows resized, the bad row passes UNCHANGED
    val tolerant = Multimodal.transformMediaWith(ds)(
      Multimodal.ImageResizer.resizeOrPass(10))
      .collect().map(r => r.doc_id -> r).toMap
    assert(java.util.Arrays.equals(tolerant(99L).media, garbage.media))
    assert(tolerant.size == 5 &&
      (0L until 4L).forall(id => !java.util.Arrays.equals(tolerant(id).media, rows(id.toInt).media)))
    // quarantine probe splits the corpus exactly
    val good = ds.filter(Multimodal.ImageResizer.decodable _).collect().map(_.doc_id).toSet
    assert(good == (0L until 4L).toSet)
  }

  test("multimodal near-dup loop: binary -> embed -> sign-LSH -> cosine finds planted copies") {
    val s = spark
    import s.implicits._
    import graft.functions.expressions.CosineSimilarity
    // byte-identical media copies of every 10th doc (ExactDupOffset ids)
    val media = Multimodal.mediaFrom(Dedup.corpusWithExactDupes(spark, sf0001))
      .as[Multimodal.MediaRow]
    val emb = Multimodal.embedMedia(media).toDF()
      .withColumn("bucket", Similarity.signBucket(col("embedding")))
    // sign-LSH candidates -> exact cosine verify: the full ANN near-dup
    // path over embeddings that came from BINARY payloads, not the
    // embeddings table
    val found = emb.as("x").join(emb.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .withColumn("cos",
        round(CosineSimilarity(col("x.embedding"), col("y.embedding")), 6))
      .filter(col("cos") === 1.0)
      .select(col("x.doc_id"), col("y.doc_id"))
      .as[(Long, Long)].collect().toSet
    val expected = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .as[Long].collect()
      .map(id => (id, id + Dedup.ExactDupOffset)).toSet
    // every planted byte-identical copy is recovered; equal-cosine
    // accidents would surface as extras and fail loudly
    assert(found == expected,
      s"missing: ${(expected -- found).take(3)}, extra: ${(found -- expected).take(3)}")
  }

  test("dedup_embedding finds the planted perturbed copies and nothing else") {
    val pairs = Similarity.dedupEmbedding(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      // only planted (base, base+3M) pairs can clear 0.99 on random vectors
      assert(r.getLong(1) == r.getLong(0) + 3000000000000000L,
        s"unexpected non-planted pair ${r.getLong(0)} ${r.getLong(1)}")
      assert(r.getDouble(2) >= Similarity.EmbDupThreshold)
    }
    // most planted copies survive (a copy is lost only when dim 0's sign
    // flips out of the query's LSH bucket)
    val planted = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 9 === 0).count()
    assert(pairs.length >= planted / 2, s"${pairs.length} of $planted found")
  }

  test("ann_recall_at_k equals the brute∩lsh overlap per query") {
    val recall = Similarity.annRecallAtK(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val brute = Similarity.annBrute(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall.keySet == brute.map(_._1))
    recall.foreach { case (qid, (n, rec)) =>
      val expected = brute.filter(_._1 == qid).count(lsh.contains)
      assert(n == expected, s"qid $qid: n_found $n != $expected")
      assert(rec == expected / 5.0 && rec >= 0.0 && rec <= 1.0)
    }
  }

  test("ann_ivf_recall emits one row per planted query with dup_found=1 on sf0.001") {
    val rows = Similarity.annIvfRecall(spark, sf0001).collect()
    assert(rows.length == Similarity.NQueryVectors,
      s"${rows.length} rows for ${Similarity.NQueryVectors} planted queries")
    rows.foreach(r => assert(r.getLong(1) == 1L,
      s"planted query src_id=${r.getLong(0)} did not find its source"))
  }

  test("freqClassQualityHead with headK >= vocab agrees exactly with freqClassQuality") {
    val full = functions.TextAnalysis.freqClassQuality(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // headK far above the corpus vocabulary: every token is in the head,
    // so the broadcast-head scoring must reproduce the join-based scores
    // bit-for-bit (same count, same fc sum, same rounded mean)
    val head = functions.TextAnalysis.freqClassQualityHead(spark, sf0001, headK = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(head.sameElements(full))
  }

  test("PQ: codes bounded, centroids self-encode, ADC refine recovers brute top-5") {
    import graft.functions.expressions.PqCodes
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding"))
    val cents = Similarity.pqCodebook(emb)
    assert(cents.size == Similarity.PqK)
    val centLit = typedLit(cents)
    val coded = emb.select(col("vec_id"),
      PqCodes(col("embedding"), centLit, Similarity.PqM).as("codes"))

    // every code in [0, K), every vector gets exactly M codes
    val bounds = coded.select(
      min(array_min(col("codes"))), max(array_max(col("codes"))),
      min(size(col("codes"))), max(size(col("codes")))).head
    assert(bounds.getInt(0) >= 0 && bounds.getInt(1) < Similarity.PqK)
    assert(bounds.getInt(2) == Similarity.PqM && bounds.getInt(3) == Similarity.PqM)

    // a centroid's own vector is L2-distance 0 from itself in every
    // sub-space, so it must encode to its own index across all M slices
    val centIds = emb
      .select(col("vec_id"), Portable.h32(col("vec_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("vec_id")).limit(Similarity.PqK)
      .select("vec_id").collect().map(_.getLong(0))
    val codeById = coded.filter(col("vec_id").isin(centIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    centIds.zipWithIndex.foreach { case (id, idx) =>
      assert(codeById(id).forall(_ == idx),
        s"centroid $id (idx $idx) encoded as ${codeById(id)}")
    }

    // ADC + exact refine must recover a solid share of the true top-5
    val brute = Similarity.annBrute(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.annPq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(pq.contains).toDouble / brute.size
    assert(recall >= 0.4, s"PQ recall@5 collapsed to $recall")
  }

  test("BPE pretokenizer splits contractions/digits/punctuation that whitespace hides") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "don't stop, it's 2024 already!!",
      "hello world",
      "a1b2c3", // letter/digit runs alternate: 6 pretokens, 1 ws token
      "  leading and trailing  ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"),
          lit(TextAnalysis.BpePretokenPattern), lit(0))).cast("long").as("n_bpe"))
    val got = df.as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // driver-side Java mirror of the same pattern
    val p = TextAnalysis.BpePretokenPattern.r
    val expected = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> ((t.toLowerCase.split("\\s+", -1).length.toLong,
        p.findAllIn(t).length.toLong))
    }.toMap
    assert(got == expected, s"got $got vs $expected")
    // and the BPE count genuinely differs where structure exists
    assert(got(0L)._2 > got(0L)._1, s"contraction/punct text not split: ${got(0L)}")
    assert(got(2L)._2 > got(2L)._1, s"letter/digit runs not split: ${got(2L)}")
  }

  test("text_rare_term picks each document's minimum-df token with (df, token) tiebreak") {
    import graft.functions.TextAnalysis
    val rare = TextAnalysis.rareTerm(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // recompute df independently and spot-check 20 documents
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), explode(array_distinct(Portable.tokens(col("text")))).as("tok"))
    val df = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docToks = toks.filter(col("doc_id") < 20).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSeq)
    docToks.foreach { case (docId, ts) =>
      val best = ts.map(t => (df(t), t)).min
      assert(rare(docId) == (best._2, best._1), s"doc $docId: ${rare(docId)} != $best")
    }
  }

  test("bm25_score == driver-side fixed-order arithmetic; zero iff no term present") {
    import graft.functions.TextAnalysis.{Bm25B, Bm25K1, Bm25Query}
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), Portable.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector)
    val nDocs = docs.length.toDouble
    val sumLen = docs.map(_._2.length.toLong).sum.toDouble
    val dfs = Bm25Query.map(t => docs.count(_._2.contains(t)).toDouble)
    val expected = docs.map { case (id, toks) =>
      val len = toks.length.toLong
      val score = Bm25Query.zip(dfs).map { case (term, df) =>
        val tf = toks.count(_ == term).toDouble
        val idf = (nDocs - df + 0.5) / (df + 0.5)
        idf * ((tf * (Bm25K1 + 1.0)) /
          (tf + Bm25K1 * (1.0 - Bm25B + Bm25B * len / (sumLen / nDocs))))
      }.reduce(_ + _)
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = TextAnalysis.bm25Score(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expected,
      s"diff: ${got.toSeq.sortBy(_._1).zip(expected.toSeq.sortBy(_._1)).find(p => p._1 != p._2)}")
    // score is zero exactly when no query term occurs
    docs.foreach { case (id, toks) =>
      val hasTerm = Bm25Query.exists(toks.contains)
      assert((got(id) != 0.0) == hasTerm, s"doc $id zero-score contract")
    }
  }

  test("retrieval_qlm == driver-side integer Dirichlet replay; smoothing floor exact") {
    import graft.functions.TextAnalysis.{Bm25Query, QlmMu}
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), Portable.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector)
    val cTotal = docs.map(_._2.length.toLong).sum
    val cfPpm = Bm25Query
      .map(t => docs.map(_._2.count(_ == t).toLong).sum * 1000000L / cTotal)
    val expected = docs.map { case (id, toks) =>
      val len = toks.length.toLong
      val score = Bm25Query.zip(cfPpm).map { case (term, cf) =>
        val tf = toks.count(_ == term).toLong
        tf * 1000000000L / (len + QlmMu) + QlmMu * cf * 1000L / (len + QlmMu)
      }.sum
      id -> score
    }.toMap
    val got = TextAnalysis.qlmScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected,
      s"first diff: ${got.toSeq.sortBy(_._1).zip(expected.toSeq.sortBy(_._1)).find(p => p._1 != p._2)}")
    // a doc with NO query term scores exactly the per-term smoothing
    // floor Σ μ·cf_ppm·1000 div (len+μ) — the LM-retrieval property
    // that separates it from bm25's hard zero
    docs.foreach { case (id, toks) =>
      if (!Bm25Query.exists(toks.contains)) {
        val len = toks.length.toLong
        val floor = cfPpm.map(cf => QlmMu * cf * 1000L / (len + QlmMu)).sum
        assert(got(id) == floor, s"doc $id smoothing floor")
      }
    }
    // and term presence strictly beats the floor (rarer ⇒ bigger lift)
    assert(docs.exists { case (id, toks) =>
      Bm25Query.exists(toks.contains) && {
        val len = toks.length.toLong
        got(id) > cfPpm.map(cf => QlmMu * cf * 1000L / (len + QlmMu)).sum
      }
    }, "no doc scored above its smoothing floor")
  }

  test("embed_centroids matches driver-side means within fixed-point tolerance") {
    val rows = Tables.embeddings(spark, sf0001)
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
    val byLabel = rows.groupBy(_._1)
    val got = Similarity.embedCentroids(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    byLabel.foreach { case (label, vs) =>
      val n = vs.length
      (0 until vs.head._2.length).foreach { d =>
        val mean = vs.map(_._2(d).toDouble).sum / n
        val (gn, gc) = got((label, d.toLong))
        assert(gn == n.toLong)
        // fixed-point path: off by at most half an ulp of the 1e-6 scale
        // per summed row, so within 1e-6 + n*5e-7/n of the true mean
        assert(math.abs(gc - mean) < 1e-5, s"label $label dim $d: $gc vs $mean")
      }
    }
  }

  test("knn_join == driver-side bucket-bounded top-k over collected vectors") {
    val rows = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dims = Similarity.signBucketDimsFor(rows.length.toLong)
    def bucket(v: Array[Float]): Long =
      (0 until dims).map(i => if (v(i) > 0f) 1L << i else 0L).sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byBucket = rows.groupBy { case (_, v) => bucket(v) }
    val expected = rows.flatMap { case (id, v) =>
      byBucket(bucket(v)).filter(_._1 != id)
        .map { case (nid, nv) => (id, nid, cos(v, nv)) }
        .sortBy { case (_, nid, s) => (-s, nid) }
        .take(Similarity.KnnK)
        .zipWithIndex
        .map { case ((_, nid, s), i) => (id, nid, (i + 1).toLong, s) }
    }.sortBy(t => (t._1, t._3)).toSeq
    val got = Similarity.knnJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}; sizes ${got.size}/${expected.size}")
  }

  test("dedup_lines == driver-side first-occurrence line dedup") {
    // Independent reimplementation with plain Scala collections: chunk
    // every doc (boilerplate header + exact copies of every 10th) into
    // 8-token lines, keep each line only at its corpus-wide smallest
    // (doc_id, pos), reassemble in order.
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val corpus = (docs ++ docs.filter(_._1 % 10 == 0)
        .map { case (id, t) => (id + Dedup.LineDupOffset) -> t })
      .map { case (id, t) => id -> (Dedup.BoilerplateLine + " " + t) }
    val lines = corpus.flatMap { case (id, t) =>
      t.split("\\s+").grouped(Dedup.LineChunk).zipWithIndex
        .map { case (chunk, pos) => (id, pos.toLong, chunk.mkString(" ")) }
    }
    val winner = lines.groupBy(_._3).map { case (line, occ) =>
      line -> occ.map(o => (o._1, o._2)).min
    }
    val expected = lines
      .filter { case (id, pos, line) => winner(line) == (id, pos) }
      .groupBy(_._1)
      .map { case (id, kept) =>
        val sorted = kept.sortBy(_._2)
        (id, sorted.length.toLong, sorted.map(_._3).mkString(" "))
      }.toSeq.sortBy(_._1)
    val got = Dedup.dedupLines(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // boilerplate survives exactly once, in the lowest-id document
    val withBoiler = got.filter(_._3.contains(Dedup.BoilerplateLine))
    assert(withBoiler.map(_._1) == Seq(got.map(_._1).min))
    // full copies lose every line and drop out entirely
    assert(got.forall(_._1 < Dedup.LineDupOffset))
  }

  test("dedup_spans == driver-side first-occurrence span model; planted copies score high") {
    // independent model: 8-token spans (single whole-text span under 8),
    // canonical occurrence = corpus-wide min (doc_id, pos), per-doc
    // duplicated fraction
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val corpus = docs ++ docs.filter(_._1 % 7 == 0)
      .map { case (id, t) => (id + Dedup.NearDupOffset) -> (t + " graft near dup tail marker") }
    val occ = corpus.flatMap { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+")
      val spans =
        if (toks.length >= 8) toks.sliding(8).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      spans.zipWithIndex.map { case (sp, pos) => (id, pos.toLong, sp) }
    }
    val winner = occ.groupBy(_._3).map { case (sp, os) =>
      sp -> os.map(o => (o._1, o._2)).min }
    val expected = occ.groupBy(_._1).map { case (id, os) =>
      val nDup = os.count { case (i, p, sp) => winner(sp) != ((i, p)) }
      (id, os.size.toLong, nDup.toLong,
        BigDecimal(nDup.toDouble / os.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    // gate bit split: the planted ids exceed the production default's
    // 2^40 doc-id budget (and the guard below proves that raises loudly)
    val got = Dedup.dedupSpans(spark, sf0001, posBits = Dedup.SpanGatePosBits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}; sizes ${got.size}/${expected.size}")
    // every planted copy repeats its source's spans: all but the tail-crossing
    // spans are duplicates, so the fraction is substantial for every copy
    val copies = got.filter(_._1 >= Dedup.NearDupOffset)
    assert(copies.nonEmpty && copies.forall(_._4 > 0.3),
      s"copies scored low: ${copies.filter(_._4 <= 0.3).take(3)}")
    // originals win their own spans: a source doc's spans are canonical
    // (its copy has the larger id), so sources only show ORGANIC repeats
    val sources = got.filter(t => t._1 < Dedup.NearDupOffset).map(_._4)
    assert(sources.count(_ == 0.0) > sources.length / 2)
    // the packed-slot guard is LOUD, not silent: under the production
    // bit split the planted +2e15 ids exceed the 2^40 doc-id budget
    val e = intercept[Exception] {
      Dedup.dedupSpans(spark, sf0001).collect()
    }
    assert(e.getMessage.contains("dedup_spans slot overflow"), e.getMessage)
  }

  test("dedup_spans posBits=23 packs multi-thousand-token documents correctly") {
    val s = spark
    import s.implicits._
    // doc 1: 6000 tokens with period-1500 vocabulary — every span from
    // pos 1500 on repeats a span from the first period. Span positions
    // reach 5992 > 2^12, so the GATE bit split cannot pack this corpus
    // and only the production posBits=23 path can produce these numbers.
    // doc 2: copies doc 1's first 100 tokens (loses the span race on
    // every span); doc 3: disjoint vocabulary (all spans canonical).
    val corpus = Seq(
      1L -> (0 until 6000).map(i => "w" + (i % 1500)).mkString(" "),
      2L -> (0 until 100).map(i => "w" + i).mkString(" "),
      3L -> (0 until 50).map(i => "z" + i).mkString(" ")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSpansOf(corpus, posBits = 23).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // driver-side first-occurrence model, identical to the gate spec's
    val occ = Seq(
      1L -> (0 until 6000).map(i => "w" + (i % 1500)),
      2L -> (0 until 100).map(i => "w" + i),
      3L -> (0 until 50).map(i => "z" + i)
    ).flatMap { case (id, toks) =>
      toks.sliding(8).zipWithIndex.map { case (sp, pos) =>
        (id, pos.toLong, sp.mkString(" ")) }
    }
    val winner = occ.groupBy(_._3).map { case (sp, os) =>
      sp -> os.map(o => (o._1, o._2)).min }
    val expected = occ.groupBy(_._1).map { case (id, os) =>
      val nDup = os.count { case (i, p, sp) => winner(sp) != ((i, p)) }
      (id, os.size.toLong, nDup.toLong,
        BigDecimal(nDup.toDouble / os.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // structure: the long doc's tail is pure repetition, doc 2 is a full
    // copy, doc 3 is untouched
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 5993 && byId(1L)._3 == 4493)
    assert(byId(2L)._4 == 1.0)
    assert(byId(3L)._4 == 0.0)
    // and the same corpus under the gate split overflows LOUDLY
    val e = intercept[Exception] {
      Dedup.dedupSpansOf(corpus, posBits = Dedup.SpanGatePosBits).collect()
    }
    assert(e.getMessage.contains("dedup_spans slot overflow"), e.getMessage)
  }

  test("chunk_overlap: stride geometry covers every token exactly, last chunk partial") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(Portable.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextAnalysis.chunkOverlap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val len = TextAnalysis.ChunkLen; val stride = TextAnalysis.ChunkStride
    toks.foreach { case (doc, n) =>
      val cs = chunks(doc).sortBy(_._2)
      val expected = math.ceil(math.max(n - (len - stride), 1) / stride.toDouble).toInt
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks for $n tokens")
      cs.dropRight(1).foreach { case (_, _, nt) => assert(nt == len) }
      // last chunk reaches exactly the end of the token array
      val (_, lastId, lastN) = cs.last
      assert(lastId * stride + lastN == n, s"doc $doc tail mismatch")
    }
  }

  test("pack_sequences: per-source token stream slices losslessly into sequences") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), size(Portable.tokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
    val got = TextAnalysis.packSequences(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // token totals per source are preserved (no doc dropped or doubled)
    val totGot = got.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val totExp = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(totGot == totExp)
    // seq ids are the start-offset slices: recompute driver-side
    docs.groupBy(_._2).foreach { case (src, ds) =>
      var off = 0L
      val expected = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      ds.sortBy(_._1).foreach { case (id, _, n) =>
        val seq = off / TextAnalysis.PackSeqLen
        val (c, first, t) = expected.getOrElse(seq, (0L, Long.MaxValue, 0L))
        expected(seq) = (c + 1, math.min(first, id), t + n)
        off += n
      }
      val gotSrc = got.filter(_._1 == src)
        .map(t => t._2 -> (t._3, t._4, t._5)).toMap
      assert(gotSrc == expected.toMap, s"source $src packing diverges")
    }
  }

  test("dedup_lines fuzz: random small-vocab corpora == driver-side model") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 5) {
      // small vocab + short docs force heavy cross-document line
      // collisions; doc count and lengths vary per trial
      val vocab = Vector.tabulate(4 + rnd.nextInt(5))(i => s"w$i")
      val docs = Seq.tabulate(10 + rnd.nextInt(30)) { id =>
        val n = 1 + rnd.nextInt(40)
        val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        // whitespace edges: leading/trailing blanks INCLUDING tabs and
        // newlines (SQL trim strips spaces only — the operator must not
        // depend on it), and an occasional all-whitespace doc
        val deco = rnd.nextInt(6) match {
          case 0 => s" \t$body"
          case 1 => s"$body\n "
          case 2 => s"\n$body\t"
          case 3 if id % 7 == 3 => " \t\n "
          case _ => body
        }
        (id.toLong, deco)
      }
      val expected = {
        val lines = docs.flatMap { case (id, t) =>
          t.trim.split("\\s+").filter(_.nonEmpty)
            .grouped(Dedup.LineChunk).zipWithIndex
            .map { case (chunk, pos) => (id, pos.toLong, chunk.mkString(" ")) }
            .filter(_._3.nonEmpty)
        }
        val winner = lines.groupBy(_._3)
          .map { case (l, occ) => l -> occ.map(o => (o._1, o._2)).min }
        lines.filter { case (id, pos, l) => winner(l) == (id, pos) }
          .groupBy(_._1)
          .map { case (id, kept) =>
            val sorted = kept.sortBy(_._2)
            (id, sorted.length.toLong, sorted.map(_._3).mkString(" "))
          }.toSeq.sortBy(_._1)
      }
      val got = Dedup.dedupLinesOf(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == expected, s"trial $trial diverged (vocab ${vocab.size})")
    }
  }

  test("systematic PPS: per-source counts bounded by target, giant docs selected with certainty") {
    val target = 60L
    val rows = Dedup.samplePps(spark, sf0001).collect()
    val perSource = rows.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    assert(perSource.nonEmpty)
    perSource.foreach { case (src, n) =>
      assert(n >= 1L && n <= target, s"$src selected $n of target $target")
    }
    // any doc holding ≥ T/target tokens must be selected (PPS certainty)
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        size(graft.functions.Portable.tokens(col("text"))).cast("long").as("n"))
    val totals = d.groupBy("source").agg(sum(col("n")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val selected = rows.map(_.getLong(1)).toSet
    val certain = d.collect().filter(r =>
      r.getLong(2) * target >= totals(r.getString(1)))
    certain.foreach(r =>
      assert(selected.contains(r.getLong(0)),
        s"doc ${r.getLong(0)} holds a full selection interval but was not drawn"))
  }

  test("mix_epochs: repeated token mass covers each source's budget within one boundary doc") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.mixEpochs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // reconstruct each source's integer budget exactly as the operator:
    // B_s = w·2·grand div Σw
    val bySource = rows.groupBy(_._2)
    val tTokens = bySource.view.mapValues(_.map(_._3).sum).toMap
    val grand = tTokens.values.sum
    def w(src: String) = src.drop(3).toLong % 5 + 1
    // toSeq first: mapping a key SET through w would dedup equal weights
    val tw = tTokens.keys.toSeq.map(w).sum
    bySource.foreach { case (src, docs) =>
      val b = w(src) * 2 * grand / tw
      val delivered = docs.map(d => d._3 * d._4).sum
      val maxDoc = docs.map(_._3).max
      // greedy fractional prefix: delivered ∈ [B, B + largest doc)
      assert(delivered >= b && delivered < b + maxDoc,
        s"$src delivered $delivered for budget $b (max doc $maxDoc)")
      // every doc repeats at least the full-epoch count, spread ≤ 1
      val reps = docs.map(_._4)
      assert(reps.max - reps.min <= 1, s"$src repeats spread ${reps.toSet}")
    }
    // the weight rule must populate BOTH regimes on this corpus:
    // fraction-only sources (some docs at 0 repeats) and multi-epoch ones
    val allReps = rows.map(_._4)
    assert(allReps.contains(0L), "no fraction-only source — weight rule degenerate")
    assert(allReps.max >= 2L, "no multi-epoch source — upsampling untested")
  }

  test("k-center: greedy invariants hold against driver-side recomputation") {
    val sel = Similarity.sampleKcenter(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(sel.map(_._1).toSeq == (1L to 8L))
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      1.0 - BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // each pick's recorded distance == its true min distance to the
    // earlier picks, and the greedy sequence is non-increasing
    (1 until sel.length).foreach { i =>
      val d = sel.take(i).map(p => dist(vecs(sel(i)._2), vecs(p._2))).min
      assert(math.abs(d - sel(i)._3) < 1e-9, s"rank ${i + 1} distance")
      if (i >= 2) assert(sel(i)._3 <= sel(i - 1)._3 + 1e-9,
        s"greedy sequence increased at rank ${i + 1}")
    }
    // farthest-point property: no unselected vector is farther from the
    // selected set than the last pick was at its selection
    val picked = sel.map(_._2).toSet
    val maxRemaining = vecs.keys.filterNot(picked).map(v =>
      sel.map(p => dist(vecs(v), vecs(p._2))).min).max
    assert(maxRemaining <= sel.last._3 + 1e-9,
      s"remaining $maxRemaining vs last pick ${sel.last._3}")
  }

  test("normalized exact dedup catches the case/whitespace variants byte dedup misses") {
    val s = spark
    import s.implicits._
    // every planted noisy copy (id ≥ NoisyDupOffset) must fold into its
    // original under the normalized digest...
    val norm = Dedup.dedupExactNormalized(spark, sf0001).collect()
    assert(!norm.exists(_.getAs[Long]("doc_id") >= Dedup.NoisyDupOffset),
      "a noisy copy survived as its own group — normalization failed to fold it")
    assert(norm.exists(_.getAs[Long]("n_copies") > 1))
    // ...while the BYTE digest keeps every noisy copy separate
    val byteGroups = Dedup.corpusWithNoisyDupes(spark, sf0001)
      .groupBy(org.apache.spark.sql.functions.md5($"text"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      .collect()
    assert(byteGroups.count(_.getAs[Long]("doc_id") >= Dedup.NoisyDupOffset) > 0,
      "perturbed copies should NOT be byte-identical to their originals")
  }

  test("rolling fingerprint is order-sensitive and content-deterministic") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "spark scan merge join"),
      (2L, "spark scan merge join"),   // identical content
      (3L, "join merge scan spark"))   // same tokens, different order
      .toDF("id", "text")
      .select(col("id"), Portable.rollingFingerprint(Portable.tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df(1L) == df(2L), "identical token streams must collide")
    assert(df(1L) != df(3L), "reordered tokens must not collide")
  }
}
